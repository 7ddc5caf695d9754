"""Scan-free (closed-form Su + Woodbury) batch-solver path vs the
reference-shaped scan path: identical iterates on every supported kind.

The fast path (batch._solve_body_fast) replaces the O(H) rollout/transfer
scans with closed-form integrator solutions and the [(H-1)nu]^2 dense solve
with an m x m Woodbury solve (m = n_kp * nx); these tests pin that the
restructuring is numerically invisible (f64, atol ~1e-9)."""

import numpy as np
import pytest

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.ops import primitives, so3
from ilqr_planner_tpu.solvers import batch
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint, SpacetimeKeypoint
from ilqr_planner_tpu.systems.spec import make_spec, sequential_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
Q0 = [0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
      1.50592777, 0.71771416]
T1_POS = [0.554121212377707, -0.01575049935289518, 0.38295604872511507]
T1_ORN = [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
          0.022333898196169735]
T2_POS = [0.254121212377707, -0.07575049935289518, 0.13170744424127526]
T2_ORN = [0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
          0.00011933313484481926]
QD6 = [1, 1, 1, 0.1, 0.1, 0.1]


@pytest.fixture(scope="module")
def panda_robot():
    return Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip"))


def _compare(spec, Q, psi, u0, kp_idx, nb_iter, use_psi, atol=1e-9,
             early_stop=True):
    dummy = np.zeros((u0.shape[0], 1)) if psi is None else psi
    slow = batch._solve_impl(spec, Q, dummy, u0, kp_idx, nb_iter, early_stop,
                             False, use_psi, False)
    fast = batch._solve_impl(spec, Q, dummy, u0, kp_idx, nb_iter, early_stop,
                             False, use_psi, True)
    np.testing.assert_allclose(np.asarray(fast.u), np.asarray(slow.u),
                               atol=atol)
    np.testing.assert_allclose(float(fast.cost), float(slow.cost),
                               rtol=1e-6, atol=1e-12)
    assert int(fast.iterations) == int(slow.iterations)


def test_fast_plain_first_order(panda_robot):
    kps = [PosOrnKeypoint(T1_POS, T1_ORN, np.diag(QD6), 49),
           PosOrnKeypoint(T2_POS, T2_ORN, np.diag(QD6), 99)]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn", panda_robot, kps, np.ones(7) * 1e-5, 100, 1,
                     dt=0.1, q0=Q0, q_max=qmax, q_min=-qmax)
    assert batch.fast_supported(spec)
    kp_idx = (49, 99)
    Q = np.asarray(batch.sparse_Q(spec, kp_idx))
    _compare(spec, Q, None, np.zeros(99 * 7), kp_idx, 10, False)


def test_fast_cp_second_order_with_limits(panda_robot):
    H = 400
    qd_a = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, 0, 0, 0])
    qd_b = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, .1, .1, .1])
    kps = [PosOrnKeypoint(T1_POS, T1_ORN, qd_a, H // 2 - 1,
                          dposition=[0, 0, 0], dorientation=[0, 0, 0, 0]),
           PosOrnKeypoint(T2_POS, T2_ORN, qd_b, H - 1,
                          dposition=[0, 0, 0], dorientation=[0, 0, 0, 0])]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn", panda_robot, kps, np.ones(7) * 1e-5, H, 2,
                     dt=0.01, q0=Q0, q_max=qmax, q_min=-qmax,
                     dq_max=np.ones(7) * 10, dq_min=-np.ones(7) * 10)
    assert batch.fast_supported(spec)
    kp_idx = (H // 2 - 1, H - 1)
    Q = np.asarray(batch.sparse_Q(spec, kp_idx))
    psi = np.kron(primitives.build_psi_sawtooth(H - 1, 2), np.eye(7))
    _compare(spec, Q, psi, np.zeros((H - 1) * 7), kp_idx, 6, True)


def test_fast_sequential_object_frames(panda_robot):
    H, dt = 600, 0.01
    obj1 = np.eye(4)
    obj1[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [0.63758403393523, 0.2994657314658187, 0.6042309402208079,
         -0.37244039285286973])))
    obj1[:3, 3] = [0.62, 0.05, 0.34]
    obj2 = np.eye(4)
    obj2[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [-0.03647984, 0.94060485, 0.33742794, 0.00860923])))
    obj2[:3, 3] = [0.32, 0.05, 0.54]
    qmax = np.ones(7) * np.pi * 10
    qd = np.diag([1, 1, 1, 0, 0, 0])
    cmd = np.ones(7) * 1e-5
    sub1 = make_spec("posorn", panda_robot.with_frame(obj1),
                     [PosOrnKeypoint([0, 0, -0.15], [1, 0, 0, 0], qd, H // 2)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax)
    sub2 = make_spec("posorn", panda_robot.with_frame(obj2),
                     [PosOrnKeypoint([0.1, 0.1, -0.1], [1, 0, 0, 0], qd, H - 1)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax)
    spec = sequential_spec((sub1, sub2), cmd)
    assert batch.fast_supported(spec)
    kp_idx = (H // 2, H - 1)
    Q = np.asarray(batch.sparse_Q(spec, kp_idx))
    _compare(spec, Q, None, np.zeros((H - 1) * 7), kp_idx, 8, False)


def test_fast_time_optimal_first_order(panda_robot):
    H = 100
    kps = [SpacetimeKeypoint(T1_POS, T1_ORN, np.diag(QD6 + [0]), 49, 2.0),
           SpacetimeKeypoint(T2_POS, T2_ORN, np.diag(QD6 + [0.1]), 99, 5.0)]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn_time", panda_robot, kps, np.ones(8) * 1e-5, H, 1,
                     q0=np.zeros(7), q_max=qmax, q_min=-qmax)
    assert batch.fast_supported(spec)
    kp_idx = (49, 99)
    Q = np.asarray(batch.sparse_Q(spec, kp_idx))
    u0 = np.tile([0.0] * 7 + [0.01], H - 1)
    # The time-optimal GN is ill-conditioned enough that the (algebraically
    # identical) Woodbury step drifts to ~1e-7 over 8 iterations; compare
    # with early stop off so a near-threshold ||du|| can't fork the paths.
    _compare(spec, Q, None, u0, kp_idx, 8, False, atol=1e-6,
             early_stop=False)
    psi = np.kron(primitives.build_psi_unitstep(H - 1, 2), np.eye(8))
    _compare(spec, Q, psi, u0, kp_idx, 10, True, atol=1e-6,
             early_stop=False)


def test_fast_time_optimal_second_order(panda_robot):
    H = 60
    qd = np.diag(QD6 + [1, 1, 1, 0, 0, 0] + [0.1])
    kps = [SpacetimeKeypoint(T1_POS, T1_ORN, qd, H - 1, 3.0,
                             dposition=[0, 0, 0], dorientation=[0, 0, 0, 0])]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn_time", panda_robot, kps, np.ones(8) * 1e-5, H, 2,
                     q0=np.zeros(7), q_max=qmax, q_min=-qmax,
                     dq_max=np.ones(7) * 10, dq_min=-np.ones(7) * 10)
    assert batch.fast_supported(spec)
    kp_idx = (H - 1,)
    Q = np.asarray(batch.sparse_Q(spec, kp_idx))
    u0 = np.tile([0.0] * 7 + [0.01], H - 1)
    _compare(spec, Q, None, u0, kp_idx, 5, False, atol=1e-6,
             early_stop=False)
