"""Batch-solver parity on the harder system kinds, vs stored notebook
outputs: time-optimal (time-varying B in the transfer recursion), 2nd-order
acceleration control, and the sequential two-object-frame composition."""

import numpy as np
import pytest

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.ops import primitives, so3
from ilqr_planner_tpu.solvers import batch
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint, SpacetimeKeypoint
from ilqr_planner_tpu.systems.spec import make_spec, sequential_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
Q0 = [0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303, 1.50592777, 0.71771416]
T1_POS = [0.554121212377707, -0.01575049935289518, 0.38295604872511507]
T1_ORN = [0.014042440828406944, 0.915047647731553, 0.4024820607528928, 0.022333898196169735]
T2_POS = [0.254121212377707, -0.07575049935289518, 0.13170744424127526]
T2_ORN = [0.029927010072216945, 0.9121514607332729, 0.4087591864532181, 0.00011933313484481926]
QD6 = [1, 1, 1, 0.1, 0.1, 0.1]


class Recorder:
    def __init__(self):
        self.messages = []

    def notify(self, msg):
        self.messages.append(msg)

    @property
    def costs(self):
        return [float(m.split("Cost: ")[1].split(",")[0]) for m in self.messages]

    @property
    def alphas(self):
        return [float(m.split("alpha= ")[1].split(",")[0]) for m in self.messages]


@pytest.fixture(scope="module")
def panda_robot():
    return Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip"))


def test_batch_cp_time_optimal(panda_robot):
    """POS_ORN_TIME_SYS.ipynb cell 10: BatchILQRCP, 20 iterations."""
    H = 100
    kps = [SpacetimeKeypoint(T1_POS, T1_ORN, np.diag(QD6 + [0]), H // 2 - 1, 2.0),
           SpacetimeKeypoint(T2_POS, T2_ORN, np.diag(QD6 + [0.1]), H - 1, 5.0)]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn_time", panda_robot, kps, np.ones(8) * 1e-5, H, 1,
                     q0=np.zeros(7), q_max=qmax, q_min=-qmax)
    psi = np.kron(primitives.build_psi_unitstep(H - 1, 2), np.eye(8))
    u0 = np.tile([0.0] * 7 + [0.01], H - 1)
    cb = Recorder()
    batch.solve_cp(spec, psi, (49, 99), 20, u0, callback=cb)
    golden = [3.41273, 1.12468, 0.438064, 0.180731, 0.165212, 0.0525568,
              0.0113259, 0.00595602, 0.000825001, 0.000710878]
    golden_alpha = [0.0625, 0.25, 0.5, 1, 0.5, 0.5, 0.5, 1, 0.5, 1]
    np.testing.assert_allclose(cb.costs[:10], golden, rtol=2e-3)
    np.testing.assert_allclose(cb.alphas[:10], golden_alpha, rtol=1e-6)


def test_batch_plain_time_optimal(panda_robot):
    """POS_ORN_TIME_SYS.ipynb cell 12: BatchILQR head (incl. its early
    floor-out behavior under the approximate shifted Su)."""
    H = 100
    kps = [SpacetimeKeypoint(T1_POS, T1_ORN, np.diag(QD6 + [0]), H // 2 - 1, 2.0),
           SpacetimeKeypoint(T2_POS, T2_ORN, np.diag(QD6 + [0.1]), H - 1, 5.0)]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn_time", panda_robot, kps, np.ones(8) * 1e-5, H, 1,
                     q0=np.zeros(7), q_max=qmax, q_min=-qmax)
    u0 = np.tile([0.0] * 7 + [0.01], H - 1)
    cb = Recorder()
    batch.solve(spec, (49, 99), 8, u0, callback=cb)
    golden = [3.41273, 1.13176, 0.441169, 0.326859, 0.244332, 0.128937,
              0.101379, 0.100315]
    golden_alpha = [0.0625, 0.25, 0.0625, 0.125, 0.25, 0.0625, 0.25, 0.5]
    np.testing.assert_allclose(cb.costs, golden, rtol=2e-3)
    np.testing.assert_allclose(cb.alphas, golden_alpha, rtol=1e-6)


def test_batch_cp_second_order(panda_robot):
    """POS_ORN_SYS_2ND.ipynb cell 10: BatchILQRCP with a sawtooth basis."""
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
    psi = np.kron(primitives.build_psi_sawtooth(H - 1, 2), np.eye(7))
    cb = Recorder()
    batch.solve_cp(spec, psi, (H // 2 - 1, H - 1), 6, np.zeros((H - 1) * 7),
                   callback=cb)
    golden = [0.506613, 0.22596, 0.0517259, 0.00781604, 0.00506304, 0.00497986]
    np.testing.assert_allclose(cb.costs, golden, rtol=2e-3)


def test_batch_cp_sequential_object_frames(panda_robot):
    """POS_ORN_MULTI_SYS.ipynb cell 22: BatchILQRCP on the SequentialSystem."""
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
    psi = np.kron(primitives.build_psi_unitstep(H - 1, 2), np.eye(7))
    cb = Recorder()
    res = batch.solve_cp(spec, psi, (H // 2, H - 1), 10, np.zeros((H - 1) * 7),
                         callback=cb)
    golden = [0.174263, 0.0149049, 0.000251172, 0.000215869, 0.000215851,
              0.000215851, 0.000215851]
    assert int(res.iterations) == 7  # early stop (cell 22)
    np.testing.assert_allclose(cb.costs, golden, rtol=2e-3, atol=1e-8)
