"""Lane-major fleet solver vs the vmapped recursive solver.

Both paths implement the same math (sparse recursive iLQR, identical alpha
schedule / regularization / early stop); the fleet solver only changes the
data layout (scenario batch on the minor axis, small dims unrolled). Results
must agree to f32 reduction-order tolerance on the golden Panda workload and
on a joint-space workload, lane by lane.
"""

import numpy as np
import pytest

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.parallel import solve_batch
from ilqr_planner_tpu.solvers.fleet import fleet_supported, make_fleet_solver
from ilqr_planner_tpu.systems.keypoints import AngularKeypoint, PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
Q0 = np.array([0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
               1.50592777, 0.71771416])
T1_POS = [0.554121212377707, -0.01575049935289518, 0.38295604872511507]
T1_ORN = [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
          0.022333898196169735]
T2_POS = [0.254121212377707, -0.07575049935289518, 0.13170744424127526]
T2_ORN = [0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
          0.00011933313484481926]
H = 100


@pytest.fixture(scope="module")
def panda_robot():
    return Robot.from_chain(
        chain_from_urdf(URDF, "panda_link0", "panda_tip",
                        dtype=np.dtype(np.float32))
    )


@pytest.fixture(scope="module")
def panda_robot_f64():
    return Robot.from_chain(
        chain_from_urdf(URDF, "panda_link0", "panda_tip",
                        dtype=np.dtype(np.float64))
    )


def _posorn_spec(robot, dtype=np.float32):
    kps = [
        PosOrnKeypoint(T1_POS, T1_ORN, np.diag([1, 1, 1, .1, .1, .1]), H // 2 - 1),
        PosOrnKeypoint(T2_POS, T2_ORN, np.diag([1, 1, 1, .1, .1, .1]), H - 1),
    ]
    qmax = np.ones(7) * np.pi * 10
    return make_spec("posorn", robot, kps, np.ones(7) * 1e-5, H, 1, dt=0.1,
                     q0=Q0, q_max=qmax, q_min=-qmax, dtype=dtype)


def _batch(spec, B, seed=0):
    rng = np.random.default_rng(seed)
    q0s = (Q0[None] + 0.05 * rng.normal(size=(B, 7))).astype(np.float32)
    U0s = np.zeros((B, H - 1, 7), np.float32)
    return q0s, U0s


def test_fleet_exact_in_f64(panda_robot_f64):
    """Both layouts run the same math: in f64 (where Riccati conditioning
    cannot amplify rounding into visible differences) gains, controls, and
    states must agree to ~1e-10."""
    spec = _posorn_spec(panda_robot_f64, dtype=np.float64)
    rng = np.random.default_rng(0)
    q0s = Q0[None] + 0.05 * rng.normal(size=(2, 7))
    U0s = np.zeros((2, H - 1, 7))
    ref = solve_batch(spec, {"q0": q0s, "x0": q0s}, U0s, 3,
                      line_search=False, early_stop=False)
    fleet = make_fleet_solver(spec, 3, line_search=False,
                              early_stop=False)(q0s, U0s)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.Ks), np.asarray(ref.Ks),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.X), np.asarray(ref.X),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=1e-10)


def test_fleet_matches_vmapped_posorn_early_iters(panda_robot):
    """Three f32 iterations with no early stop: line-search decisions are
    unambiguous, so both layouts take the same alphas; values drift only by
    f32 rounding amplified through the 99-step Riccati recursion (the f64
    test above pins the math exactly)."""
    spec = _posorn_spec(panda_robot)
    assert fleet_supported(spec)
    q0s, U0s = _batch(spec, 4)
    ref = solve_batch(spec, {"q0": q0s, "x0": q0s}, U0s, 3, early_stop=False)
    fleet = make_fleet_solver(spec, 3, early_stop=False)(q0s, U0s)
    np.testing.assert_allclose(np.asarray(fleet.alpha), np.asarray(ref.alpha),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=3e-2)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=2e-3)


def test_fleet_matches_vmapped_posorn_converged(panda_robot):
    """Full 10-iteration solve with line search + early stop. At convergence
    (cost ~1e-6) both paths sit in the same optimum but f32 tie-breaking in
    the floor-out line search legitimately flips iteration counts by 1-2 and
    lets joints drift in the redundant arm's null space — so this asserts
    convergence equivalence, not bit parity (the 3-iter test above does
    that)."""
    spec = _posorn_spec(panda_robot)
    q0s, U0s = _batch(spec, 4)
    ref = solve_batch(spec, {"q0": q0s, "x0": q0s}, U0s, 10)
    fleet = make_fleet_solver(spec, 10)(q0s, U0s)

    assert np.all(np.asarray(fleet.cost) < 1e-5)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=0.15)
    assert np.max(np.abs(np.asarray(fleet.iterations)
                         - np.asarray(ref.iterations))) <= 3
    # task-space trajectories coincide even where joint-space ties differ
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=2e-3)


def test_fleet_matches_vmapped_joint(panda_robot):
    kps = [
        AngularKeypoint(Q0 + 0.3, np.eye(7), H // 2 - 1),
        AngularKeypoint(Q0 - 0.2, np.eye(7), H - 1),
    ]
    qmax = Q0 + 0.25  # tight bounds: the limit penalty path goes live
    spec = make_spec("joint", panda_robot, kps, np.ones(7) * 1e-5, H, 1,
                     dt=0.1, q0=Q0, q_max=qmax, q_min=Q0 - 0.25,
                     dtype=np.float32)
    assert fleet_supported(spec)
    B = 3
    q0s, U0s = _batch(spec, B, seed=1)
    q0s = (q0s - Q0[None]) * 0.1 + Q0[None]  # stay inside the tight bounds
    ref = solve_batch(spec, {"q0": q0s, "x0": q0s}, U0s, 8)
    fleet = make_fleet_solver(spec, 8)(q0s, U0s)

    np.testing.assert_array_equal(np.asarray(fleet.iterations),
                                  np.asarray(ref.iterations))
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=2e-3, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=3e-4)


def test_fleet_rejects_unsupported(panda_robot):
    # posorn on a planar robot is out of fleet scope (no orientation), as
    # is point on a planar robot carrying an object frame.
    spec = _posorn_spec(panda_robot)
    from ilqr_planner_tpu.models.planar import PlanarRobot
    planar = Robot.from_planar(PlanarRobot(lengths=np.ones(3)))
    spec3 = spec.replace(robot=planar)
    assert not fleet_supported(spec3)
    framed = planar.replace(frame=np.eye(4))
    spec4 = spec.replace(kind="point", robot=framed)
    assert not fleet_supported(spec4)
    with pytest.raises(ValueError):
        make_fleet_solver(spec4, 5)


def test_fleet_matches_vmapped_planar_point():
    """Planar (Robot2D) point tracking is fleet-scope since round 4; the
    lane-major FD-Jacobian planar walk must match the vmap path."""
    from ilqr_planner_tpu.models.planar import PlanarRobot
    from ilqr_planner_tpu.systems.keypoints import PointKeypoint

    # f64: the FD Jacobian's mid-descent rounding flips line-search
    # accepts in f32 (the FK itself matches to 3e-14, verified separately)
    planar = Robot.from_planar(
        PlanarRobot(lengths=np.asarray([0.5, 0.4, 0.3])))
    Hp = 50
    kps = [PointKeypoint([0.6, 0.5], np.eye(2), Hp // 2 - 1),
           PointKeypoint([0.2, 0.9], np.eye(2), Hp - 1)]
    qmax = np.ones(3) * np.pi * 10
    spec = make_spec("point", planar, kps, np.ones(3) * 1e-5, Hp, 1, dt=0.1,
                     q0=np.array([0.3, 0.2, 0.1]), q_max=qmax, q_min=-qmax,
                     dtype=np.float64)
    assert fleet_supported(spec)
    B = 4
    rng = np.random.default_rng(7)
    q0s = spec.q0[None] + 0.1 * rng.normal(size=(B, 3))
    U0s = np.zeros((B, Hp - 1, 3))
    ref = solve_batch(spec, {"q0": q0s, "x0": q0s}, U0s, 10,
                      prefer_fleet=False)
    fleet = make_fleet_solver(spec, 10)(q0s, U0s)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-9)
    np.testing.assert_array_equal(np.asarray(fleet.iterations),
                                  np.asarray(ref.iterations))


def _timeopt_spec(robot, dtype=np.float64, H=30):
    from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint

    kps = [SpacetimeKeypoint(T1_POS, T1_ORN,
                             np.diag([1, 1, 1, .1, .1, .1, 0]), H // 2 - 1,
                             2.0),
           SpacetimeKeypoint(T2_POS, T2_ORN,
                             np.diag([1, 1, 1, .1, .1, .1, 0.1]), H - 1,
                             5.0)]
    qmax = np.ones(7) * np.pi * 10
    return make_spec("posorn_time", robot, kps, np.ones(8) * 1e-5, H, 1,
                     dt=None, q0=np.zeros(7), q_max=qmax, q_min=-qmax,
                     dtype=dtype)


def test_fleet_time_optimal_exact_in_f64(panda_robot_f64):
    """posorn_time (sqrt-dt control, time-varying B): both layouts must
    agree to f64 rounding across line-searched iterations."""
    H = 30
    spec = _timeopt_spec(panda_robot_f64, H=H)
    assert fleet_supported(spec)
    B = 2
    rng = np.random.default_rng(1)
    q0s = 0.05 * rng.normal(size=(B, 7))
    x0s = np.concatenate([q0s, np.zeros((B, 1))], axis=-1)
    U0 = np.tile(np.array([0.0] * 7 + [0.01]), (H - 1, 1))
    U0s = np.tile(U0[None], (B, 1, 1))
    ref = solve_batch(spec, {"q0": q0s, "x0": x0s}, U0s, 6,
                      early_stop=False, prefer_fleet=False)
    fleet = make_fleet_solver(spec, 6, early_stop=False)(x0s, U0s)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.Ks), np.asarray(ref.Ks),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=1e-10)


def test_fleet_joint_time_exact_in_f64(panda_robot_f64):
    from ilqr_planner_tpu.systems.keypoints import AngularTimeKeypoint

    H = 30
    kps = [AngularTimeKeypoint(Q0 + 0.3, np.diag([1] * 7 + [0.1]),
                               H // 2 - 1, 1.5),
           AngularTimeKeypoint(Q0 - 0.2, np.diag([1] * 7 + [0.1]), H - 1,
                               3.0)]
    spec = make_spec("joint_time", panda_robot_f64, kps, np.ones(8) * 1e-5,
                     H, 1, dt=None, q0=Q0, q_max=Q0 + 0.35, q_min=Q0 - 0.25,
                     dtype=np.float64)
    assert fleet_supported(spec)
    B = 2
    rng = np.random.default_rng(1)
    q0s = Q0[None] + 0.02 * rng.normal(size=(B, 7))
    x0s = np.concatenate([q0s, np.zeros((B, 1))], axis=-1)
    U0 = np.tile(np.array([0.0] * 7 + [0.01]), (H - 1, 1))
    U0s = np.tile(U0[None], (B, 1, 1))
    ref = solve_batch(spec, {"q0": q0s, "x0": x0s}, U0s, 6,
                      early_stop=False, prefer_fleet=False)
    fleet = make_fleet_solver(spec, 6, early_stop=False)(x0s, U0s)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=1e-10)


# ---------------------------------------------------------------------------
# round-3 scope: 2nd order, AL-iLQR, sequential + object frames, overrides
# ---------------------------------------------------------------------------

def _posorn2_spec(robot, H=60, dtype=np.float64):
    kps = [
        PosOrnKeypoint(T1_POS, T1_ORN, np.diag([1, 1, 1, .1, .1, .1,
                                                .01, .01, .01, .01, .01, .01]),
                       H // 2 - 1, dposition=np.zeros(3),
                       dorientation=np.zeros(4)),
        PosOrnKeypoint(T2_POS, T2_ORN, np.diag([1, 1, 1, .1, .1, .1,
                                                .01, .01, .01, .01, .01, .01]),
                       H - 1, dposition=np.zeros(3), dorientation=np.zeros(4)),
    ]
    qmax = np.ones(7) * np.pi * 10
    return make_spec("posorn", robot, kps, np.ones(7) * 1e-5, H, 2, dt=0.1,
                     q0=Q0, q_max=qmax, q_min=-qmax, dtype=dtype)


def test_fleet_2nd_order_exact_in_f64(panda_robot_f64):
    """Double-integrator posorn (PosOrnPlannerSys.cpp:125-130): the
    lane-major band algebra of _q_terms' nb_deriv=2 branch must match the
    vmapped generic backward to f64 rounding, including the velocity
    residual rows (transport, quat-rate)."""
    H = 60
    spec = _posorn2_spec(panda_robot_f64, H=H)
    assert fleet_supported(spec)
    rng = np.random.default_rng(2)
    B = 2
    q0s = Q0[None] + 0.05 * rng.normal(size=(B, 7))
    x0s = np.concatenate([q0s, np.zeros((B, 7))], axis=-1)
    U0s = np.zeros((B, H - 1, 7))
    ref = solve_batch(spec, {"q0": q0s, "x0": x0s}, U0s, 4,
                      early_stop=False, prefer_fleet=False)
    fleet = make_fleet_solver(spec, 4, early_stop=False)(x0s, U0s)
    # Tolerances: the double integrator's Riccati is ill-conditioned
    # (Quu ~ 1e-5 + dt^4/4 P with P ~ 1e4), so f64 reduction-order noise
    # amplifies to ~1e-8 relative; structural errors would be >1e-2.
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fleet.Ks), np.asarray(ref.Ks),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=1e-6)


def test_fleet_al_exact_in_f64(panda_robot_f64):
    """AL-iLQR fleet (active sets, dual updates, plain-cost acceptance,
    AL-ILQR.cpp:19-232) vs the vmapped AL fast path, f64 exact."""
    from ilqr_planner_tpu.parallel import solve_batch_al
    from ilqr_planner_tpu.solvers.al_ilqr import Constraints
    from ilqr_planner_tpu.solvers.fleet import make_fleet_solver_al

    H = 60
    spec = _posorn_spec_h(panda_robot_f64, H)
    nc, nx, nu = 1, 7, 7
    A = np.zeros((nc, nx + nu))
    A[0, 5] = 1.0  # state var 5 <= bound (POS_ORN_SYS_AL_ILQR.ipynb cell 12)
    b = np.array([1.5])
    cons = Constraints.uniform(A, b, H)
    lam0 = np.zeros(nc)
    B = 2
    rng = np.random.default_rng(3)
    q0s = Q0[None] + 0.05 * rng.normal(size=(B, 7))
    U0s = np.zeros((B, H - 1, 7))

    # 6 iterations: every alpha decision is unambiguous -> f64-exact match
    # (measured: the paths agree to ~1e-9 through iteration 7, then an
    # alpha tie at the optimum flips and cost-flat control directions
    # drift while costs agree to 1e-14 — same tie-breaking as
    # test_fleet_matches_vmapped_posorn_converged).
    ref = solve_batch_al(spec, cons, lam0, {"q0": q0s, "x0": q0s}, U0s,
                         nb_iter=6, lag_update_step=5, penalty=0.25,
                         scaling_factor=1.1, early_stop=False)
    fleet = make_fleet_solver_al(spec, cons, 6, 5, 0.25, 1.1,
                                 early_stop=False)(q0s, U0s, lam0)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(fleet.multipliers),
                               np.asarray(ref.multipliers), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=1e-8)

    # full 12-iteration run incl. two dual updates: converged costs and
    # multipliers coincide
    ref12 = solve_batch_al(spec, cons, lam0, {"q0": q0s, "x0": q0s}, U0s,
                           nb_iter=12, lag_update_step=5, penalty=0.25,
                           scaling_factor=1.1, early_stop=False)
    fl12 = make_fleet_solver_al(spec, cons, 12, 5, 0.25, 1.1,
                                early_stop=False)(q0s, U0s, lam0)
    np.testing.assert_allclose(np.asarray(fl12.cost), np.asarray(ref12.cost),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fl12.multipliers),
                               np.asarray(ref12.multipliers), atol=1e-8)


def _posorn_spec_h(robot, H):
    kps = [
        PosOrnKeypoint(T1_POS, T1_ORN, np.diag([1, 1, 1, .1, .1, .1]), H // 2 - 1),
        PosOrnKeypoint(T2_POS, T2_ORN, np.diag([1, 1, 1, .1, .1, .1]), H - 1),
    ]
    qmax = np.ones(7) * np.pi * 10
    return make_spec("posorn", robot, kps, np.ones(7) * 1e-5, H, 1, dt=0.1,
                     q0=Q0, q_max=qmax, q_min=-qmax, dtype=np.float64)


def test_fleet_sequential_frames_exact_in_f64(panda_robot_f64):
    """SequentialSystem over two object frames
    (TransformedSimulationInterface.cpp:53-103, SequentialSystem.cpp:78-165):
    the fleet's shared-walk + constant-frame FK and summed per-sub terms
    must match the vmapped path to f64 rounding."""
    from ilqr_planner_tpu.ops import so3
    from ilqr_planner_tpu.systems.spec import sequential_spec

    H, dt = 60, 0.01
    obj1 = np.eye(4)
    obj1[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [0.63758403393523, 0.2994657314658187, 0.6042309402208079,
         -0.37244039285286973])))
    obj1[:3, 3] = [0.62, 0.05, 0.34]
    obj2 = np.eye(4)
    obj2[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [-0.03647984, 0.94060485, 0.33742794, 0.00860923])))
    obj2[:3, 3] = [0.32, 0.05, 0.54]
    qd = np.diag([1, 1, 1, 0, 0, 0])
    cmd = np.ones(7) * 1e-5
    qmax = np.ones(7) * np.pi * 10
    sub1 = make_spec("posorn", panda_robot_f64.with_frame(obj1),
                     [PosOrnKeypoint([0, 0, -0.15], [1, 0, 0, 0], qd, H // 2)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax,
                     dtype=np.float64)
    sub2 = make_spec("posorn", panda_robot_f64.with_frame(obj2),
                     [PosOrnKeypoint([0.1, 0.1, -0.1], [1, 0, 0, 0], qd, H - 1)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax,
                     dtype=np.float64)
    spec = sequential_spec((sub1, sub2), cmd)
    assert fleet_supported(spec)
    B = 2
    rng = np.random.default_rng(4)
    q0s = Q0[None] + 0.05 * rng.normal(size=(B, 7))
    U0s = np.zeros((B, H - 1, 7))
    ref = solve_batch(spec, {"q0": q0s, "x0": q0s}, U0s, 4,
                      early_stop=False, prefer_fleet=False)
    fleet = make_fleet_solver(spec, 4, early_stop=False)(q0s, U0s)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=1e-9)


def test_fleet_overrides_mu_prec_exact_in_f64(panda_robot_f64):
    """Per-scenario targets/precisions/dead-zones ride the fast path: the
    override-bound fleet must match the vmap path batching the same Spec
    leaves (SURVEY (x0, keypoints, weights) scenario axis)."""
    H = 60
    spec = _posorn_spec_h(panda_robot_f64, H)
    B = 3
    rng = np.random.default_rng(5)
    q0s = Q0[None] + 0.05 * rng.normal(size=(B, 7))
    U0s = np.zeros((B, H - 1, 7))
    mu_b = np.tile(np.asarray(spec.mu)[None], (B, 1, 1))
    mu_b[:, H - 1, :3] += 0.05 * rng.normal(size=(B, 3))
    prec_b = np.tile(np.asarray(spec.prec)[None], (B, 1, 1, 1))
    prec_b[:, H - 1] *= (1.0 + 0.5 * rng.random(size=(B, 1, 1)))
    rad_b = np.zeros((B, H))
    rad_b[:, H // 2 - 1] = 0.01 * rng.random(B)
    th_b = np.zeros((B, H, 3))

    ref = solve_batch(spec, {"q0": q0s, "x0": q0s, "mu": mu_b,
                             "prec": prec_b, "pos_radius": rad_b,
                             "orn_thresh": th_b},
                      U0s, 4, early_stop=False, prefer_fleet=False)
    solver = make_fleet_solver(spec, 4, early_stop=False,
                               overrides=("mu", "prec", "pos_radius",
                                          "orn_thresh"))
    fleet = solver(q0s, U0s, {"mu": mu_b, "prec": prec_b,
                              "pos_radius": rad_b, "orn_thresh": th_b})
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=1e-9)


def test_fleet_hybrid_joint_plus_task_exact_in_f64(panda_robot_f64):
    """Hybrid SequentialSystem mixing a joint-space and a task-space sub
    (HYBRID_SYS.ipynb structure): joint subs skip FK entirely while task
    subs share the walk; summed terms must match the vmap path exactly."""
    from ilqr_planner_tpu.systems.keypoints import AngularKeypoint
    from ilqr_planner_tpu.systems.spec import sequential_spec

    H, dt = 50, 0.01
    qmax = np.ones(7) * np.pi * 10
    cmd = np.ones(7) * 1e-5
    sj = make_spec("joint", panda_robot_f64,
                   [AngularKeypoint(Q0 + 0.2, np.eye(7) * 0.1, H // 2)],
                   cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax,
                   dtype=np.float64)
    st = make_spec("posorn", panda_robot_f64,
                   [PosOrnKeypoint(T2_POS, T2_ORN,
                                   np.diag([1, 1, 1, .1, .1, .1]), H - 1)],
                   cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax,
                   dtype=np.float64)
    spec = sequential_spec((sj, st), cmd)
    assert fleet_supported(spec)
    B = 2
    rng = np.random.default_rng(0)
    q0s = Q0[None] + 0.03 * rng.normal(size=(B, 7))
    U0s = np.zeros((B, H - 1, 7))
    ref = solve_batch(spec, {"q0": q0s, "x0": q0s}, U0s, 4,
                      early_stop=False, prefer_fleet=False)
    fleet = make_fleet_solver(spec, 4, early_stop=False)(q0s, U0s)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-11)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-11)
    np.testing.assert_allclose(np.asarray(fleet.fX), np.asarray(ref.fX),
                               atol=1e-11)


def test_fleet_time_optimal_2nd_order_exact_in_f64(panda_robot_f64):
    """posorn_time with acceleration control (nb_deriv=2): new fleet scope
    in round 4. A = I + s^2 E and the chain-rule B column reads the UPDATED
    velocity (PosOrnTimePlannerSys.cpp:165-176); both layouts must agree to
    f64 rounding."""
    from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint

    Ht = 20
    Qt = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, 0, 0, 0, .1])
    kps = [SpacetimeKeypoint(T1_POS, T1_ORN, Qt, Ht - 1, 2.0,
                             dposition=[0, 0, 0],
                             dorientation=[0, 0, 0, 0])]
    qmax = np.ones(7) * np.pi * 10
    dqmax = np.ones(7) * 10.0
    spec = make_spec("posorn_time", panda_robot_f64, kps, np.ones(8) * 1e-5,
                     Ht, 2, dt=None, q0=Q0, q_max=qmax, q_min=-qmax,
                     dq_max=dqmax, dq_min=-dqmax, dtype=np.float64)
    assert fleet_supported(spec)
    B = 2
    rng = np.random.default_rng(3)
    q0s = Q0[None] + 0.02 * rng.normal(size=(B, 7))
    x0s = np.concatenate([q0s, np.zeros((B, 7)), np.zeros((B, 1))], axis=-1)
    U0 = np.tile(np.array([0.0] * 7 + [0.1]), (Ht - 1, 1))
    U0s = np.tile(U0[None], (B, 1, 1))
    # one iteration, no line search: exact-math parity (the sqrt(dt)
    # acceleration-control dynamics are the reference's known-fragile
    # parameterization — POS_ORN_TIME_SYS_2ND.ipynb diverges — so longer
    # runs amplify f64 rounding chaotically and only behavioral agreement
    # is meaningful there)
    ref1 = solve_batch(spec, {"q0": q0s, "x0": x0s}, U0s, 1,
                       line_search=False, early_stop=False,
                       prefer_fleet=False)
    fl1 = make_fleet_solver(spec, 1, line_search=False,
                            early_stop=False)(x0s, U0s)
    np.testing.assert_allclose(np.asarray(fl1.cost), np.asarray(ref1.cost),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fl1.U), np.asarray(ref1.U),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fl1.Ks), np.asarray(ref1.Ks),
                               atol=1e-10)
    # four line-searched iterations: behavioral agreement
    ref = solve_batch(spec, {"q0": q0s, "x0": x0s}, U0s, 4,
                      early_stop=False, prefer_fleet=False)
    fleet = make_fleet_solver(spec, 4, early_stop=False)(x0s, U0s)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               rtol=0.05, atol=1e-3)


def test_fleet_joint_time_2nd_order_exact_in_f64(panda_robot_f64):
    from ilqr_planner_tpu.systems.keypoints import AngularTimeKeypoint

    Ht = 20
    kps = [AngularTimeKeypoint(
        Q0 + 0.2, np.diag([1.0] * 7 + [0.01] * 7 + [0.1]), Ht - 1, 1.5,
        dposition=np.zeros(7))]
    qmax = np.ones(7) * np.pi * 10
    dqmax = np.ones(7) * 10.0
    spec = make_spec("joint_time", panda_robot_f64, kps, np.ones(8) * 1e-5,
                     Ht, 2, dt=None, q0=Q0, q_max=qmax, q_min=-qmax,
                     dq_max=dqmax, dq_min=-dqmax, dtype=np.float64)
    assert fleet_supported(spec)
    B = 2
    rng = np.random.default_rng(5)
    q0s = Q0[None] + 0.02 * rng.normal(size=(B, 7))
    x0s = np.concatenate([q0s, np.zeros((B, 7)), np.zeros((B, 1))], axis=-1)
    U0 = np.tile(np.array([0.0] * 7 + [0.1]), (Ht - 1, 1))
    U0s = np.tile(U0[None], (B, 1, 1))
    ref1 = solve_batch(spec, {"q0": q0s, "x0": x0s}, U0s, 1,
                       line_search=False, early_stop=False,
                       prefer_fleet=False)
    fl1 = make_fleet_solver(spec, 1, line_search=False,
                            early_stop=False)(x0s, U0s)
    # rtol: the fleet backward runs the exact collapsed value recursion
    # (P1 = Qxx + Qxu K - reg K'K; round-5 _gains_value) — algebraically
    # identical to the vmap path's long form, different rounding order.
    np.testing.assert_allclose(np.asarray(fl1.cost), np.asarray(ref1.cost),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(fl1.U), np.asarray(ref1.U),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fl1.Ks), np.asarray(ref1.Ks),
                               atol=1e-10)
    ref = solve_batch(spec, {"q0": q0s, "x0": x0s}, U0s, 4,
                      early_stop=False, prefer_fleet=False)
    fleet = make_fleet_solver(spec, 4, early_stop=False)(x0s, U0s)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-4)


def test_fleet_sequential_overrides_exact_in_f64(panda_robot_f64):
    """Per-scenario keypoint targets on a SEQUENTIAL spec (round-4 scope):
    overrides are per-sub lists (None keeps that sub's constants); the
    fleet must match the vmap path with the same per-sub batched leaves."""
    from ilqr_planner_tpu.ops import so3
    from ilqr_planner_tpu.systems.spec import sequential_spec

    H, dt = 40, 0.01
    obj1 = np.eye(4)
    obj1[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [0.63758403393523, 0.2994657314658187, 0.6042309402208079,
         -0.37244039285286973])))
    obj1[:3, 3] = [0.62, 0.05, 0.34]
    qd = np.diag([1, 1, 1, 0, 0, 0])
    cmd = np.ones(7) * 1e-5
    qmax = np.ones(7) * np.pi * 10
    sub1 = make_spec("posorn", panda_robot_f64.with_frame(obj1),
                     [PosOrnKeypoint([0, 0, -0.15], [1, 0, 0, 0], qd, H // 2)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax,
                     dtype=np.float64)
    sub2 = make_spec("posorn", panda_robot_f64,
                     [PosOrnKeypoint(T1_POS, T1_ORN, qd, H - 1)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax,
                     dtype=np.float64)
    spec = sequential_spec((sub1, sub2), cmd)
    assert fleet_supported(spec)
    B = 3
    rng = np.random.default_rng(11)
    q0s = Q0[None] + 0.03 * rng.normal(size=(B, 7))
    U0s = np.zeros((B, H - 1, 7))
    # batch sub2's targets only; sub1 keeps its constants (None entry)
    mu2 = np.tile(np.asarray(sub2.mu)[None], (B, 1, 1))
    mu2[:, H - 1, :3] += 0.04 * rng.normal(size=(B, 3))
    ov = {"q0": q0s, "x0": q0s, "mu": [None, mu2]}
    ref = solve_batch(spec, ov, U0s, 4, early_stop=False, prefer_fleet=False)
    fleet = solve_batch(spec, ov, U0s, 4, early_stop=False)
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-9)


def test_fleet_backward_pallas_forced_out_of_scope_raises(panda_robot):
    """Forcing backward='pallas' on a workload outside the Pallas sweeps'
    scope (here: sqrt-dt time-optimal with ACCELERATION control — the
    time-optimal kernels cover only the first-order kind) must fail
    loudly instead of silently running the XLA scan (advisor round-4
    finding: bench configs could report XLA numbers as Pallas)."""
    from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint

    kps = [SpacetimeKeypoint(T1_POS, T1_ORN,
                             np.diag([1, 1, 1, .1, .1, .1] * 2 + [0]), 9, 1.0,
                             dposition=[0, 0, 0],
                             dorientation=[0, 0, 0, 0])]
    spec2 = make_spec("posorn_time", panda_robot, kps, np.ones(8) * 1e-5,
                      10, 2, dt=None, q0=Q0, dtype=np.float32)
    solver = make_fleet_solver(spec2, 2, backward="pallas", ls="scan")
    x0s = np.concatenate([np.tile(Q0[None], (2, 1)),
                          np.zeros((2, 8))], axis=-1).astype(np.float32)
    U0 = np.tile(np.array([0.0] * 7 + [0.1], np.float32), (9, 1))
    U0s = np.tile(U0[None], (2, 1, 1))
    with pytest.raises(ValueError, match="outside the Pallas sweep"):
        solver(x0s, U0s)


def test_planar_with_frame_raises_early():
    """Object frames are 3-D-only (the reference's 6x6 T_aug transform,
    TransformedSimulationInterface.cpp:53-58, cannot multiply Robot2D's
    4 x dof Jacobian either): attaching a frame to a planar robot fails
    early with a real message (round-4 verdict stretch item resolution)."""
    from ilqr_planner_tpu.models import Robot
    from ilqr_planner_tpu.models.planar import PlanarRobot

    rob = Robot.from_planar(PlanarRobot(lengths=np.array([1.0, 0.8])))
    with pytest.raises(ValueError, match="3-D"):
        rob.with_frame(np.eye(4))


def test_affine_vs_scan_line_search_equivalent(panda_robot_f64):
    """ls='affine' (one base+direction scan, scan-free trials) vs ls='scan'
    (sequential re-rollouts): identical decisions, f64 agreement to
    reduction-order noise on a full converged solve (round-5
    _run_trials_affine)."""
    spec = _posorn_spec(panda_robot_f64, dtype=np.float64)
    rng = np.random.default_rng(9)
    q0s = Q0[None] + 0.05 * rng.normal(size=(3, 7))
    U0s = np.zeros((3, H - 1, 7))
    aff = make_fleet_solver(spec, 10, ls="affine")(q0s, U0s)
    scn = make_fleet_solver(spec, 10, ls="scan")(q0s, U0s)
    np.testing.assert_array_equal(np.asarray(aff.iterations),
                                  np.asarray(scn.iterations))
    np.testing.assert_array_equal(np.asarray(aff.alpha), np.asarray(scn.alpha))
    np.testing.assert_allclose(np.asarray(aff.cost), np.asarray(scn.cost),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(aff.U), np.asarray(scn.U),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(aff.X), np.asarray(scn.X),
                               atol=1e-9)


def test_affine_forced_on_time_optimal_raises(panda_robot):
    """ls='affine' requires LTI dynamics; forcing it on a sqrt-dt
    time-optimal spec is a hard error (B depends on u there)."""
    from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint

    kps = [SpacetimeKeypoint(T1_POS, T1_ORN, np.diag([1, 1, 1, .1, .1, .1, 0]),
                             H - 1, 5.0)]
    spec = make_spec("posorn_time", panda_robot, kps, np.ones(8) * 1e-5, H, 1,
                     dt=None, q0=Q0, dtype=np.float32)
    with pytest.raises(ValueError, match="affine"):
        make_fleet_solver(spec, 5, ls="affine")


def test_fleet_al_diag_fold_kernel_and_nonfoldable(panda_robot_f64):
    """Round-5 diagonal-AL fold: axis-aligned state-bound constraints fold
    exactly into the streamed stage arrays, un-gating the collapsed LTI
    recursion AND the Pallas whole-sweep kernel for AL problems. Checks:
    (a) the folded path through the Pallas kernel (interpret) matches the
    XLA path; (b) a NON-foldable constraint (two coupled state coords)
    keeps the generic AL backward and still matches the vmap oracle."""
    from ilqr_planner_tpu.parallel import solve_batch_al
    from ilqr_planner_tpu.solvers.al_ilqr import Constraints
    from ilqr_planner_tpu.solvers.fleet import make_fleet_solver_al

    H_ = 40
    spec = _posorn_spec_h(panda_robot_f64, H_)
    rng = np.random.default_rng(6)

    # (a) foldable: single-coordinate bound -> kernel path == XLA path
    # (kernel lane groups need B % 128 == 0)
    Bk = 128
    q0k = Q0[None] + 0.05 * rng.normal(size=(Bk, 7))
    U0k = np.zeros((Bk, H_ - 1, 7))
    A1 = np.zeros((1, 14))
    A1[0, 5] = 1.0
    cons1 = Constraints.uniform(A1, np.array([1.5]), H_)
    xla = make_fleet_solver_al(spec, cons1, 6, 5, 0.25, 1.1,
                               early_stop=False, backward="xla")(
        q0k, U0k, np.zeros(1))
    pal = make_fleet_solver_al(spec, cons1, 6, 5, 0.25, 1.1,
                               early_stop=False,
                               backward="pallas_interpret")(
        q0k, U0k, np.zeros(1))
    # the kernel solves M via Cholesky, the XLA path via Gauss-Jordan —
    # ulp-level differences amplified through 6 iterations with active-set
    # boundaries (single-sweep parity is 1e-10, test_segment_backward)
    np.testing.assert_allclose(np.asarray(pal.cost), np.asarray(xla.cost),
                               rtol=1e-5, atol=1e-12)
    # with 128 lanes a few sit on line-search/active-set decision
    # boundaries where ulp differences legitimately flip the branch (same
    # tie-breaking caveat as test_fleet_matches_vmapped_posorn_converged);
    # require near-total elementwise agreement instead of a global atol
    du = np.abs(np.asarray(pal.U) - np.asarray(xla.U))
    assert float(np.mean(du < 1e-6)) > 0.995, float(np.mean(du < 1e-6))
    dm = np.abs(np.asarray(pal.multipliers) - np.asarray(xla.multipliers))
    assert float(np.mean(dm < 1e-7)) > 0.995, float(np.mean(dm < 1e-7))

    # (b) non-foldable: coupled-coordinate constraint x4 + x5 <= b keeps
    # the generic AL backward; fleet still matches the vmap oracle, and
    # forcing the kernel on it raises (outside scope)
    B = 2
    q0s = Q0[None] + 0.05 * rng.normal(size=(B, 7))
    U0s = np.zeros((B, H_ - 1, 7))
    A2 = np.zeros((1, 14))
    A2[0, 4] = 1.0
    A2[0, 5] = 1.0
    cons2 = Constraints.uniform(A2, np.array([2.0]), H_)
    ref = solve_batch_al(spec, cons2, np.zeros(1), {"q0": q0s, "x0": q0s},
                         U0s, nb_iter=6, lag_update_step=5, penalty=0.25,
                         scaling_factor=1.1, early_stop=False)
    fleet = make_fleet_solver_al(spec, cons2, 6, 5, 0.25, 1.1,
                                 early_stop=False)(q0s, U0s, np.zeros(1))
    np.testing.assert_allclose(np.asarray(fleet.cost), np.asarray(ref.cost),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(fleet.U), np.asarray(ref.U),
                               atol=1e-8)
    forced = make_fleet_solver_al(spec, cons2, 2, 5, 0.25, 1.1,
                                  early_stop=False, backward="pallas")
    with pytest.raises(ValueError, match="outside the Pallas sweep"):
        forced(q0s, U0s, np.zeros(1))
