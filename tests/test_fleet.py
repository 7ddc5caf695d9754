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
    spec = _posorn_spec(panda_robot)
    spec2 = spec.replace(nb_deriv=2)
    assert not fleet_supported(spec2)
    with pytest.raises(ValueError):
        make_fleet_solver(spec2, 5)


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
