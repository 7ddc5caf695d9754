"""System/solver zoo parity vs reference stored outputs.

Each test reproduces one tutorial notebook configuration and checks the
per-iteration costs (and line-search step sizes where stored) against the
reference C++ solver's outputs embedded in the notebooks. All runs are f64
on CPU, like the double-precision reference.
"""

import numpy as np
import pytest

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.ops import primitives, so3
from ilqr_planner_tpu.solvers import al_ilqr, batch, ilqr
from ilqr_planner_tpu.solvers.al_ilqr import Constraints
from ilqr_planner_tpu.systems.keypoints import (
    AngularKeypoint,
    PosOrnKeypoint,
    SpacetimeKeypoint,
)
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


# ---------------------------------------------------------------------------
# POS_ORN_SYS_2ND.ipynb — acceleration control, velocity keypoint components
# ---------------------------------------------------------------------------

def test_posorn_2nd_order_recursive(panda_robot):
    H, dt = 400, 0.01
    qd12_a = np.diag([1, 1, 1, 0.1, 0.1, 0.1, 1, 1, 1, 0, 0, 0])
    qd12_b = np.diag([1, 1, 1, 0.1, 0.1, 0.1, 1, 1, 1, 0.1, 0.1, 0.1])
    kps = [
        PosOrnKeypoint(T1_POS, T1_ORN, qd12_a, H // 2 - 1,
                       dposition=[0, 0, 0], dorientation=[0, 0, 0, 0]),
        PosOrnKeypoint(T2_POS, T2_ORN, qd12_b, H - 1,
                       dposition=[0, 0, 0], dorientation=[0, 0, 0, 0]),
    ]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn", panda_robot, kps, np.ones(7) * 1e-5, H, 2, dt=dt,
                     q0=Q0, q_max=qmax, q_min=-qmax, dq_max=np.ones(7) * 10,
                     dq_min=-np.ones(7) * 10)
    cb = Recorder()
    ilqr.solve(spec, np.zeros((H - 1, 7)), 15, callback=cb)
    # POS_ORN_SYS_2ND.ipynb cell 11: converging head, then the line-search
    # floor-out region where the reference adopts slightly worse trajectories.
    golden_head = [0.217351, 0.0514887, 0.0027045, 0.00201796]
    np.testing.assert_allclose(cb.costs[:4], golden_head, rtol=5e-4)
    assert len(cb.costs) == 15  # no early stop: cost floor > 1e-3
    # floor-out region: alpha bottoms out and cost drifts up, like cell 11
    assert cb.alphas[5] == pytest.approx(0.000976562, rel=1e-6)
    np.testing.assert_allclose(cb.costs[4:8],
                               [0.00202046, 0.00202296, 0.00202546, 0.00202798],
                               rtol=5e-3)


# ---------------------------------------------------------------------------
# POS_ORN_TIME_SYS.ipynb — time-optimal sqrt(dt) control from q0 = 0
# ---------------------------------------------------------------------------

def test_posorn_time_recursive(panda_robot):
    H = 100
    kps = [
        SpacetimeKeypoint(T1_POS, T1_ORN, np.diag(QD6 + [0]), H // 2 - 1, 2.0),
        SpacetimeKeypoint(T2_POS, T2_ORN, np.diag(QD6 + [0.1]), H - 1, 5.0),
    ]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn_time", panda_robot, kps, np.ones(8) * 1e-5, H, 1,
                     q0=np.zeros(7), q_max=qmax, q_min=-qmax)
    U0 = np.tile(np.array([0.0] * 7 + [0.01]), (H - 1, 1))
    cb = Recorder()
    res = ilqr.solve(spec, U0, 20, callback=cb)
    golden = [1.20051, 0.918933, 0.520269, 0.295166, 0.0856217, 0.0492506,
              0.0268716, 0.00829871, 0.00689693, 0.000608163, 3.22939e-05,
              2.98669e-05, 2.98666e-05, 2.98666e-05]
    golden_alpha = [0.5, 0.125, 0.25, 0.25, 0.5, 0.25, 0.25, 0.5, 1, 1, 1, 1,
                    0.25, 0.000976562]
    assert int(res.iterations) == 14  # early stop, POS_ORN_TIME_SYS cell 11
    np.testing.assert_allclose(cb.costs, golden, rtol=2e-3)
    np.testing.assert_allclose(cb.alphas, golden_alpha, rtol=1e-6)


# ---------------------------------------------------------------------------
# POS_ORN_SYS.ipynb cells 14/16 — batch solvers on the canonical workload
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def posorn_spec(panda_robot):
    kps = [
        PosOrnKeypoint(T1_POS, T1_ORN, np.diag(QD6), 49),
        PosOrnKeypoint(T2_POS, T2_ORN, np.diag(QD6), 99),
    ]
    qmax = np.ones(7) * np.pi * 10
    return make_spec("posorn", panda_robot, kps, np.ones(7) * 1e-5, 100, 1,
                     dt=0.1, q0=Q0, q_max=qmax, q_min=-qmax)


def test_batch_ilqr(posorn_spec):
    cb = Recorder()
    res = batch.solve(posorn_spec, (49, 99), 10, np.zeros(99 * 7), callback=cb)
    golden = [0.506613, 0.214529, 0.0509523, 0.00327208, 0.000416059,
              7.24425e-05, 7.11676e-05, 7.11573e-05, 7.1157e-05, 7.1157e-05]
    np.testing.assert_allclose(cb.costs, golden, rtol=5e-4)
    assert all(a == 1.0 for a in cb.alphas)
    assert int(res.iterations) == 10


def test_batch_ilqr_cp(posorn_spec):
    psi = np.kron(primitives.build_psi_unitstep(99, 2), np.eye(7))
    cb = Recorder()
    res = batch.solve_cp(posorn_spec, psi, (49, 99), 10, np.zeros(99 * 7),
                         callback=cb)
    golden = [0.506613, 0.223279, 0.052657, 0.00340295, 0.000464162,
              7.28778e-05, 7.14065e-05, 7.14018e-05, 7.14016e-05]
    # early stop after 9 iterations (POS_ORN_SYS.ipynb cell 14)
    assert int(res.iterations) == 9
    np.testing.assert_allclose(cb.costs, golden, rtol=5e-4)
    assert cb.alphas[-1] == pytest.approx(0.000976562, rel=1e-6)


# ---------------------------------------------------------------------------
# POS_ORN_SYS_AL_ILQR.ipynb — constrained solve (state var 5 <= 2.0)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def posorn_h400_spec(panda_robot):
    kps = [
        PosOrnKeypoint(T1_POS, T1_ORN, np.diag(QD6), 199),
        PosOrnKeypoint(T2_POS, T2_ORN, np.diag(QD6), 399),
    ]
    qmax = np.ones(7) * np.pi * 10
    return make_spec("posorn", panda_robot, kps, np.ones(7) * 1e-5, 400, 1,
                     dt=0.01, q0=Q0, q_max=qmax, q_min=-qmax)


def test_unconstrained_h400_recursive(posorn_h400_spec):
    cb = Recorder()
    res = ilqr.solve(posorn_h400_spec, np.zeros((399, 7)), 10, callback=cb)
    golden = [0.203963, 0.0445521, 0.00237588, 0.000108483, 3.72976e-05, 3.73015e-05]
    assert int(res.iterations) == 6  # early stop (AL_ILQR notebook cell 9)
    np.testing.assert_allclose(cb.costs, golden, rtol=5e-4)


def test_al_ilqr_constrained(posorn_h400_spec):
    # Constraint x_5 <= 2.0 every step (cell 12): A is 14x14 with A[5,5]=1,
    # b[5]=2, initial multipliers = b.
    A = np.zeros((14, 14))
    A[5, 5] = 1.0
    b = np.zeros(14)
    b[5] = 2.0
    cons = Constraints.uniform(A, b, 400)
    cb = Recorder()
    res = al_ilqr.solve(posorn_h400_spec, cons, b, np.zeros((399, 7)),
                        35, 5, 0.25, 1.1, callback=cb)
    golden_head = [0.495126, 0.495336, 0.495553, 0.495774, 0.496001,
                   0.494811, 0.493298]
    golden_alpha_head = [0.0625, 0.000976562, 0.000976562, 0.000976562,
                         0.000976562, 0.0625, 0.125]
    np.testing.assert_allclose(cb.costs[:7], golden_head, rtol=1e-3)
    np.testing.assert_allclose(cb.alphas[:7], golden_alpha_head, rtol=1e-6)
    # mid-run waypoints from cell 14 (penalty ramp kicks in)
    np.testing.assert_allclose(cb.costs[11:15],
                               [0.442421, 0.43535, 0.369963, 0.269327], rtol=5e-3)
    # constraint satisfied at convergence of the reference (~iter 33+): by 35
    # iterations the violating joint is pushed toward the bound
    X = np.asarray(res.X)
    assert X[:, 5].max() < 2.3


# ---------------------------------------------------------------------------
# POS_ORN_MULTI_SYS.ipynb — SequentialSystem over two object frames
# ---------------------------------------------------------------------------

def test_sequential_two_object_frames(panda_robot):
    H, dt = 600, 0.01
    obj1 = np.eye(4)
    obj1[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [0.63758403393523, 0.2994657314658187, 0.6042309402208079, -0.37244039285286973])))
    obj1[:3, 3] = [0.62, 0.05, 0.34]
    obj2 = np.eye(4)
    obj2[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
        [-0.03647984, 0.94060485, 0.33742794, 0.00860923])))
    obj2[:3, 3] = [0.32, 0.05, 0.54]

    rob1 = panda_robot.with_frame(obj1)
    rob2 = panda_robot.with_frame(obj2)
    qmax = np.ones(7) * np.pi * 10
    qd_pos_only = np.diag([1, 1, 1, 0, 0, 0])
    cmd = np.ones(7) * 1e-5
    sub1 = make_spec("posorn", rob1,
                     [PosOrnKeypoint([0, 0, -0.15], [1, 0, 0, 0], qd_pos_only, H // 2)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax)
    sub2 = make_spec("posorn", rob2,
                     [PosOrnKeypoint([0.1, 0.1, -0.1], [1, 0, 0, 0], qd_pos_only, H - 1)],
                     cmd, H, 1, dt=dt, q0=Q0, q_max=qmax, q_min=-qmax)
    spec = sequential_spec((sub1, sub2), cmd)

    cb = Recorder()
    res = ilqr.solve(spec, np.zeros((H - 1, 7)), 10, callback=cb)
    golden = [0.014658, 3.97213e-05, 1.38213e-06, 1.34137e-06, 1.34137e-06]
    assert int(res.iterations) == 5  # early stop (MULTI_SYS cell 23)
    np.testing.assert_allclose(cb.costs, golden, rtol=2e-3, atol=1e-9)


# ---------------------------------------------------------------------------
# Joint-space system (JOINT_SPACE_SYS.ipynb uses random targets; we use fixed
# ones and check the structural behavior: one Gauss-Newton step suffices)
# ---------------------------------------------------------------------------

def test_joint_space_recursive_converges_in_one_iteration(panda_robot):
    H, dt = 100, 0.1
    rng = np.random.default_rng(7)
    qmax = np.array([2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973])
    qmin = np.array([-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973])
    t1 = rng.uniform(qmin, qmax)
    t2 = rng.uniform(qmin, qmax)
    kps = [AngularKeypoint(t1, np.eye(7), 49), AngularKeypoint(t2, np.eye(7), 99)]
    spec = make_spec("joint", panda_robot, kps, np.ones(7) * 1e-5, H, 1, dt=dt,
                     q0=Q0, q_max=qmax, q_min=qmin)
    cb = Recorder()
    res = ilqr.solve(spec, np.zeros((H - 1, 7)), 10, callback=cb)
    # Linear dynamics + quadratic cost: first iteration is exact, second
    # iteration floors out and triggers early stop (cell 15 shows the same).
    assert int(res.iterations) == 2
    assert cb.costs[0] < 1e-3
    assert cb.alphas[-1] == pytest.approx(0.000976562, rel=1e-6)
    X = np.asarray(res.X)
    np.testing.assert_allclose(X[49], t1, atol=1e-2)
    np.testing.assert_allclose(X[99], t2, atol=1e-2)
