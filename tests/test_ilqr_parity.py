"""End-to-end parity: recursive iLQR vs the reference C++ solver's stored
outputs on the canonical tutorial workload (POS_ORN_SYS.ipynb).

The tutorial notebook stores the reference solver's per-iteration costs
produced by the C++ implementation (cell 15). Matching those to ~6
significant digits exercises the entire pipeline — URDF FK + Jacobians,
quaternion log-map residuals, Gauss-Newton quadratization, Riccati backward
pass, line search, and early stopping — against the reference numerics.
"""

import numpy as np
import pytest

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.solvers import ilqr
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"

# POS_ORN_SYS.ipynb cells 2-7: the canonical Panda pos+orn workload.
Q0 = [0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303, 1.50592777, 0.71771416]
TARGET1_POS = [0.554121212377707, -0.01575049935289518, 0.38295604872511507]
TARGET1_ORN = [0.014042440828406944, 0.915047647731553, 0.4024820607528928, 0.022333898196169735]
TARGET2_POS = [0.254121212377707, -0.07575049935289518, 0.13170744424127526]
TARGET2_ORN = [0.029927010072216945, 0.9121514607332729, 0.4087591864532181, 0.00011933313484481926]
QDIAG = [1, 1, 1, 0.1, 0.1, 0.1]
HORIZON = 100
DT = 0.1

# Stored reference outputs (POS_ORN_SYS.ipynb cell 15): per-iteration cost
# of ILQRRecursive::solve(u0=0, 10 iters, line_search, early_stop).
GOLDEN_COSTS = [0.214194, 0.0531093, 0.00372911, 0.000499702,
                3.5657e-06, 9.81748e-07, 9.80374e-07, 9.80376e-07]
GOLDEN_FINAL_ALPHA = 0.000976562  # 2^-10: line-search floor on the last iter


class RecordingCallback:
    def __init__(self):
        self.messages = []

    def notify(self, msg):
        self.messages.append(msg)


@pytest.fixture(scope="module")
def posorn_spec():
    chain = chain_from_urdf(URDF, "panda_link0", "panda_tip")
    robot = Robot.from_chain(chain)
    kps = [
        PosOrnKeypoint(TARGET1_POS, TARGET1_ORN, np.diag(QDIAG), HORIZON // 2 - 1),
        PosOrnKeypoint(TARGET2_POS, TARGET2_ORN, np.diag(QDIAG), HORIZON - 1),
    ]
    q_max = np.ones(7) * np.pi * 10
    return make_spec(
        "posorn", robot, kps, np.ones(7) * 1e-5, HORIZON, 1, dt=DT,
        q0=Q0, dq0=np.zeros(7), q_max=q_max, q_min=-q_max,
    )


def test_recursive_ilqr_matches_reference_costs(posorn_spec):
    cb = RecordingCallback()
    res = ilqr.solve(posorn_spec, np.zeros((HORIZON - 1, 7)), 10, callback=cb)
    # Early stop after 8 iterations, exactly like the reference run.
    assert int(res.iterations) == len(GOLDEN_COSTS)
    costs = [float(m.split("Cost: ")[1].split(",")[0]) for m in cb.messages]
    assert len(costs) == len(GOLDEN_COSTS)
    np.testing.assert_allclose(costs, GOLDEN_COSTS, rtol=2e-4)
    assert float(res.cost) == pytest.approx(GOLDEN_COSTS[-1], rel=2e-4)
    assert float(res.alpha) == pytest.approx(GOLDEN_FINAL_ALPHA, rel=1e-6)


def test_converged_trajectory_reaches_targets(posorn_spec):
    res = ilqr.solve(posorn_spec, np.zeros((HORIZON - 1, 7)), 10)
    fX = np.asarray(res.fX)
    np.testing.assert_allclose(fX[HORIZON // 2 - 1, :3], TARGET1_POS, atol=2e-3)
    np.testing.assert_allclose(fX[HORIZON - 1, :3], TARGET2_POS, atol=2e-3)
    # quaternion targets up to sign
    qf = fX[HORIZON - 1, 3:7]
    d = min(np.linalg.norm(qf - TARGET2_ORN), np.linalg.norm(qf + TARGET2_ORN))
    assert d < 5e-3


def test_no_line_search_single_trial(posorn_spec):
    cb = RecordingCallback()
    ilqr.solve(posorn_spec, np.zeros((HORIZON - 1, 7)), 3,
               line_search=False, early_stop=False, callback=cb)
    # Without line search every iteration runs exactly one trial at alpha=1.
    assert len(cb.messages) == 3
    assert all("alpha= 1" in m for m in cb.messages)


def test_sparse_path_matches_whileloop_path(posorn_spec):
    """The restructured solve (masked iteration scan + fused multi-alpha
    line-search rollout, used when no callback is attached) must match the
    reference-shaped while_loop solve — including on iterations that
    backtrack deep into the alpha schedule (this workload floors out at
    alpha = 2^-10 on its final iteration)."""
    U0 = np.zeros((HORIZON - 1, 7), np.float32)
    kp = ilqr.static_kp_steps(posorn_spec)
    sparse = ilqr._solve_impl(posorn_spec, U0, 10, True, True, False, False, kp)
    dense = ilqr._solve_impl(posorn_spec, U0, 10, True, True, False, False, None)
    assert int(sparse.iterations) == int(dense.iterations)
    assert float(sparse.alpha) == pytest.approx(float(dense.alpha), rel=1e-6)
    assert float(sparse.cost) == pytest.approx(float(dense.cost), rel=1e-4)
    np.testing.assert_allclose(np.asarray(sparse.U), np.asarray(dense.U),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(sparse.X), np.asarray(dense.X),
                               atol=5e-5)


def test_shape_validation(posorn_spec):
    with pytest.raises(ValueError):
        ilqr.solve(posorn_spec, np.zeros((5, 7)), 1)
