"""PyLQR compat-layer test: the POS_ORN_SYS.ipynb workflow near-verbatim.

Reproduces the reference tutorial's cells through the drop-in `PyLQR` alias
(imports, constructors, solve calls, replay loop) and checks per-iteration
costs against the notebook's stored reference outputs.
"""

import numpy as np
import pytest

from PyLQR.sim import KDLRobot, Robot2D, TransformedSimulationInterface
from PyLQR.solver import LQT, BatchILQRCP, ILQRRecursive
from PyLQR.system import PosOrnKeypoint, PosOrnPlannerSys
from PyLQR.utils import Sd, primitives

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"


class RecordingCB:
    def __init__(self):
        self.messages = []

    def notify(self, msg):
        self.messages.append(msg)

    @property
    def costs(self):
        return [float(m.split("Cost: ")[1].split(",")[0]) for m in self.messages]


@pytest.fixture(scope="module")
def tutorial():
    """POS_ORN_SYS.ipynb cells 2-12, verbatim API."""
    dof, horizon, dt = 7, 100, 0.1
    q0 = [0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
          1.50592777, 0.71771416]
    dq0 = [0] * dof
    qMax = np.array([np.pi] * dof) * 10
    rbt = KDLRobot(URDF, "panda_link0", "panda_tip", q0, dq0)

    keypoint_1 = PosOrnKeypoint(
        np.array([0.554121212377707, -0.01575049935289518, 0.38295604872511507]),
        np.array([0.014042440828406944, 0.915047647731553, 0.4024820607528928,
                  0.022333898196169735]),
        np.diag([1, 1, 1, .1, .1, .1]), horizon // 2 - 1)
    keypoint_2 = PosOrnKeypoint(
        np.array([0.254121212377707, -0.07575049935289518, 0.13170744424127526]),
        np.array([0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
                  0.00011933313484481926]),
        np.diag([1, 1, 1, .1, .1, .1]), horizon - 1)
    cmd_penalties = (np.ones(dof) * 1e-5).tolist()
    sys = PosOrnPlannerSys(rbt, [keypoint_1, keypoint_2], cmd_penalties,
                           qMax, -qMax, horizon, 1, dt)
    return rbt, sys, horizon, dof, dt, q0, dq0


def test_recursive_solver_via_compat(tutorial):
    rbt, sys, horizon, dof, dt, q0, dq0 = tutorial
    planner = ILQRRecursive(sys)
    cb = RecordingCB()
    u0 = np.zeros(dof * (horizon - 1))
    X2, F_X2, U2, K2, k2, cost = planner.solve(
        u0.reshape((-1, dof)), 10, True, True, cb)
    golden = [0.214194, 0.0531093, 0.00372911, 0.000499702, 3.5657e-06,
              9.81748e-07, 9.80374e-07, 9.80376e-07]
    np.testing.assert_allclose(cb.costs, golden, rtol=2e-4)
    assert cost == pytest.approx(golden[-1], rel=2e-4)
    assert np.asarray(F_X2).shape == (horizon, 7)


def test_batch_cp_and_replay_loop(tutorial):
    """Cell 14: CP solve + send_vel replay through the robot wrapper."""
    rbt, sys, horizon, dof, dt, q0, dq0 = tutorial
    K = 2
    psi = primitives.build_psi_unitstep(horizon - 1, K)
    PSI = np.kron(psi, np.identity(dof))
    planner = BatchILQRCP(sys, PSI)
    cb = RecordingCB()
    U1 = planner.solve(10, np.zeros(dof * (horizon - 1)), True, cb)
    assert cb.costs[0] == pytest.approx(0.506613, rel=2e-4)
    U1 = np.asarray(U1).reshape((horizon - 1, dof))

    rbt.set_conf(q0, dq0, True)
    F_X1 = np.zeros((horizon, 7))
    F_X1[0] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn()))
    for i in range(horizon - 1):
        rbt.send_vel(dt, U1[i], True)
        F_X1[i + 1] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn()))
    # replayed trajectory hits the via-points
    np.testing.assert_allclose(
        F_X1[horizon // 2 - 1, :3],
        [0.554121212377707, -0.01575049935289518, 0.38295604872511507], atol=2e-2)
    np.testing.assert_allclose(
        F_X1[horizon - 1, :3],
        [0.254121212377707, -0.07575049935289518, 0.13170744424127526], atol=5e-3)


def test_system_accessors(tutorial):
    rbt, sys, horizon, dof, dt, q0, dq0 = tutorial
    assert sys.get_nb_state_var() == 7
    assert sys.get_nb_ctrl_var() == 7
    assert sys.get_nb_target_var() == 7
    assert sys.get_nb_Q_var() == 6
    assert sys.get_horizon() == horizon
    assert sys.get_kp_indexes() == [49, 99]
    mu = sys.get_mu_vector(False)
    assert mu.shape == (horizon * 7,)
    assert np.allclose(mu[49 * 7:49 * 7 + 3],
                       [0.554121212377707, -0.01575049935289518, 0.38295604872511507])
    Q = sys.get_Q_matrix(True)
    assert Q.shape == (12, 12)
    fx, J = sys.get_fx_jac(sys.get_init_state())
    assert fx.shape == (7,) and J.shape == (6, 7)
    # forward_pass drives the robot like the reference
    x1, fx1, A, B, J1 = sys.forward_pass(sys.get_init_state(), np.ones(7) * 0.1, 0)
    np.testing.assert_allclose(x1, np.asarray(q0) + dt * 0.1, atol=1e-12)
    np.testing.assert_allclose(rbt.get_q(), x1, atol=1e-12)
    sys.reset()
    np.testing.assert_allclose(rbt.get_q(), q0, atol=1e-12)


def test_sim_wrappers():
    rob = Robot2D(np.array([1.0, 0.8]), np.array([0.3, 0.4]))
    x = rob.fkine()
    assert x.shape == (2,)
    rob.send_vel(0.1, np.array([0.5, -0.2]), True)
    np.testing.assert_allclose(rob.get_q(), [0.35, 0.38], atol=1e-12)
    assert rob.get_time() == pytest.approx(0.1)
    rob.set_conf([0.0, 0.0], [0.0, 0.0], True)
    assert rob.get_time() == 0.0
    np.testing.assert_allclose(rob.fkine(), [1.8, 0.0], atol=1e-12)

    # Transformed wrapper expresses EE position in the object frame
    T = np.eye(4)
    T[:3, 3] = [0.5, 0.0, 0.0]
    panda = KDLRobot(URDF, "panda_link0", "panda_tip",
                     [0.1] * 7, [0.0] * 7)
    tr = TransformedSimulationInterface(panda, T)
    np.testing.assert_allclose(tr.get_ee_pos(), panda.get_ee_pos() - [0.5, 0, 0],
                               atol=1e-12)


def test_sd_namespace():
    q = np.array([0.2, 0.4, -0.1, 0.6])
    q /= np.linalg.norm(q)
    assert Sd.distance(q, q) == pytest.approx(0.0, abs=1e-7)
    assert Sd.logMap(q, q).shape == (4,)
    E = Sd.dquat_to_w_jac(q)
    assert E.shape == (3, 4)
    y = Sd.expMap(q, np.array([0.1, 0, 0, 0]) - np.dot([0.1, 0, 0, 0], q) * q)
    assert np.linalg.norm(y) == pytest.approx(1.0)
    v = Sd.transport(np.array([0.1, 0.2, 0.0, -0.1]), q, q)
    assert v.shape == (4,)


def test_lqt_compat_aliases():
    A = np.array([[1.0, 0.1], [0, 1.0]])
    B = np.array([[0.005], [0.1]])
    Qs = np.zeros((20, 2, 2))
    Qs[-1] = np.eye(2)
    mu = np.zeros(40)
    mu[-2:] = [1.0, 0.0]
    lqt = LQT(A, B, Qs, mu, 0.01, 1)
    lqt.solve_lin_al()
    assert lqt.get_nb_states() == 20
    assert lqt.get_command(0).shape == (1,)
    lqt.solve_DP()
    assert np.asarray(lqt.get_command(0, mu[:2])).shape == (1,)


def test_jacobian_derivative_slices_and_psi_RBF(tutorial):
    """Drop-in holes closed in round 3: Jtp/Jrp (bindings.cpp:93-94) and the
    capital-RBF basis builder (bindings.cpp:903)."""
    rbt = tutorial[0]
    rbt.send_vel(0.1, np.ones(7) * 0.1)
    Jtp, Jrp = rbt.Jtp(), rbt.Jrp()
    assert Jtp.shape == (3, 7) and Jrp.shape == (3, 7)
    np.testing.assert_allclose(np.vstack([Jtp, Jrp]), rbt.Jp())
    # dJ contracted with dq equals the FD derivative of J (utils.h:70-113)
    q, dq, eps = rbt.get_q(), rbt.get_dq(), 1e-6
    r1 = KDLRobot(URDF, "panda_link0", "panda_tip", q - eps * dq, np.zeros(7))
    r2 = KDLRobot(URDF, "panda_link0", "panda_tip", q + eps * dq, np.zeros(7))
    fd = (r2.J() - r1.J()) / (2 * eps)
    np.testing.assert_allclose(np.vstack([Jtp, Jrp]), fd, atol=1e-5)

    psi = primitives.build_psi_RBF(99, 5)
    np.testing.assert_allclose(psi, primitives.build_psi_rbf(99, 5))
    assert psi.shape == (99, 5)


def test_concurrent_callbacks_do_not_interleave(tutorial):
    """Two solves running on separate threads with different callbacks each
    receive exactly their own iteration stream (round-2 verdict: the old
    module-global callback slot interleaved nested/threaded solves)."""
    import threading

    _, sys_, horizon, dof, _, _, _ = tutorial
    u0 = np.zeros((horizon - 1, dof))
    iters = {"a": 4, "b": 6}
    cbs = {k: RecordingCB() for k in iters}
    errs = []

    def run(k):
        try:
            ILQRRecursive(sys_).solve(u0, iters[k], True, False, cbs[k])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=run, args=(k,)) for k in iters]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    for k in iters:
        msgs = cbs[k].messages
        assert len(msgs) == iters[k], (k, msgs)
        got_iters = [int(m.split("Iteration ")[1].split(",")[0]) for m in msgs]
        assert got_iters == list(range(1, iters[k] + 1))


def test_concurrent_batch_callbacks_do_not_interleave(tutorial):
    """Round-3 verdict: the batch solvers kept a module-global callback slot
    after ilqr got the traced-id registry. Two threaded BatchILQRCP/BatchILQR
    solves with different callbacks must each receive exactly their own
    iteration stream (early_stop=False pins the counts)."""
    import threading

    _, sys_, horizon, dof, _, _, _ = tutorial
    K = 2
    psi = primitives.build_psi_unitstep(horizon - 1, K)
    PSI = np.kron(psi, np.identity(dof))
    u0 = np.zeros(dof * (horizon - 1))
    iters = {"cp": 3, "batch": 5}
    cbs = {k: RecordingCB() for k in iters}
    errs = []

    def run(k):
        try:
            if k == "cp":
                BatchILQRCP(sys_, PSI).solve(iters[k], u0, False, cbs[k])
            else:
                from PyLQR.solver import BatchILQR
                BatchILQR(sys_).solve(iters[k], u0, False, cbs[k])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=run, args=(k,)) for k in iters]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    for k in iters:
        msgs = cbs[k].messages
        assert len(msgs) == iters[k], (k, msgs)
        got_iters = [int(m.split("Iteration ")[1].split(",")[0]) for m in msgs]
        assert got_iters == list(range(1, iters[k] + 1))
