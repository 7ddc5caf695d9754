"""LQT solver tests (lqt.cpp:16-128) against closed-form NumPy oracles."""

import numpy as np
import pytest

from ilqr_planner_tpu.solvers.lqt import LQT

NX, NU, N = 2, 1, 40
A = np.array([[1.0, 0.1], [0.0, 1.0]])
B = np.array([[0.005], [0.1]])
RFACTOR = 0.01


def _setup(track_mid=False):
    Qs = np.zeros((N, NX, NX))
    Qs[-1] = np.eye(NX)
    mu = np.zeros(N * NX)
    mu[-NX:] = [1.0, 0.0]
    if track_mid:
        Qs[N // 2] = np.eye(NX) * 10
        mu[(N // 2) * NX : (N // 2 + 1) * NX] = [-0.5, 0.0]
    return Qs, mu


def np_oracle_batch(Qs, mu):
    """Independent dense least-squares solution with textbook Sx/Su."""
    Su = np.zeros((N * NX, (N - 1) * NU))
    Sx = np.zeros((N * NX, NX))
    Sx[:NX] = np.eye(NX)
    for i in range(1, N):
        Sx[i * NX : (i + 1) * NX] = Sx[(i - 1) * NX : i * NX] @ A
        for j in range(i):
            Su[i * NX : (i + 1) * NX, j * NU : (j + 1) * NU] = (
                np.linalg.matrix_power(A, i - 1 - j) @ B
            )
    Q = np.zeros((N * NX, N * NX))
    for i in range(N):
        Q[i * NX : (i + 1) * NX, i * NX : (i + 1) * NX] = Qs[i]
    R = np.eye((N - 1) * NU) * RFACTOR
    u = np.linalg.solve(Su.T @ Q @ Su + R, Su.T @ Q @ (mu - Sx @ mu[:NX]))
    return u, Su, Sx


def test_linalg_matches_textbook_oracle():
    Qs, mu = _setup(track_mid=True)
    lqt = LQT(A, B, Qs, mu, RFACTOR, 1)
    lqt.solve_linalg()
    u_oracle, _, _ = np_oracle_batch(Qs, mu)
    np.testing.assert_allclose(np.asarray(lqt._u), u_oracle, atol=1e-8)


def test_predicted_states_reach_target():
    Qs, mu = _setup()
    lqt = LQT(A, B, Qs, mu, RFACTOR, 1)
    lqt.solve_linalg()
    pred = np.asarray(lqt.get_predicted_states()).reshape(N, NX)
    np.testing.assert_allclose(pred[0], mu[:NX], atol=1e-12)
    np.testing.assert_allclose(pred[-1], [1.0, 0.0], atol=0.05)


def np_oracle_dp(Qs, mu):
    """Independent transcription of the reference solveDP + getCommand
    (lqt.cpp:29-53, 102-120) including its aim-at-next-state semantics."""
    Ps = [Qs[-1]]
    ds = [np.zeros(NX)]
    Rt = np.eye(NU) * RFACTOR
    for i in range(N - 2, -1, -1):
        P1, d1 = Ps[-1], ds[-1]
        inv = np.linalg.inv(B.T @ P1 @ B + Rt)
        Ps.append(Qs[i] - A.T @ (P1 @ B @ inv @ B.T @ P1 - P1) @ A)
        ds.append((A.T - A.T @ P1 @ B @ inv @ B.T)
                  @ (P1 @ (A @ mu[i * NX:(i + 1) * NX] - mu[(i + 1) * NX:(i + 2) * NX]) + d1))

    def cmd(ts, x):
        t = ts + 1
        Pt, dt = Ps[N - t - 1], ds[N - t - 1]
        inv = np.linalg.inv(B.T @ Pt @ B + Rt)
        mu_t = mu[t * NX:(t + 1) * NX]
        return inv @ B.T @ Pt @ A @ (mu_t - x) - inv @ B.T @ (Pt @ (A @ mu_t - mu_t) + dt)

    return cmd


def test_dp_closed_loop_matches_reference_formulas():
    Qs, mu = _setup(track_mid=True)
    lqt = LQT(A, B, Qs, mu, RFACTOR, 1)
    lqt.solve_dp()
    oracle_cmd = np_oracle_dp(Qs, mu)
    x = mu[:NX].copy()
    traj = [x]
    for k in range(N - 1):
        u = np.asarray(lqt.get_command(k, x))
        np.testing.assert_allclose(u, oracle_cmd(k, x), atol=1e-9)
        x = A @ x + B @ u
        traj.append(x)
    traj = np.stack(traj)
    # The mid via-point (precision 10) is tracked closely; the final target is
    # undershot by the reference's aim-at-next feedforward — a reference
    # behavior we reproduce exactly, not a solver bug.
    assert abs(traj[N // 2, 0] - (-0.5)) < 0.05
    np.testing.assert_allclose(traj[-1], [0.80661025, 0.175128], atol=1e-6)


def test_unsolved_errors():
    Qs, mu = _setup()
    lqt = LQT(A, B, Qs, mu, RFACTOR, 1)
    with pytest.raises(RuntimeError):
        lqt.get_command(0)
    with pytest.raises(RuntimeError):
        lqt.get_command(0, np.zeros(NX))
    with pytest.raises(RuntimeError):
        lqt.get_predicted_states()
