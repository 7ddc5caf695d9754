"""Parallel-prefix LQR (ops.pscan) vs the sequential recursions.

The associative-scan formulation must reproduce the sequential backward
passes: same cost-to-go quadratics on random time-varying systems, same
iLQR trajectories on the golden Panda workload, and command-for-command
LQT equality.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_planner_tpu.ops.pscan import affine_suffix, lqr_cost_to_go
from ilqr_planner_tpu.solvers import ilqr
from ilqr_planner_tpu.solvers.lqt import LQT, riccati, riccati_parallel
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint, SpacetimeKeypoint
from ilqr_planner_tpu.systems.spec import make_spec

T1_POS = [0.554121212377707, -0.01575049935289518, 0.38295604872511507]
T1_ORN = [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
          0.022333898196169735]
T2_POS = [0.254121212377707, -0.07575049935289518, 0.13170744424127526]
T2_ORN = [0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
          0.00011933313484481926]
QD6 = [1, 1, 1, .1, .1, .1]


def _sequential_value_recursion(As, Bs, l_x, l_u, l_xx, lN_x, lN_xx, R):
    """Unregularized reference recursion (ILQRRecursive.cpp:82-94)."""
    nx = As.shape[-1]
    P, p = lN_xx, lN_x
    Ps, ps = [P], [p]
    for k in reversed(range(As.shape[0])):
        A, B = As[k], Bs[k]
        Quu = R + B.T @ P @ B
        Qux = B.T @ P @ A
        Qu = l_u[k] + B.T @ p
        Qx = l_x[k] + A.T @ p
        Qxx = l_xx[k] + A.T @ P @ A
        Kd = jnp.linalg.solve(Quu, jnp.concatenate([Qux, Qu[:, None]], axis=1))
        K, d = -Kd[:, :nx], -Kd[:, nx]
        P = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        p = Qx + K.T @ (Quu @ d) + K.T @ Qu + Qux.T @ d
        Ps.insert(0, P)
        ps.insert(0, p)
    return jnp.stack(Ps), jnp.stack(ps)


def test_cost_to_go_matches_sequential_random_ltv():
    rng = np.random.default_rng(0)
    H, nx, nu = 23, 5, 3
    As = jnp.asarray(rng.normal(size=(H - 1, nx, nx)) * 0.3 + np.eye(nx))
    Bs = jnp.asarray(rng.normal(size=(H - 1, nx, nu)) * 0.2)
    l_x = jnp.asarray(rng.normal(size=(H - 1, nx)))
    l_u = jnp.asarray(rng.normal(size=(H - 1, nu)))
    M = rng.normal(size=(H - 1, nx, nx))
    l_xx = jnp.asarray(M @ M.transpose(0, 2, 1) + 0.1 * np.eye(nx))
    lN_x = jnp.asarray(rng.normal(size=nx))
    Mn = rng.normal(size=(nx, nx))
    lN_xx = jnp.asarray(Mn @ Mn.T + 0.1 * np.eye(nx))
    Rt = jnp.asarray(np.full(nu, 1e-3))

    Ps, ps = lqr_cost_to_go(As, Bs, l_x, l_u, l_xx, lN_x, lN_xx, Rt)
    Ps_seq, ps_seq = _sequential_value_recursion(
        As, Bs, l_x, l_u, l_xx, lN_x, lN_xx, jnp.diag(Rt))
    np.testing.assert_allclose(Ps, Ps_seq, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(ps, ps_seq, rtol=1e-8, atol=1e-8)


def test_affine_suffix_matches_loop():
    rng = np.random.default_rng(1)
    T, n = 13, 4
    Ms = jnp.asarray(rng.normal(size=(T, n, n)) * 0.5)
    vs = jnp.asarray(rng.normal(size=(T, n)))
    ds = affine_suffix(Ms, vs)
    want = [jnp.zeros(n)]
    for k in reversed(range(T)):
        want.insert(0, Ms[k] @ want[0] + vs[k])
    np.testing.assert_allclose(ds, jnp.stack(want), rtol=1e-10, atol=1e-12)


@pytest.fixture(scope="module")
def panda_robot(panda_chain):
    from ilqr_planner_tpu.models import Robot

    return Robot.from_chain(panda_chain)


def test_ilqr_pscan_matches_scan_golden_workload(panda_robot, panda_q0):
    kps = [
        PosOrnKeypoint(T1_POS, T1_ORN, np.diag(QD6), 49),
        PosOrnKeypoint(T2_POS, T2_ORN, np.diag(QD6), 99),
    ]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn", panda_robot, kps, np.ones(7) * 1e-5, 100, 1,
                     dt=0.1, q0=panda_q0, q_max=qmax, q_min=-qmax)
    U0 = jnp.zeros((99, 7))
    res_scan = ilqr.solve(spec, U0, 10, backward="scan")
    res_pscan = ilqr.solve(spec, U0, 10, backward="pscan")
    # Both converge to the same optimum; trajectories agree to sub-mm. Exact
    # equality is impossible: the sequential pass propagates the
    # 1e-6-regularized gains through its value recursion while pscan uses
    # the exact Riccati quadratics, and the line search amplifies that
    # difference across iterations.
    assert float(res_pscan.cost) < 1e-5
    np.testing.assert_allclose(res_pscan.cost, res_scan.cost, rtol=1e-4)
    np.testing.assert_allclose(res_pscan.X, res_scan.X, atol=2e-3)
    np.testing.assert_allclose(res_pscan.U, res_scan.U, atol=2e-3)

    # Single backward pass on identical inputs: the scan path propagates the
    # 1e-6-regularized gains through its value recursion, which at this
    # workload's control-penalty scale (R = 1e-5, so Quu ~ 1e-5 and the
    # 1e-6 ridge is a ~10% perturbation) shifts gains at the 1e-2 level;
    # the exact-math equivalence is covered by the random-LTV test above
    # where R dominates the ridge.
    from ilqr_planner_tpu.solvers.ilqr import _backward, rollout

    X, fX, U, As, Bs, Js, _, _ = rollout(
        spec, jnp.asarray(0.0), jnp.zeros((99, 7, 7)), jnp.zeros((99, 7)),
        jnp.zeros((100, 7)), res_scan.U)
    Ks_s, ds_s = _backward(spec, X, fX, U, As, Bs, Js, pscan=False)
    Ks_p, ds_p = _backward(spec, X, fX, U, As, Bs, Js, pscan=True)
    np.testing.assert_allclose(Ks_p, Ks_s, atol=2e-2)
    np.testing.assert_allclose(ds_p, ds_s, atol=2e-2)


def test_ilqr_pscan_time_optimal_per_step_B(panda_robot):
    """Time-optimal kind exercises per-step (non-constant) B matrices."""
    H = 100
    kps = [
        SpacetimeKeypoint(T1_POS, T1_ORN, np.diag(QD6 + [0]), H // 2 - 1, 2.0),
        SpacetimeKeypoint(T2_POS, T2_ORN, np.diag(QD6 + [0.1]), H - 1, 5.0),
    ]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn_time", panda_robot, kps, np.ones(8) * 1e-5, H, 1,
                     q0=np.zeros(7), q_max=qmax, q_min=-qmax)
    U0 = jnp.tile(jnp.asarray([0.0] * 7 + [0.01]), (H - 1, 1))
    res_scan = ilqr.solve(spec, U0, 20, backward="scan")
    res_pscan = ilqr.solve(spec, U0, 20, backward="pscan")
    # Both converge; the regularized-vs-exact value recursion difference
    # compounds through 20 nonlinear iterations to ~0.1% here.
    assert float(res_pscan.cost) < 1e-4
    np.testing.assert_allclose(res_pscan.cost, res_scan.cost, rtol=5e-3)
    # atol covers the accumulated continuous-time state (~5.0 s), whose
    # trajectories differ at the 0.25% level between the two backends.
    np.testing.assert_allclose(res_pscan.X, res_scan.X, atol=2e-2)


def test_lqt_parallel_matches_sequential():
    rng = np.random.default_rng(3)
    nx, nu, N = 4, 2, 37
    A = jnp.asarray(np.eye(nx) + 0.05 * rng.normal(size=(nx, nx)))
    B = jnp.asarray(0.1 * rng.normal(size=(nx, nu)))
    Qs = []
    for k in range(N):
        M = rng.normal(size=(nx, nx)) * (1.0 if k % 9 == 0 else 0.0)
        Qs.append(M @ M.T + (0.5 if k % 9 == 0 else 0.0) * np.eye(nx))
    Qs = jnp.asarray(np.stack(Qs))
    mu = jnp.asarray(rng.normal(size=N * nx))
    Rt = jnp.eye(nu) * 1e-3

    Ps_s, ds_s = riccati(A, B, Qs, Rt, mu)
    Ps_p, ds_p = riccati_parallel(A, B, Qs, Rt, mu)
    np.testing.assert_allclose(Ps_p, Ps_s, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(ds_p, ds_s, rtol=1e-8, atol=1e-10)

    # command-for-command equality through the public API
    lqt_s = LQT(A, B, Qs, mu, 1e-3)
    lqt_p = LQT(A, B, Qs, mu, 1e-3)
    lqt_s.solve_dp()
    lqt_p.solve_dp(parallel=True)
    x = jnp.asarray(rng.normal(size=nx))
    for t in (0, 7, N - 2):
        np.testing.assert_allclose(lqt_p.get_command(t, x),
                                   lqt_s.get_command(t, x),
                                   rtol=1e-8, atol=1e-10)
