"""Standalone linear-quadratic tracker for fixed (A, B) and per-step Q.

Reference: lqt.cpp:16-128. Two solution paths:
  * solve_dp — Riccati backward recursion (lqt.cpp:29-53) with per-step
    closed-loop commands u = K_t (mu_t - x) + f_t computed on demand
    (lqt.cpp:102-120, including the reference's timestep+1 / reversed
    indexing semantics);
  * solve_linalg — dense batch least squares u = (Su^T Q Su + R)^-1 Su^T Q
    (mu - Sx mu_0) with Sx/Su built by powers of A (lqt.cpp:55-89).

Functional core (pure jitted functions) + a thin `LQT` class mirroring the
reference API for drop-in use.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ilqr_planner_tpu.ops import pscan as pscan_ops
from ilqr_planner_tpu.ops.linalg import solve_spd

__all__ = ["LQT", "riccati", "riccati_parallel", "batch_solution"]


@partial(jax.jit)
def riccati(A, B, Qs, Rt, mu):
    """Backward Riccati recursion (lqt.cpp:29-53).

    A [nx,nx], B [nx,nu], Qs [N,nx,nx], Rt [nu,nu], mu [N*nx].
    Returns (Ps [N,nx,nx], ds [N,nx]) in forward time order: Ps[t] is the
    value Hessian at step t (the reference stores them reversed and indexes
    back, lqt.cpp:105).
    """
    with jax.default_matmul_precision("float32"):
        nx = A.shape[0]
        N = Qs.shape[0]
        mu_t = mu.reshape(N, nx)

        def bstep(carry, inp):
            P, d = carry
            Qt, mu_i, mu_ip1 = inp
            BtPB = B.T @ P @ B + Rt
            G = solve_spd(BtPB, B.T @ P)  # (B'PB+R)^-1 B'P
            Pn = Qt - A.T @ (P @ B @ G - P) @ A
            dn = (A.T - A.T @ P @ B @ solve_spd(BtPB, B.T)) @ (
                P @ (A @ mu_i - mu_ip1) + d
            )
            return (Pn, dn), (Pn, dn)

        P_T = Qs[-1]
        d_T = jnp.zeros(nx, dtype=A.dtype)
        (_, _), (Ps, ds) = jax.lax.scan(
            bstep, (P_T, d_T), (Qs[:-1], mu_t[:-1], mu_t[1:]), reverse=True
        )
        Ps = jnp.concatenate([Ps, P_T[None]], axis=0)
        ds = jnp.concatenate([ds, d_T[None]], axis=0)
        return Ps, ds


@partial(jax.jit)
def riccati_parallel(A, B, Qs, Rt, mu):
    """riccati() via parallel-prefix scans: O(log N) depth instead of N
    sequential steps (same inputs/outputs; see ops.pscan).

    The value Hessians P_t come from the associative cost-to-go scan (no
    linear stage cost, eta = 0); the reference's feedforward d-vector
    recursion d_t = E_t (P_{t+1}(A mu_t - mu_{t+1}) + d_{t+1}) with
    E_t = A^T (I - P_{t+1} B (B^T P_{t+1} B + R)^{-1} B^T) is affine in d,
    so it parallelizes with a second associative scan over (matrix, offset)
    pairs (ops.pscan.affine_suffix).
    """
    with jax.default_matmul_precision("float32"):
        nx = A.shape[0]
        nu = B.shape[1]
        N = Qs.shape[0]
        dtype = A.dtype
        mu_t = mu.reshape(N, nx)

        # P_t via the conditional-value-function scan: stage cost Q_t at
        # x_t, control cost R, no linear terms.
        As = jnp.broadcast_to(A, (N - 1, nx, nx))
        Bs = jnp.broadcast_to(B, (N - 1, nx, nu))
        zx = jnp.zeros((N - 1, nx), dtype)
        zu = jnp.zeros((N - 1, nu), dtype)
        Rt_diag = jnp.diagonal(Rt)
        Ps, _ = pscan_ops.lqr_cost_to_go(As, Bs, zx, zu, Qs[:-1],
                                         jnp.zeros(nx, dtype), Qs[-1], Rt_diag)

        def dstep(P1, mu_i, mu_ip1):
            BtPB = B.T @ P1 @ B + Rt
            E = A.T - A.T @ P1 @ B @ solve_spd(BtPB, B.T)
            return E, (E @ (P1 @ (A @ mu_i - mu_ip1)))

        Es, vs = jax.vmap(dstep)(Ps[1:], mu_t[:-1], mu_t[1:])
        ds = pscan_ops.affine_suffix(Es, vs)
        return Ps, ds


@partial(jax.jit)
def batch_solution(A, B, Qs, Rt_scalar, mu, nb_deriv: int = 1):
    """Dense batch solve (lqt.cpp:55-89). Returns (u [(N-1)*nu], Sx, Su, Q)."""
    with jax.default_matmul_precision("float32"):
        nx, nu = B.shape
        N = Qs.shape[0]
        W = (N - 1) * nu

        def step(carry, i):
            M, Sx_row = carry
            Sx_next = Sx_row @ A
            M_next = A @ M
            M_next = jax.lax.dynamic_update_slice(M_next, B, (0, i * nu))
            return (M_next, Sx_next), (M, Sx_next)

        # M starts as B in block-column 0 (lqt.cpp:62: M = B), captured
        # before each update like the reference (capture at row i uses M
        # built by iteration i-1).
        M0 = jnp.zeros((nx, W), dtype=A.dtype)
        M0 = jax.lax.dynamic_update_slice(M0, B, (0, 0))
        (_, _), (Su_rows, Sx_rows) = jax.lax.scan(
            step, (M0, jnp.eye(nx, dtype=A.dtype)), jnp.arange(1, N)
        )
        Sx = jnp.concatenate([jnp.eye(nx, dtype=A.dtype)[None], Sx_rows], axis=0)
        Su = jnp.concatenate([jnp.zeros((1, nx, W), dtype=A.dtype), Su_rows], axis=0)
        Sx = Sx.reshape(N * nx, nx)
        Su = Su.reshape(N * nx, W)

        Q = jax.scipy.linalg.block_diag(*[Qs[i] for i in range(N)])
        R = jnp.eye(W, dtype=A.dtype) * (Rt_scalar**nb_deriv)
        rhs = Su.T @ Q @ (mu - Sx @ mu[:nx])
        u = jnp.linalg.solve(Su.T @ Q @ Su + R, rhs)
        return u, Sx, Su, Q


class LQT:
    """API-compatible tracker (lqt.h:23-86).

    LQT(A, B, Qs, states, rfactor, nb_deriv) then either solve_dp() +
    get_command(timestep, curr_state), or solve_linalg() + get_command(
    timestep) / get_predicted_states().
    """

    def __init__(self, A, B, Qs, states, rfactor: float, nb_deriv: int = 1):
        self.A = jnp.asarray(A)
        self.B = jnp.asarray(B)
        self.Qs = jnp.asarray(Qs)
        self.mu = jnp.asarray(states)
        self.rfactor = float(rfactor)
        self.nb_deriv = int(nb_deriv)
        self.nb_state_var = self.A.shape[1]
        self.nb_ctrl_var = self.B.shape[1]
        self.nb_states = self.mu.shape[0] // self.nb_state_var
        self.Rt = jnp.eye(self.nb_ctrl_var, dtype=self.A.dtype) * (
            self.rfactor**self.nb_deriv
        )
        self._Ps = None
        self._ds = None
        self._u = None
        self._Sx = None
        self._Su = None

    # -- dynamic programming path ------------------------------------------
    def solve_dp(self, parallel: bool = False):
        """Riccati solve; parallel=True uses the O(log N)-depth
        associative-scan path (riccati_parallel), same results."""
        fn = riccati_parallel if parallel else riccati
        self._Ps, self._ds = fn(self.A, self.B, self.Qs, self.Rt, self.mu)

    def get_command(self, timestep: int, curr_state=None):
        nx = self.nb_state_var
        if curr_state is None:
            if self._u is None:
                raise RuntimeError("solve_linalg() first")
            nu = self.nb_ctrl_var
            return self._u[timestep * nu : (timestep + 1) * nu]
        if self._Ps is None:
            raise RuntimeError("solve_dp() first")
        # The reference aims at state t+1 (lqt.cpp:102-117).
        t = timestep + 1
        Pt = self._Ps[t]
        dt = self._ds[t]
        mu_t = self.mu[t * nx : (t + 1) * nx]
        BtPB = self.B.T @ Pt @ self.B + self.Rt
        Kt = solve_spd(BtPB, self.B.T @ Pt @ self.A)
        ft = -solve_spd(BtPB, self.B.T @ (Pt @ (self.A @ mu_t - mu_t) + dt))
        return Kt @ (mu_t - jnp.asarray(curr_state)) + ft

    # -- batch path --------------------------------------------------------
    def solve_linalg(self):
        self._u, self._Sx, self._Su, _ = batch_solution(
            self.A, self.B, self.Qs, self.rfactor, self.mu, self.nb_deriv
        )

    def get_predicted_states(self):
        if self._u is None:
            raise RuntimeError("solve_linalg() first")
        return self._Su @ self._u + self._Sx @ self.mu[: self.nb_state_var]
