"""Parallel-prefix (associative-scan) LQR machinery.

The reference computes the LQR backward pass as a strictly sequential H-step
recursion (ILQRRecursive.cpp:73-97; lqt.cpp:29-53). On TPU a `lax.scan`
compiles that to H dependent steps, so wall-clock grows linearly in the
horizon even though each step is tiny. This module provides the
temporal-parallelization alternative: the Bellman recursion expressed as an
associative combination of per-step "conditional value function" elements,
evaluated with `lax.associative_scan` in O(log H) dependent steps — the
time-axis analogue of context parallelism (SURVEY §2/§5: horizon
parallelism via parallel-prefix).

Formulation (temporal parallelization of LQT/dynamic programming): the
minimal cost to travel from state x at step i to state z at step j is
parameterized as

    V_{i->j}(x, z) = 1/2 x^T J x - eta^T x
                     + 1/2 (z - A x - b)^T C^+ (z - A x - b)

with element e = (A, b, C, eta, J). Eliminating the intermediate state
couples two adjacent elements associatively (`combine_cvf`); a reverse
associative scan over [e_0, ..., e_{H-2}, e_terminal] yields every
cost-to-go V_k(x) = 1/2 x^T J_k x - eta_k^T x at once. C is only ever used
through solves of (I + C J), so singular C (e.g. the terminal element's
zeros) is fine.

A one-step element for dynamics x' = A_k x + B_k u and stage cost
1/2 u^T R u + l_u^T u + 1/2 x^T l_xx x + l_x^T x is

    A = A_k,  b = -B_k R^{-1} l_u,  C = B_k R^{-1} B_k^T,
    eta = -l_x,  J = l_xx

(complete the square in u; the l_u term shifts the reachable mean). The
terminal element is (0, 0, 0, -lN_x, lN_xx). Then P_k = J_k, p_k = -eta_k
match the classic value recursion P_k = Qxx - Qxu Quu^{-1} Qux evaluated
without regularization.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ilqr_planner_tpu.ops.linalg import solve_ge

__all__ = ["combine_cvf", "lqr_cost_to_go", "affine_suffix"]


def combine_cvf(e1, e2):
    """Associative combination of conditional-value-function elements.

    e1 spans the EARLIER interval (i->j), e2 the later (j->l); both are
    tuples (A, b, C, eta, J) with arbitrary matching batch dims (the
    associative_scan axis leads).
    """
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    nx = A1.shape[-1]
    I = jnp.eye(nx, dtype=A1.dtype)
    # (I + C1 J2)^{-1}, shared by the A/b/C updates; its transpose-inverse
    # (I + J2 C1)^{-1} drives eta/J (C, J symmetric).
    M = solve_ge(I + C1 @ J2, jnp.broadcast_to(I, C1.shape))
    Nt = solve_ge(I + J2 @ C1, jnp.broadcast_to(I, C1.shape))
    A2M = A2 @ M
    A = A2M @ A1
    b = (A2M @ (b1[..., None] + C1 @ eta2[..., None]))[..., 0] + b2
    C = A2M @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
    NtJ2 = Nt @ J2
    eta = (jnp.swapaxes(A1, -1, -2) @ (
        Nt @ eta2[..., None] - NtJ2 @ b1[..., None]))[..., 0] + eta1
    J = jnp.swapaxes(A1, -1, -2) @ NtJ2 @ A1 + J1
    return (A, b, C, eta, J)


@partial(jax.jit)
def lqr_cost_to_go(As, Bs, l_x, l_u, l_xx, lN_x, lN_xx, Rt_diag):
    """All cost-to-go quadratics (P_k, p_k), k = 0..H-1, in O(log H) depth.

    As [H-1,nx,nx], Bs [H-1,nx,nu] (pass broadcast copies for LTI), stage
    gradients/Hessians l_x [H-1,nx], l_u [H-1,nu], l_xx [H-1,nx,nx], final
    lN_x [nx], lN_xx [nx,nx], control penalty diagonal Rt_diag [nu].

    Returns (Ps [H,nx,nx], ps [H,nx]) matching the unregularized sequential
    value recursion (ILQRRecursive.cpp:82-94 with the 1e-6 gain
    regularization removed); use them to form gains exactly as the
    sequential code does.
    """
    dtype = As.dtype
    nx = As.shape[-1]
    Rinv = (1.0 / Rt_diag).astype(dtype)  # diagonal R
    B_Rinv = Bs * Rinv[None, None, :]
    C = B_Rinv @ jnp.swapaxes(Bs, -1, -2)
    b = -(B_Rinv @ l_u[..., None])[..., 0]
    eta = -l_x
    # terminal element appended; A/b/C zero so suffixes end cleanly.
    A_e = jnp.concatenate([As, jnp.zeros((1, nx, nx), dtype)], axis=0)
    b_e = jnp.concatenate([b, jnp.zeros((1, nx), dtype)], axis=0)
    C_e = jnp.concatenate([C, jnp.zeros((1, nx, nx), dtype)], axis=0)
    eta_e = jnp.concatenate([eta, -lN_x[None]], axis=0)
    J_e = jnp.concatenate([l_xx, lN_xx[None]], axis=0)

    elems = (A_e, b_e, C_e, eta_e, J_e)
    # reverse=True folds in reversed index order (flip-scan-flip), so swap
    # the operands to keep combine_cvf's earlier-interval-first convention.
    _, _, _, etas, Js = jax.lax.associative_scan(
        lambda a, b: combine_cvf(b, a), elems, reverse=True
    )
    return Js, -etas


@partial(jax.jit)
def affine_suffix(Ms, vs):
    """Suffix compositions of affine maps d_k = M_k d_{k+1} + v_k.

    Ms [T,n,n], vs [T,n] (index k uses the map into step k). Returns
    ds [T+1,n] with ds[T] = 0 and ds[k] = M_k ds[k+1] + v_k, computed by
    an associative scan over (M, v) pairs in O(log T) depth.
    """
    n = Ms.shape[-1]
    dtype = Ms.dtype

    def comb(e2, e1):
        # e1 earlier: d_i = M1 d_j + v1 with d_j = M2 d_l + v2. Operands
        # arrive later-first because reverse=True folds in reversed index
        # order (see lqr_cost_to_go).
        M1, v1 = e1
        M2, v2 = e2
        return (M1 @ M2, (M1 @ v2[..., None])[..., 0] + v1)

    Ms_e = jnp.concatenate([Ms, jnp.zeros((1, n, n), dtype)], axis=0)
    vs_e = jnp.concatenate([vs, jnp.zeros((1, n), dtype)], axis=0)
    _, ds = jax.lax.associative_scan(comb, (Ms_e, vs_e), reverse=True)
    return ds
