"""Pure-XLA small-matrix linear algebra (no LAPACK custom calls).

The solver scans invert tiny (<=16 dim) matrices every timestep
(ILQRRecursive.cpp:89-91, lqt.cpp:41-44). `jnp.linalg.inv/solve` lower to
LAPACK custom calls on the CPU backend, and this environment's jaxlib build
corrupts the heap on some float64 getrf/getri programs compiled inside
`lax.scan` (reproducible upstream bug, values/shape dependent; see also the
optimization-level workaround in tests/conftest.py). These Gauss-Jordan
routines compile to plain XLA
ops on every backend: deterministic, batch-broadcastable, and for matrices
this small just as fast as the generic lowering.
"""

import jax
import jax.numpy as jnp

__all__ = ["solve_ge", "inv_ge", "solve_spd", "inv_spd"]


def _solve_ge_single(A, B):
    """Gauss-Jordan with partial pivoting: A [n,n], B [n,m] -> A^{-1} B."""
    n = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)  # [n, n+m]
    rows = jnp.arange(n)

    def body(i, M):
        col = jnp.abs(M[:, i])
        col = jnp.where(rows < i, -jnp.inf, col)  # only rows >= i pivot
        p = jnp.argmax(col)
        # swap rows i and p
        row_i, row_p = M[i], M[p]
        M = M.at[i].set(row_p).at[p].set(row_i)
        # normalize pivot row, eliminate everywhere else
        piv_row = M[i] / M[i, i]
        M = M.at[i].set(piv_row)
        factors = jnp.where(rows == i, 0.0, M[:, i])
        return M - factors[:, None] * piv_row[None, :]

    M = jax.lax.fori_loop(0, n, body, M)
    return M[:, n:]


def solve_ge(A, B):
    """A^{-1} B with matching leading batch dims on A [..., n, n] and
    B [..., n, m]; B may also be a vector [..., n]."""
    vec = B.ndim == A.ndim - 1
    if vec:
        B = B[..., None]
    fn = _solve_ge_single
    for _ in range(A.ndim - 2):
        fn = jax.vmap(fn)
    X = fn(A, jnp.broadcast_to(B, A.shape[:-2] + B.shape[-2:]))
    return X[..., 0] if vec else X


def inv_ge(A):
    """Matrix inverse via solve_ge against the identity."""
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    return solve_ge(A, jnp.broadcast_to(I, A.shape))


def solve_spd(A, B):
    """A^{-1} B for (near-)symmetric-positive-definite A, no pivoting.

    The hot solver inverses are all SPD-plus-ridge (Quu + 1e-6 I,
    B^T P B + R), where Gauss-Jordan without pivoting is stable. Dropping
    the pivot search makes every row index STATIC, so the elimination
    unrolls into plain slices — under vmap this stays fully vectorized
    (the pivoted version's per-lane row swaps lower to gathers/scatters,
    ~10x slower on TPU for the 7-15 dim matrices here).

    Batch dims broadcast like solve_ge; B may be a vector [..., n].
    """
    vec = B.ndim == A.ndim - 1
    if vec:
        B = B[..., None]
    n = A.shape[-1]
    B = jnp.broadcast_to(B, A.shape[:-2] + B.shape[-2:])
    M = jnp.concatenate([A, B], axis=-1)  # [..., n, n+m]
    for i in range(n):  # n is static: unrolled, all indices static
        piv_row = M[..., i, :] / M[..., i, i:i + 1]
        col = M[..., :, i]
        factors = col.at[..., i].set(0.0)
        M = M - factors[..., None] * piv_row[..., None, :]
        M = M.at[..., i, :].set(piv_row)
    return M[..., :, n:][..., 0] if vec else M[..., :, n:]


def inv_spd(A):
    """Inverse of (near-)SPD A via solve_spd against the identity."""
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    return solve_spd(A, jnp.broadcast_to(I, A.shape))
