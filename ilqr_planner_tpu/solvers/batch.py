"""Batch (least-squares) iLQR, plain and control-primitive-projected.

Reference: BatchILQR.cpp:22-173 and BatchILQRCP.cpp:21-176. The solver works
on keypoint rows only: the transfer matrix Su, residual Jacobian J, and
limit blocks L are assembled sparsely over keypoint timesteps and a dense
Gauss-Newton step is taken in the full control vector (or in the
control-primitive weight space u = Psi w).

On TPU the reference's O(H^2) growing-matrix loop (BatchILQR.cpp:89-94)
becomes a `lax.scan` over a fixed-width padded transfer matrix — one
[nx, (H-1) nu] matmul per step — and the normal equations are batched dense
matmuls + one linear solve.

Reproduced reference quirks (bit-for-bit iteration parity):
  * The transfer recursion is seeded with the *zero* B-block of the
    placeholder tuple ABJLs[0] (System.cpp:195-199), and the keypoint row for
    timestep t captures the transfer matrix *before* the update at t
    (BatchILQR.cpp:74-95). The resulting Su block at keypoint t is the
    sensitivity of x_{t-1} applied to controls shifted by one — exact for
    LTI dynamics (A, B constant: A^{t-1-j} B is recovered), approximate for
    the time-varying time-optimal B. The textbook construction lives in
    LQT::buildSystemMatrices (lqt.cpp:55-74); this one is kept as-is so the
    solvers match the reference iterate-for-iterate.
  * Joint-limit blocks lag one step: fpBatch stores inspectJointLimit(x_i)
    at slot i+1 (System.cpp:201-208 via forwardPassWithLimits, which
    evaluates limits at the pre-step state, System.cpp:144-161).
  * cost0 uses the L from the Gauss-Newton assembly while line-search trials
    rebuild L from their own rollouts (BatchILQR.cpp:130-149).
  * The line-search floor accepts the trial unconditionally at alpha < 1e-3
    (BatchILQR.cpp:151-154).
"""

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from ilqr_planner_tpu.systems import funcs
from ilqr_planner_tpu.systems.spec import Spec

__all__ = ["BatchResult", "solve", "solve_cp", "sparse_Q", "sparse_mu"]


@struct.dataclass
class BatchResult:
    u: jnp.ndarray        # [(H-1) * nu] flattened optimal controls
    cost: jnp.ndarray     # last evaluated cost0
    iterations: jnp.ndarray


def _sub_kp_mask(spec: Spec, k):
    if spec.kind == "sequential":
        return [s.kp_mask[k] for s in spec.subs]
    return [spec.kp_mask[k]]


def sparse_mu(spec: Spec, kp_idx: Sequence[int]):
    """Stacked keypoint targets over keypoint rows (getMuVector(true),
    System.cpp:321-327; SequentialSystem.cpp:203-226 interleaves subsystem
    blocks with zeros where a subsystem has no keypoint)."""
    rows = []
    for k in kp_idx:
        if spec.kind == "sequential":
            rows.append(jnp.concatenate([s.mu[k] * s.kp_mask[k] for s in spec.subs]))
        else:
            rows.append(spec.mu[k])
    return jnp.concatenate(rows)


def sparse_Q(spec: Spec, kp_idx: Sequence[int]):
    """Block-diagonal keypoint precisions over keypoint rows
    (getQMatrix(true), System.cpp:341-349; SequentialSystem.cpp:250-271)."""
    n = spec.nq_var
    m = len(kp_idx)
    Q = jnp.zeros((m * n, m * n), dtype=spec.Rt.dtype)
    for i, k in enumerate(kp_idx):
        Q = Q.at[i * n : (i + 1) * n, i * n : (i + 1) * n].set(funcs.prec_at(spec, k))
    return Q


def _open_loop_rollout(spec: Spec, U):
    """fpBatch (System.cpp:181-211): open-loop rollout from x0 emitting
    fX [H, nt], X [H, nx], per-step (A, B) [H-1, ...], J [H, nQ, nx], and the
    one-step-lagged limit arrays qL [H, nx], Ldiag [H, nx] (slot i+1 holds
    inspectJointLimit(x_i); slot 0 is zero)."""
    x0 = spec.x0
    fx0, J0 = funcs.fx_jac(spec, x0)
    dtype = x0.dtype

    def limits(x):
        if spec.kind == "sequential":
            # fpBatch drives the top-level system, whose limits_set is false
            # (SequentialSystem.cpp:17) -> zero blocks.
            return jnp.zeros(spec.nx, dtype), jnp.zeros(spec.nx, dtype)
        if not spec.limits_set:
            return jnp.zeros(spec.nx, dtype), jnp.zeros(spec.nx, dtype)
        return funcs.limit_terms(spec, x)

    def step(x, u):
        Ld, ql = limits(x)  # evaluated at the PRE-step state (System.cpp:158)
        x1, A, B = funcs.dynamics(spec, x, u)
        fx1, J1 = funcs.fx_jac(spec, x1)
        return x1, (x1, fx1, A, B, J1, Ld, ql)

    xH, (Xs, fXs, As, Bs, Js, Lds, qls) = jax.lax.scan(step, x0, U)
    X = jnp.concatenate([x0[None], Xs], axis=0)
    fX = jnp.concatenate([fx0[None], fXs], axis=0)
    Jfull = jnp.concatenate([J0[None], Js], axis=0)
    zrow = jnp.zeros((1, spec.nx), dtype)
    Ldiag = jnp.concatenate([zrow, Lds], axis=0)  # slot i+1 = L(x_i)
    qL = jnp.concatenate([zrow, qls], axis=0)
    return X, fX, As, Bs, Jfull, Ldiag, qL


def _build_su(spec: Spec, As, Bs, kp_idx):
    """Su over keypoint rows with the reference's zero-seeded, pre-update
    capture (see module docstring). Returns [n_kp * nx, (H-1) * nu]."""
    H, nx, nu = spec.horizon, spec.nx, spec.nu
    W = (H - 1) * nu
    n_kp = len(kp_idx)
    kp_arr = jnp.asarray(list(kp_idx))

    def step(carry, inp):
        M, Su = carry
        i, A, B = inp  # (A, B) = transition (i-1) -> i, i.e. ABJLs[i]
        # capture BEFORE update, only at keypoint timesteps (i > 0)
        hit = (kp_arr == i) & (i > 0)
        Su = jnp.where(hit[:, None, None], M[None], Su)
        M = A @ M
        M = jax.lax.dynamic_update_slice(M, B, (0, i * nu))
        return (M, Su), None

    M0 = jnp.zeros((nx, W), dtype=As.dtype)
    Su0 = jnp.zeros((n_kp, nx, W), dtype=As.dtype)
    # idx pairs i in [1, H-1] with ABJLs[i] = (As[i-1], Bs[i-1]); each step
    # captures before updating, so a keypoint at i reads the matrix produced
    # by the update at i-1, exactly like the reference loop.
    idx = jnp.arange(1, H)
    (_, Su), _ = jax.lax.scan(step, (M0, Su0), (idx, As, Bs))
    return Su.reshape(n_kp * nx, W)


def _gather_blocks(arr, kp_idx):
    return jnp.concatenate([arr[k] for k in kp_idx], axis=0)


def _block_diag(mats):
    rows = sum(m.shape[0] for m in mats)
    cols = sum(m.shape[1] for m in mats)
    out = jnp.zeros((rows, cols), dtype=mats[0].dtype)
    r = c = 0
    for m in mats:
        out = out.at[r : r + m.shape[0], c : c + m.shape[1]].set(m)
        r += m.shape[0]
        c += m.shape[1]
    return out


def _diff_batch(spec: Spec, fX_kp, kp_idx):
    """diffBatch (System.cpp:111-119): residuals at keypoint rows."""
    es = [funcs.residual(spec, fX_kp[i], k) for i, k in enumerate(kp_idx)]
    return jnp.concatenate(es)


@partial(jax.jit, static_argnames=("kp_idx", "nb_iter", "early_stop",
                                   "with_callback", "use_psi"))
def _solve_impl(spec: Spec, Q, psi, u0, kp_idx, nb_iter, early_stop,
                with_callback, use_psi):
    with jax.default_matmul_precision("float32"):
        return _solve_body(spec, Q, psi, u0, kp_idx, nb_iter, early_stop,
                           with_callback, use_psi)


def _solve_body(spec, Q, psi, u0, kp_idx, nb_iter, early_stop, with_callback,
                use_psi):
    H, nx, nu = spec.horizon, spec.nx, spec.nu
    dtype = u0.dtype
    n_kp = len(kp_idx)
    Rdiag = jnp.tile(spec.Rt.astype(dtype), H - 1)  # R replicated (BatchILQR.cpp:24)

    def evaluate(u):
        U = u.reshape(H - 1, nu)
        X, fX, As, Bs, Js, Ldiag, qL = _open_loop_rollout(spec, U)
        fX_kp = jnp.stack([fX[k] for k in kp_idx])
        x_kp = jnp.stack([X[k] for k in kp_idx])
        ql = jnp.concatenate([qL[k] for k in kp_idx])
        Lblk = jnp.concatenate([Ldiag[k] for k in kp_idx])  # diag of big L
        e = _diff_batch(spec, fX_kp, kp_idx)
        return X, fX, As, Bs, Js, e, ql, Lblk, fX_kp, x_kp

    def trial_cost(u, e, ql, Lblk):
        return e @ (Q @ e) + jnp.sum(Rdiag * u * u) + jnp.sum(ql * Lblk * ql)

    def iter_body(carry):
        u, it, done, cost_log, alpha_log = carry
        X, fX, As, Bs, Js, e, ql, Lblk, _, _ = evaluate(u)
        Su = _build_su(spec, As, Bs, kp_idx)
        Jblk = _block_diag([Js[k] for k in kp_idx])  # [n_kp*nQ, n_kp*nx]
        L = jnp.diag(Lblk)

        JQJ = Jblk.T @ Q @ Jblk + L
        lhs = Su.T @ JQJ @ Su
        rhs = Su.T @ (Jblk.T @ (Q @ e) + Lblk * ql) - Rdiag * u
        if use_psi:
            lhs = psi.T @ lhs @ psi + psi.T @ (Rdiag[:, None] * psi)
            rhs = psi.T @ rhs
            dw = jnp.linalg.solve(lhs, rhs)
            du = psi @ dw
        else:
            lhs = lhs + jnp.diag(Rdiag)
            du = jnp.linalg.solve(lhs, rhs)

        cost0 = trial_cost(u, e, ql, Lblk)

        def ls_cond(s):
            accepted, alpha = s[0], s[1]
            return ~accepted

        def ls_body(s):
            _, alpha, _ = s
            utmp = u + alpha * du
            _, _, _, _, _, et, qlt, Lblkt, _, _ = evaluate(utmp)
            cost = trial_cost(utmp, et, qlt, Lblkt)
            ok = (cost < cost0) | (alpha < 1e-3)
            return (ok, jnp.where(ok, alpha, alpha / 2), utmp)

        s0 = (jnp.asarray(False), jnp.asarray(1.0, dtype), u)
        _, alpha, u_new = jax.lax.while_loop(ls_cond, ls_body, s0)

        if with_callback:
            jax.debug.callback(_emit_progress, it + 1, cost0, alpha, ordered=True)

        done = early_stop & (alpha * jnp.sqrt(jnp.sum(du * du)) < 1e-3)
        return (u_new, it + 1, done, cost0, alpha)

    def iter_cond(carry):
        it, done = carry[1], carry[2]
        return (it < nb_iter) & ~done

    carry0 = (u0, jnp.asarray(0, jnp.int32), jnp.asarray(False),
              jnp.asarray(jnp.inf, dtype), jnp.asarray(1.0, dtype))
    u, it, done, cost0, alpha = jax.lax.while_loop(iter_cond, iter_body, carry0)
    return BatchResult(u=u, cost=cost0, iterations=it)


_progress_cb = None


def _emit_progress(it, cost, alpha):
    msg = f"Iteration {int(it)}, Cost: {float(cost):g}, alpha= {float(alpha):g}"
    if _progress_cb is not None:
        _progress_cb.notify(msg)
    else:  # pragma: no cover
        print(msg)


def _prep(spec, kp_idx, Q):
    kp_idx = tuple(int(k) for k in kp_idx)
    if Q is None:
        Q = sparse_Q(spec, kp_idx)
    return kp_idx, jnp.asarray(Q)


def solve(spec: Spec, kp_idx: Sequence[int], nb_iter: int, u0,
          early_stop: bool = True, callback: Optional[object] = None,
          Q=None) -> BatchResult:
    """BatchILQR::solve(nb_iter, u0, early_stop, cb) (BatchILQR.h:31-37).

    kp_idx: keypoint timesteps in sorted order (System::getKpIndexes).
    u0: flattened [(H-1)*nu] initial controls. Q optionally overrides the
    sparse block-diagonal precision (BatchILQR.cpp:22 ctor).
    """
    global _progress_cb
    kp_idx, Q = _prep(spec, kp_idx, Q)
    u0 = jnp.asarray(u0).reshape(-1)
    dummy_psi = jnp.zeros((u0.shape[0], 1), dtype=u0.dtype)
    _progress_cb = callback
    try:
        return _solve_impl(spec, Q, dummy_psi, u0, kp_idx, int(nb_iter),
                           bool(early_stop), callback is not None, False)
    finally:
        _progress_cb = None


def solve_cp(spec: Spec, psi, kp_idx: Sequence[int], nb_iter: int, u0,
             early_stop: bool = True, callback: Optional[object] = None,
             Q=None) -> BatchResult:
    """BatchILQRCP::solve — Gauss-Newton in the primitive weight space
    u = Psi w (BatchILQRCP.cpp:109-174). psi: [(H-1)*nu, K*nu]."""
    global _progress_cb
    kp_idx, Q = _prep(spec, kp_idx, Q)
    u0 = jnp.asarray(u0).reshape(-1)
    psi = jnp.asarray(psi, dtype=u0.dtype)
    _progress_cb = callback
    try:
        return _solve_impl(spec, Q, psi, u0, kp_idx, int(nb_iter),
                           bool(early_stop), callback is not None, True)
    finally:
        _progress_cb = None
