"""Recursive iLQR, the primary solver (reference: ILQRRecursive.cpp:19-183).

Functional re-architecture for TPU:
  * the H-step rollout is a `lax.scan` whose step fuses the feedback law,
    the integrator, FK + Jacobian, and the stage cost — the reference's
    per-step KDL FK calls (ILQRRecursive.cpp:124-151) become straight-line
    compiled code that vmaps over scenario batches;
  * the backward Riccati pass is a reverse `lax.scan` over precomputed
    quadratized stage terms (ILQRRecursive.cpp:73-97);
  * the backtracking line search is a `lax.while_loop` with the reference's
    exact schedule: alpha halved from 2 at the loop top (first trial = 1),
    floor 1e-3, strict cost decrease, NaN-reject, and the final trial adopted
    unconditionally on floor-out (ILQRRecursive.cpp:101-157);
  * early stop: alpha * sqrt(sum_k ||du_k||) < 1e-3 and cost < 1e-3
    (ILQRRecursive.cpp:174 — the reference's du_square_norm accumulates
    *norms*, not squared norms; reproduced as-is).

Numerics held fixed for parity: Quu regularization 1e-6 and the explicit
inverse with the leading minus sign (ILQRRecursive.cpp:89-91).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ilqr_planner_tpu.ops import pscan as pscan_ops
from ilqr_planner_tpu.ops.linalg import inv_spd, solve_spd
from ilqr_planner_tpu.systems import funcs
from ilqr_planner_tpu.systems.spec import Spec

__all__ = ["ILQRResult", "solve", "rollout"]


@struct.dataclass
class ILQRResult:
    """X [H,nx], fX [H,nt], U [H-1,nu], Ks [H-1,nu,nx], ds [H-1,nu]
    (ds scaled by the accepted alpha, as returned by the reference,
    ILQRRecursive.cpp:128,144), final cost, iterations used, last alpha."""

    X: jnp.ndarray
    fX: jnp.ndarray
    U: jnp.ndarray
    Ks: jnp.ndarray
    ds: jnp.ndarray
    cost: jnp.ndarray
    iterations: jnp.ndarray
    alpha: jnp.ndarray
    # Optional per-iteration record (solve(record=True)): a device-side
    # {"cost": [nb_iter], "alpha": [nb_iter]} buffer filled at executed
    # iterations (NaN beyond `iterations`) — the callback channel's
    # information (ILQRRecursive.cpp:164-172) without host callbacks, which
    # hang over remote-device transports (docs/round4_notes.md item 5).
    progress: Optional[dict] = None


def rollout(spec: Spec, alpha, Ks, ds, Xref, Uref):
    """Closed-loop rollout u_k = Uref_k + K_k (x_k - Xref_k) + alpha d_k,
    accumulating the stage costs and sum of ||du_k||.

    With Ks = ds = 0 this is the plain initial rollout (ILQRRecursive.cpp:41-56).
    Returns (X, fX, U, As, Bs, Js, cost, du_norm_sum).
    """
    x0 = spec.x0
    fx0, J0 = funcs.fx_jac(spec, x0)
    dtype = x0.dtype

    # For LTI dynamics (everything but the time-optimal kinds) A and B are
    # constant, so the scan neither emits nor the solver carries per-step
    # A/B arrays — a large cut in the while_loop working set per scenario.
    lti = funcs.constant_AB(spec, dtype) is not None

    def step(carry, inp):
        x, fx, cost, du_acc = carry
        K, d, xo, uo, k = inp
        du = K @ (x - xo) + alpha * d
        u = uo + du
        c = funcs.stage_cost(spec, x, fx, u, k)
        x1, A, B = funcs.dynamics(spec, x, u)
        fx1, J1 = funcs.fx_jac(spec, x1)
        du_acc = du_acc + jnp.sqrt(jnp.sum(du * du))
        ab = () if lti else (A, B)
        return (x1, fx1, cost + c, du_acc), (x1, fx1, u, J1, ab)

    ks = jnp.arange(spec.horizon - 1)
    init = (x0, fx0, jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
    (xH, fxH, cost, du_acc), (Xs, fXs, U, Js, ABs) = jax.lax.scan(
        step, init, (Ks, ds, Xref[:-1], Uref, ks)
    )
    As, Bs = ((), ()) if lti else ABs
    cost = cost + funcs.final_cost(spec, xH, fxH)
    X = jnp.concatenate([x0[None], Xs], axis=0)
    fX = jnp.concatenate([fx0[None], fXs], axis=0)
    Js_full = jnp.concatenate([J0[None], Js], axis=0)
    return X, fX, U, As, Bs, Js_full, cost, du_acc


def _backward(spec: Spec, X, fX, U, As, Bs, Js, pscan: bool = False):
    """Backward Riccati pass -> (Ks [H-1,nu,nx], ds [H-1,nu]), reproducing
    ILQRRecursive.cpp:69-97 (including the 1e-6-regularized explicit
    inverse). With pscan=True the cost-to-go quadratics come from the
    O(log H)-depth associative scan (ops.pscan) instead of the sequential
    reverse scan; gains are formed with the same regularized inverse, so
    results agree with the sequential pass up to the (unregularized vs
    regularized) value-recursion difference of order 1e-6."""
    H = spec.horizon
    nu = spec.nu
    dtype = X.dtype

    ks = jnp.arange(H - 1)
    l_x, l_u, l_xx = jax.vmap(
        lambda x, fx, J, u, k: funcs.cost_gradients(spec, x, fx, J, u, k)
    )(X[:-1], fX[:-1], Js[:-1], U, ks)
    lN_x, _, lN_xx = funcs.cost_gradients(
        spec, X[-1], fX[-1], Js[-1], jnp.zeros(nu, dtype), H - 1
    )
    return _backward_core(spec, As, Bs, l_x, l_u, l_xx, lN_x, lN_xx, pscan)


def _backward_core(spec: Spec, As, Bs, l_x, l_u, l_xx, lN_x, lN_xx,
                   pscan: bool = False):
    """Gain computation from precomputed quadratized stage terms."""
    H = spec.horizon
    nu = spec.nu
    dtype = l_x.dtype
    R = jnp.diag(spec.Rt.astype(dtype))

    eye_reg = 1e-6 * jnp.eye(nu, dtype=dtype)
    const_ab = funcs.constant_AB(spec, dtype) if isinstance(As, tuple) else None

    if pscan:
        if const_ab is not None:
            A_c, B_c = const_ab
            As_full = jnp.broadcast_to(A_c, (H - 1,) + A_c.shape)
            Bs_full = jnp.broadcast_to(B_c, (H - 1,) + B_c.shape)
        else:
            As_full, Bs_full = As, Bs
        Ps, ps = pscan_ops.lqr_cost_to_go(
            As_full, Bs_full, l_x, l_u, l_xx, lN_x, lN_xx,
            spec.Rt.astype(dtype)
        )

        def gains(A, B, lu, P1, p1):
            Quu = R + B.T @ P1 @ B
            Minv = -inv_spd(Quu + eye_reg)
            return Minv @ (B.T @ P1 @ A), Minv @ (lu + B.T @ p1)

        return jax.vmap(gains)(As_full, Bs_full, l_u, Ps[1:], ps[1:])

    # First-order non-time kinds have A = I, B = dt I (PosOrnPlannerSys.cpp:
    # 119-123) — the A/B matmuls of the generic recursion collapse to scalar
    # scalings, halving the per-step work of the sequential sweep.
    base = spec.subs[0] if spec.kind == "sequential" else spec
    diag_lti = (const_ab is not None and base.nb_deriv == 1
                and not base.time_optimal)
    dt_s = base.dt.astype(dtype) if diag_lti else None

    def bstep(carry, inp):
        P, p = carry
        if const_ab is not None:
            A, B = const_ab
            lx, lu, lxx = inp
        else:
            A, B, lx, lu, lxx = inp
        if diag_lti:
            Qux = dt_s * P
            Quu = R + dt_s * dt_s * P
            Qxx = lxx + P
            Qxu = Qux.T
            Qu = lu + dt_s * p
            Qx = lx + p
        else:
            PA = P @ A
            Qux = B.T @ PA
            Quu = R + B.T @ P @ B
            Qxx = lxx + A.T @ PA
            Qxu = Qux.T
            Qu = lu + B.T @ p
            Qx = lx + A.T @ p
        # One elimination for both gains: [K|d] = -(Quu+reg)^{-1} [Qux|Qu]
        # (ILQRRecursive.cpp:89-91 forms the explicit inverse; solving the
        # stacked system directly is the same quantity with one fewer
        # 7x7-matmul chain in the scan's critical path).
        Kd = -solve_spd(Quu + eye_reg,
                        jnp.concatenate([Qux, Qu[:, None]], axis=-1))
        K, d = Kd[:, :-1], Kd[:, -1]
        P1 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qxu @ K
        p1 = Qx + K.T @ (Quu @ d) + K.T @ Qu + Qxu @ d
        return (P1, p1), (K, d)

    scan_in = (l_x, l_u, l_xx) if const_ab is not None else (As, Bs, l_x, l_u, l_xx)
    (_, _), (Ks, ds) = jax.lax.scan(bstep, (lN_xx, lN_x), scan_in, reverse=True)
    return Ks, ds


def static_kp_steps(spec: Spec):
    """Keypoint timesteps as a static tuple, read from the concrete (host)
    kp_mask arrays. Must be called OUTSIDE jit on a concrete Spec; union
    over subsystems for sequential kinds and over any leading batch dims."""
    import numpy as np

    def mask_of(s):
        if s.kind == "sequential":
            ms = [mask_of(sub) for sub in s.subs]
            return np.any(np.stack(ms), axis=0)
        m = np.asarray(s.kp_mask) != 0
        return m.reshape(-1, m.shape[-1]).any(axis=0)

    return tuple(int(k) for k in np.nonzero(mask_of(spec))[0])


@partial(jax.jit, static_argnames=("nb_iter", "line_search", "early_stop",
                                   "with_callback", "pscan", "kp_steps",
                                   "guard", "record"))
def _solve_impl(spec: Spec, U0, nb_iter: int, line_search: bool, early_stop: bool,
                with_callback: bool, pscan: bool = False, kp_steps=None,
                cb_id=None, guard: bool = False, record: bool = False):
    # TPU MXU default matmul precision is bfloat16, whose 8-bit mantissa
    # diverges the Gauss-Newton iteration (NaN after convergence); force full
    # f32 accumulation for every dot traced inside the solve. Matrices here
    # are tiny (<=15 dims), so the 3/6-pass penalty is irrelevant.
    with jax.default_matmul_precision("float32"):
        return _solve_body(spec, U0, nb_iter, line_search, early_stop,
                           with_callback, pscan, kp_steps, cb_id, guard,
                           record)


def _solve_body(spec: Spec, U0, nb_iter: int, line_search: bool, early_stop: bool,
                with_callback: bool, pscan: bool = False, kp_steps=None,
                cb_id=None, guard: bool = False, record: bool = False):
    if not with_callback and kp_steps is not None:
        # Fast path: identical numerics, restructured control flow and
        # FK-sparse evaluation (see _solve_body_sparse). The while_loop path
        # below is kept for callback runs — its per-executed-iteration host
        # notifications mirror the reference's logging — and for callers
        # that cannot provide static keypoint steps.
        return _solve_body_sparse(spec, U0, nb_iter, line_search, early_stop,
                                  pscan, kp_steps, guard, record)
    dtype = spec.x0.dtype
    H, nu, nx = spec.horizon, spec.nu, spec.nx

    zK = jnp.zeros((H - 1, nu, nx), dtype=dtype)
    zd = jnp.zeros((H - 1, nu), dtype=dtype)
    X, fX, U, As, Bs, Js, cost0, _ = rollout(spec, jnp.asarray(0.0, dtype), zK, zd,
                                             jnp.zeros((H, nx), dtype), U0)

    def ls_cond(s):
        first, fail, alpha = s[0], s[1], s[2]
        return first | (fail & (alpha > 1e-3) & line_search)

    def iter_body(carry):
        X, fX, U, As, Bs, Js, cost0, Ks, ds, it, done, alpha_l, du_l = carry
        Ks, ds = _backward(spec, X, fX, U, As, Bs, Js, pscan=pscan)

        def ls_body(s):
            _, _, alpha, _ = s
            alpha = alpha / 2.0
            out = rollout(spec, alpha, Ks, ds, X, U)
            cost = out[6]
            fail = (cost >= cost0) | jnp.isnan(cost)
            return (jnp.asarray(False), fail, alpha, out)

        dummy = (X, fX, U, As, Bs, Js, cost0, jnp.asarray(0.0, dtype))
        s0 = (jnp.asarray(True), jnp.asarray(True), jnp.asarray(2.0, dtype), dummy)
        _, _, alpha, out = jax.lax.while_loop(ls_cond, ls_body, s0)
        Xn, fXn, Un, Asn, Bsn, Jsn, costn, du_acc = out

        if guard:
            # Guarded mode (off by default for reference parity): when the
            # line search floors out without a strictly-improving finite
            # trial, KEEP the incumbent trajectory and freeze, instead of
            # the reference's unconditional adoption of the last (possibly
            # NaN / worse) trial (ILQRRecursive.cpp:101-157) — the behavior
            # that lets the 2nd-order sqrt(dt) workload walk into -nan
            # (POS_ORN_TIME_SYS_2ND.ipynb cell 11).
            accepted = (costn < cost0) & ~jnp.isnan(costn)
            keep = lambda o, n: jnp.where(accepted, n, o)  # noqa: E731
            Xn, fXn, Un = keep(X, Xn), keep(fX, fXn), keep(U, Un)
            Asn = jax.tree_util.tree_map(keep, As, Asn)
            Bsn = jax.tree_util.tree_map(keep, Bs, Bsn)
            Jsn = keep(Js, Jsn)
            costn = keep(cost0, costn)
            guard_frozen = ~accepted
        else:
            guard_frozen = jnp.asarray(False)

        if with_callback:
            jax.debug.callback(
                _emit_progress, cb_id, it + 1, costn, alpha, ordered=True
            )

        done = (early_stop
                & (alpha * jnp.sqrt(du_acc) < 1e-3)
                & (costn < 1e-3)) | guard_frozen
        return (Xn, fXn, Un, Asn, Bsn, Jsn, costn, Ks, ds, it + 1, done,
                alpha, du_acc)

    def iter_cond(carry):
        it, done = carry[9], carry[10]
        return (it < nb_iter) & ~done

    carry0 = (X, fX, U, As, Bs, Js, cost0, zK, zd,
              jnp.asarray(0, jnp.int32), jnp.asarray(False),
              jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
    X, fX, U, As, Bs, Js, cost, Ks, ds, it, done, alpha, _ = jax.lax.while_loop(
        iter_cond, iter_body, carry0
    )
    # Reference returns the alpha-scaled feedforward terms (ILQRRecursive.cpp:128).
    return ILQRResult(X=X, fX=fX, U=U, Ks=Ks, ds=alpha * ds, cost=cost,
                      iterations=it, alpha=alpha)


def _light_rollout(spec: Spec, alpha, Ks, ds, Xref, Uref, kp_steps):
    """FK-free closed-loop rollout with exact cost accounting.

    The dynamics are pure integrators — FK never enters the state recursion
    (dynamics() above is kinematics-free) — and the keypoint residual term
    e^T P e is exactly zero wherever no keypoint sits (P = 0, e masked,
    System.cpp:103-109). So the sequential scan only integrates states and
    accumulates the cheap cost pieces (control penalty at keypoint steps,
    joint-limit penalties), and FK runs ONLY at the statically known
    keypoint steps afterwards. This removes the 7-joint chain walk +
    Jacobian build from every step of every line-search trial — the
    dominant cost of the naive rollout — while producing the identical cost
    value. Per-step A/B matrices are NOT emitted (for the time-optimal
    kinds that would write B * n_trials * H * nx^2 floats of HBM per
    line-search sweep); the caller recomputes them for the single accepted
    trajectory (dynamics() is memoryless in (x, u)).
    Returns (X, U, cost, du_acc)."""
    x0 = spec.x0
    dtype = x0.dtype

    def step(carry, inp):
        x, cost, du_acc = carry
        K, d, xo, uo, k = inp
        du = K @ (x - xo) + alpha * d
        u = uo + du
        lim_c, _, _ = funcs._limit_triplet(spec, x)
        c = funcs.ctrl_cost(spec, u, k) + lim_c
        x1, _, _ = funcs.dynamics(spec, x, u)
        du_acc = du_acc + jnp.sqrt(jnp.sum(du * du))
        return (x1, cost + c, du_acc), (x1, u)

    ks = jnp.arange(spec.horizon - 1)
    init = (x0, jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
    (xH, cost, du_acc), (Xs, U) = jax.lax.scan(
        step, init, (Ks, ds, Xref[:-1], Uref, ks)
    )
    X = jnp.concatenate([x0[None], Xs], axis=0)
    # Final-step limit penalty (final_cost = stage cost at H-1 with u = 0).
    lim_N, _, _ = funcs._limit_triplet(spec, xH)
    cost = cost + lim_N
    # Keypoint residual costs at the statically known steps only.
    for k in kp_steps:
        fx, _ = funcs.fx_jac(spec, X[k])
        e = funcs.residual(spec, fx, k)
        cost = cost + e @ (funcs.prec_at(spec, k) @ e)
    return X, U, cost, du_acc


def _grads_sparse(spec: Spec, X, U, kp_steps):
    """Quadratized stage terms with FK only at keypoint steps.

    At steps without a keypoint P = 0, so l_x = -L^T q and l_xx = L^T L
    (limits only, no Jacobian needed — System.cpp:248-311); the J^T P e /
    J^T P J contributions are scattered in at the static keypoint steps.
    """
    H, nu, nx = spec.horizon, spec.nu, spec.nx
    dtype = X.dtype

    _, Lq, L2 = jax.vmap(lambda x: funcs._limit_triplet(spec, x))(X)
    l_x = -Lq[:-1]
    l_xx = jax.vmap(jnp.diag)(L2[:-1])
    l_u = spec.Rt.astype(dtype)[None, :] * U
    lN_x = -Lq[-1]
    lN_xx = jnp.diag(L2[-1])

    for k in kp_steps:
        fx, J = funcs.fx_jac(spec, X[k])
        e = funcs.residual(spec, fx, k)
        P = funcs.prec_at(spec, k)
        gx = -(J.T @ (P @ e))
        gxx = J.T @ P @ J
        if k == H - 1:
            lN_x = lN_x + gx
            lN_xx = lN_xx + gxx
        else:
            l_x = l_x.at[k].add(gx)
            l_xx = l_xx.at[k].add(gxx)
    return l_x, l_u, l_xx, lN_x, lN_xx


def _solve_body_sparse(spec: Spec, U0, nb_iter: int, line_search: bool,
                       early_stop: bool, pscan: bool, kp_steps,
                       guard: bool = False, record: bool = False):
    """Control-flow- and FK-restructured solve with identical numerics.

    Three restructurings vs the reference-shaped while_loop path (results
    identical to ~1e-12 in f64):
      * FK-sparse rollouts/gradients (see _light_rollout/_grads_sparse);
      * the backtracking line search evaluates its trials alpha = 1, 1/2,
        ..., 2^-10 as a masked scan adopting the FIRST acceptable trial
        (identical decision to the sequential backtracking, including the
        reference's unconditional adoption of the last trial on floor-out,
        ILQRRecursive.cpp:101-157);
      * iterations run as a masked lax.scan — early-stopped lanes freeze,
        so batched lanes never serialize each other.
    The final trajectory's fX is computed once at the end, vectorized over
    the horizon (it is pure FK of the accepted states).
    """
    dtype = spec.x0.dtype
    H, nu, nx = spec.horizon, spec.nu, spec.nx
    lti = funcs.constant_AB(spec, dtype) is not None

    zK = jnp.zeros((H - 1, nu, nx), dtype=dtype)
    zd = jnp.zeros((H - 1, nu), dtype=dtype)
    X, U, cost0, _ = _light_rollout(
        spec, jnp.asarray(0.0, dtype), zK, zd, jnp.zeros((H, nx), dtype), U0,
        kp_steps)
    if line_search:
        alphas = (2.0 ** -jnp.arange(0, 11)).astype(dtype)  # 1 .. 2^-10
    else:
        alphas = jnp.ones((1,), dtype)  # single unconditional trial at 1

    def iter_body(carry, _):
        X, U, cost0, Ks, ds, it, done, alpha_l, du_l = carry[:9]
        if lti:
            As, Bs = (), ()
        else:
            # Per-step A/B only for the single accepted trajectory (the
            # trial rollouts above never materialize them).
            _, As, Bs = jax.vmap(lambda x, u: funcs.dynamics(spec, x, u))(
                X[:-1], U)
        l_terms = _grads_sparse(spec, X, U, kp_steps)
        Ks_n, ds_n = _backward_core(spec, As, Bs, *l_terms, pscan)

        # Trials as a masked scan over the alpha grid: the FIRST passing
        # alpha is adopted; the 2^-10 floor trial sticks when none passes
        # (ILQRRecursive.cpp:101-157). (Vmapping the alpha axis into the
        # rollout scan looks attractive — 11x less sequential depth — but
        # measured 4.6x SLOWER on the TPU for the batched fleet: the 11x
        # scan carry spills out of VMEM. Kept sequential.)
        def trial(tc, a):
            accepted, best = tc
            out = _light_rollout(spec, a, Ks_n, ds_n, X, U, kp_steps)
            cost = out[2]
            ok = (cost < cost0) & ~jnp.isnan(cost)
            take = ~accepted
            best = jax.tree_util.tree_map(
                lambda b, o: jnp.where(take, o, b), best, out + (a,))
            return (accepted | ok, best), None

        dummy = (X, U, cost0, jnp.asarray(0.0, dtype),
                 jnp.asarray(1.0, dtype))
        (acc, picked), _ = jax.lax.scan(
            trial, (jnp.asarray(False), dummy), alphas)
        Xn, Un, costn, du_acc, alpha = picked

        if guard:
            # Guarded mode (see _solve_body): no finite improving trial ->
            # keep the incumbent and freeze, instead of adopting the
            # floor-alpha trial (ILQRRecursive.cpp:101-157 quirk).
            keep = lambda o, n: jnp.where(acc, n, o)  # noqa: E731
            Xn, Un, costn = keep(X, Xn), keep(U, Un), keep(cost0, costn)
            guard_frozen = ~acc
        else:
            guard_frozen = jnp.asarray(False)

        new = (Xn, Un, costn, Ks_n, ds_n, it + 1,
               done | (early_stop & (alpha * jnp.sqrt(du_acc) < 1e-3)
                       & (costn < 1e-3)) | guard_frozen,
               alpha, du_acc)
        old = (X, U, cost0, Ks, ds, it, done, alpha_l, du_l)
        if record:
            # Device-side per-iteration (cost, alpha) record — the callback
            # channel's payload (ILQRRecursive.cpp:164-172) without host
            # callbacks (unusable over remote-device transports).
            pc, pa = carry[9], carry[10]
            new = new + (pc.at[it].set(costn), pa.at[it].set(alpha))
            old = old + (pc, pa)
        carry = jax.tree_util.tree_map(
            lambda o, n: jnp.where(done, o, n), old, new)
        return carry, None

    carry0 = (X, U, cost0, zK, zd,
              jnp.asarray(0, jnp.int32), jnp.asarray(False),
              jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))
    if record:
        nanf = jnp.full((nb_iter,), jnp.nan, dtype)
        carry0 = carry0 + (nanf, nanf)
    carry, _ = jax.lax.scan(iter_body, carry0, None, length=nb_iter)
    X, U, cost, Ks, ds, it, done, alpha = carry[:8]
    progress = ({"cost": carry[9], "alpha": carry[10]} if record else None)
    fX = jax.vmap(lambda x: funcs.fx_jac(spec, x)[0])(X)
    return ILQRResult(X=X, fX=fX, U=U, Ks=Ks, ds=alpha * ds, cost=cost,
                      iterations=it, alpha=alpha, progress=progress)


# Callback registry: solve() registers each callback under a fresh integer
# id that flows through the jitted computation as a TRACED scalar, so
# concurrent/nested solves with different callbacks never interleave (the
# id is data, not shared module state) and no retrace occurs per callback
# object.
import itertools as _itertools

_cb_registry = {}
_cb_counter = _itertools.count()


def _register_cb(callback):
    cb_id = next(_cb_counter)
    _cb_registry[cb_id] = callback
    return cb_id


def _emit_progress(cb_id, it, cost, alpha):
    msg = f"Iteration {int(it)}, Cost: {float(cost):g}, alpha= {float(alpha):g}"
    cb = _cb_registry.get(int(cb_id))
    if cb is not None:
        cb.notify(msg)
    else:  # pragma: no cover
        print(msg)


def solve(
    spec: Spec,
    U0,
    nb_iter: int,
    line_search: bool = True,
    early_stop: bool = True,
    callback: Optional[object] = None,
    backward: str = "scan",
    guard: bool = False,
    record: bool = False,
) -> ILQRResult:
    """Solve the OCP from initial control sequence U0 [H-1, nu].

    Signature mirrors ILQRRecursive::solve(U0, nb_iter, line_search,
    early_stop, cb) (ILQRRecursive.h:27-37). The whole solve — all
    iterations, backward passes, and line-search trials — runs as a single
    jitted computation; `callback.notify(...)` is bridged out per iteration
    via jax.debug.callback when provided.

    backward: 'scan' (default) is the sequential reverse lax.scan with
    bit-level parity to the reference recursion; 'pscan' computes the
    cost-to-go quadratics with an O(log H)-depth associative scan
    (ops.pscan) — faster for long horizons at small batch, numerically
    equal up to the 1e-6 gain regularization.

    guard: opt-in divergence guard (default off for reference parity).
    The reference line search adopts its last trial unconditionally when
    every alpha down to the 1e-3 floor fails — including NaN trials, which
    is how the 2nd-order sqrt(dt) workload diverges to -nan
    (POS_ORN_TIME_SYS_2ND.ipynb cell 11). With guard=True a floored-out
    line search keeps the incumbent trajectory and stops: the result is
    always the best finite iterate, never worse than the initial rollout.

    record: return a device-side per-iteration {"cost", "alpha"} buffer in
    result.progress (NaN beyond result.iterations) — the callback channel's
    information without host callbacks, which hang over remote-device
    transports (tunnel-safe; see docs/round4_notes.md item 5). Incompatible
    with `callback` (which already delivers the live records).
    """
    U0 = jnp.asarray(U0)
    if U0.shape != (spec.horizon - 1, spec.nu):
        raise ValueError(f"U0 must be [{spec.horizon - 1}, {spec.nu}], got {U0.shape}")
    if backward not in ("scan", "pscan"):
        raise ValueError(f"backward must be 'scan' or 'pscan', got {backward!r}")
    if record and callback is not None:
        raise ValueError("record=True and callback are mutually exclusive")
    if callback is None:
        return _solve_impl(spec, U0, int(nb_iter), bool(line_search),
                           bool(early_stop), False,
                           backward == "pscan", static_kp_steps(spec),
                           guard=bool(guard), record=bool(record))
    cb_id = _register_cb(callback)
    try:
        res = _solve_impl(spec, U0, int(nb_iter), bool(line_search),
                          bool(early_stop), True,
                          backward == "pscan", static_kp_steps(spec),
                          cb_id=jnp.asarray(cb_id, jnp.int32),
                          guard=bool(guard))
        # Dispatch is async; the ordered debug callbacks flush by result
        # time, so block before dropping the registry entry.
        jax.block_until_ready(res)
        return res
    finally:
        _cb_registry.pop(cb_id, None)
