"""Augmented-Lagrangian iLQR for per-timestep inequality constraints.

Reference: AL-ILQR.cpp:19-232 + the Constraint struct (AL-ILQR.h:19-22),
handling constraints A_k [x; u] <= b_k. Reproduced semantics:

  * active-set mask Ik: diagonal 1 except where g < 0 AND lambda == 0
    (AL-ILQR.cpp:34-39), pre-scaled by the current penalty rho
    (AL-ILQR.cpp:72,190);
  * backward-pass constraint terms added to every Q quantity
    (AL-ILQR.cpp:129-134);
  * line-search acceptance uses the *plain* cost, not the augmented
    Lagrangian (AL-ILQR.cpp:193-199 accumulates s->cost) — the
    `augmentedLossK` helper exists in the reference but is never called
    from solve();
  * dual update every `lag_update_step` iterations: rho *= scaling_factor
    then lambda = max(0, lambda + rho g) (AL-ILQR.cpp:202-208);
  * early stop alpha*sqrt(sum ||du||) < 1e-3 — without the cost < 1e-3
    condition of the unconstrained solver (AL-ILQR.cpp:225);
  * the backward pass of iteration i uses the penalty-scaled active sets
    captured during the *previous* forward pass, so the penalty value seen
    by the backward pass lags dual updates by design.

The whole solve is one jitted computation; constraints are dense arrays
(zero rows are inert, matching the reference's empty-constraint behavior).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ilqr_planner_tpu.ops.linalg import inv_spd, solve_spd
from ilqr_planner_tpu.solvers.ilqr import (_grads_sparse, _light_rollout,
                                           static_kp_steps)
from ilqr_planner_tpu.systems import funcs
from ilqr_planner_tpu.systems.spec import Spec

__all__ = ["Constraints", "ALILQRResult", "solve"]


@struct.dataclass
class Constraints:
    """Per-timestep inequality constraints A_k [x; u] <= b_k.

    A: [H-1, nc, nx+nu], b: [H-1, nc]. Build with `Constraints.uniform` for
    the common same-every-step case (POS_ORN_SYS_AL_ILQR.ipynb cell 12).
    """

    A: jnp.ndarray
    b: jnp.ndarray

    @staticmethod
    def uniform(A, b, horizon: int) -> "Constraints":
        A = jnp.asarray(A)
        b = jnp.asarray(b)
        return Constraints(
            A=jnp.broadcast_to(A, (horizon - 1,) + A.shape),
            b=jnp.broadcast_to(b, (horizon - 1,) + b.shape),
        )


@struct.dataclass
class ALILQRResult:
    X: jnp.ndarray
    fX: jnp.ndarray
    U: jnp.ndarray
    multipliers: jnp.ndarray
    cost: jnp.ndarray
    iterations: jnp.ndarray
    # Optional per-iteration record (solve(record=True)): device-side
    # {"cost", "alpha"} buffers — the AL progress channel's information
    # (AL-ILQR.cpp:215-219) without host callbacks (tunnel-safe).
    progress: Optional[dict] = None


def _active_set(cons: Constraints, lam, x, u, k):
    """(Ik diagonal 0/1, g) at one step (AL-ILQR.cpp:21-44)."""
    s = jnp.concatenate([x, u])
    g = cons.A[k] @ s - cons.b[k]
    inactive = (g < 0) & (lam == 0)
    return jnp.where(inactive, 0.0, 1.0), g


def _rollout(spec: Spec, cons: Constraints, lam, penalty, alpha, Ks, ds, Xref, Uref):
    """Closed-loop rollout that also captures per-step penalty-scaled active
    sets and violations (AL-ILQR.cpp:189-191)."""
    x0 = spec.x0
    fx0, J0 = funcs.fx_jac(spec, x0)
    dtype = x0.dtype

    def step(carry, inp):
        x, fx, cost, du_acc = carry
        K, d, xo, uo, lam_k, k = inp
        du = K @ (x - xo) + alpha * d
        u = uo + du
        Ik, g = _active_set(cons, lam_k, x, u, k)
        c = funcs.stage_cost(spec, x, fx, u, k)
        x1, A, B = funcs.dynamics(spec, x, u)
        fx1, J1 = funcs.fx_jac(spec, x1)
        du_acc = du_acc + jnp.sqrt(jnp.sum(du * du))
        return (x1, fx1, cost + c, du_acc), (x1, fx1, u, A, B, J1, penalty * Ik, g)

    ks = jnp.arange(spec.horizon - 1)
    init = (x0, fx0, jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
    (xH, fxH, cost, du_acc), (Xs, fXs, U, As, Bs, Js, Is, Cs) = jax.lax.scan(
        step, init, (Ks, ds, Xref[:-1], Uref, lam, ks)
    )
    cost = cost + funcs.final_cost(spec, xH, fxH)
    X = jnp.concatenate([x0[None], Xs], axis=0)
    fX = jnp.concatenate([fx0[None], fXs], axis=0)
    Js_full = jnp.concatenate([J0[None], Js], axis=0)
    return X, fX, U, As, Bs, Js_full, Is, Cs, cost, du_acc


def _backward(spec: Spec, cons: Constraints, lam, X, fX, U, As, Bs, Js, Is, Cs):
    """iLQR backward pass + constraint terms (AL-ILQR.cpp:94-145)."""
    H, nu, nx = spec.horizon, spec.nu, spec.nx
    dtype = X.dtype
    R = jnp.diag(spec.Rt.astype(dtype))

    ks = jnp.arange(H - 1)
    l_x, l_u, l_xx = jax.vmap(
        lambda x, fx, J, u, k: funcs.cost_gradients(spec, x, fx, J, u, k)
    )(X[:-1], fX[:-1], Js[:-1], U, ks)
    lN_x, _, lN_xx = funcs.cost_gradients(
        spec, X[-1], fX[-1], Js[-1], jnp.zeros(nu, dtype), H - 1
    )

    ckx = cons.A[:, :, :nx]  # [H-1, nc, nx]
    cku = cons.A[:, :, nx:]
    eye_reg = 1e-6 * jnp.eye(nu, dtype=dtype)

    def bstep(carry, inp):
        P, p = carry
        A, B, lx, lu, lxx, cx, cu, Ik, g, lam_k = inp
        Icx = Ik[:, None] * cx  # diag(Ik) @ cx
        Icu = Ik[:, None] * cu
        PA = P @ A
        Qux = B.T @ PA + cu.T @ Icx
        Quu = R + B.T @ P @ B + cu.T @ Icu
        Qxx = lxx + A.T @ PA + cx.T @ Icx
        Qxu = A.T @ (P @ B) + cx.T @ Icu
        lig = lam_k + Ik * g
        Qu = lu + B.T @ p + cu.T @ lig
        Qx = lx + A.T @ p + cx.T @ lig
        Minv = -inv_spd(Quu + eye_reg)
        K = Minv @ Qux
        d = Minv @ Qu
        P1 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qxu @ K
        p1 = Qx + K.T @ (Quu @ d) + K.T @ Qu + Qxu @ d
        return (P1, p1), (K, d)

    (_, _), (Ks, ds) = jax.lax.scan(
        bstep, (lN_xx, lN_x), (As, Bs, l_x, l_u, l_xx, ckx, cku, Is, Cs, lam),
        reverse=True,
    )
    return Ks, ds


@partial(jax.jit, static_argnames=("nb_iter", "lag_update_step", "line_search",
                                   "early_stop", "with_callback", "kp_steps",
                                   "guard", "record"))
def _solve_impl(spec: Spec, cons: Constraints, lam0, U0, nb_iter: int,
                lag_update_step: int, penalty0, scaling_factor,
                line_search: bool, early_stop: bool, with_callback: bool,
                kp_steps=None, cb_id=None, guard: bool = False,
                record: bool = False):
    with jax.default_matmul_precision("float32"):
        if not with_callback and kp_steps is not None:
            # Fast path (same restructuring as ilqr._solve_body_sparse):
            # FK-sparse rollouts/gradients, the line search as a masked scan
            # over the alpha grid, iterations as a masked scan with frozen
            # converged lanes. The while_loop path below stays for callback
            # runs (per-executed-iteration host notifications).
            return _solve_body_sparse(spec, cons, lam0, U0, nb_iter,
                                      lag_update_step, penalty0,
                                      scaling_factor, line_search, early_stop,
                                      kp_steps, guard, record)
        return _solve_body(spec, cons, lam0, U0, nb_iter, lag_update_step,
                           penalty0, scaling_factor, line_search, early_stop,
                           with_callback, cb_id, guard)


def _solve_body(spec, cons, lam0, U0, nb_iter, lag_update_step, penalty0,
                scaling_factor, line_search, early_stop, with_callback,
                cb_id=None, guard=False):
    dtype = spec.x0.dtype
    H, nu, nx = spec.horizon, spec.nu, spec.nx
    penalty0 = jnp.asarray(penalty0, dtype)
    scaling = jnp.asarray(scaling_factor, dtype)

    zK = jnp.zeros((H - 1, nu, nx), dtype=dtype)
    zd = jnp.zeros((H - 1, nu), dtype=dtype)
    X, fX, U, As, Bs, Js, Is, Cs, cost0, _ = _rollout(
        spec, cons, lam0, penalty0, jnp.asarray(0.0, dtype), zK, zd,
        jnp.zeros((H, nx), dtype), U0,
    )

    def ls_cond(s):
        first, fail, alpha = s[0], s[1], s[2]
        return first | (fail & (alpha > 1e-3) & line_search)

    def iter_body(carry):
        (X, fX, U, As, Bs, Js, Is, Cs, cost0, lam, penalty, it, done) = carry
        Ks, ds = _backward(spec, cons, lam, X, fX, U, As, Bs, Js, Is, Cs)

        def ls_body(s):
            _, _, alpha, _ = s
            alpha = alpha / 2.0
            out = _rollout(spec, cons, lam, penalty, alpha, Ks, ds, X, U)
            cost = out[8]
            fail = (cost >= cost0) | jnp.isnan(cost)
            return (jnp.asarray(False), fail, alpha, out)

        dummy = (X, fX, U, As, Bs, Js, Is, Cs, cost0, jnp.asarray(0.0, dtype))
        s0 = (jnp.asarray(True), jnp.asarray(True), jnp.asarray(2.0, dtype), dummy)
        _, _, alpha, out = jax.lax.while_loop(ls_cond, ls_body, s0)
        Xn, fXn, Un, Asn, Bsn, Jsn, Isn, Csn, costn, du_acc = out

        if guard:
            # Guarded mode (see ilqr._solve_body): a floored-out line search
            # with no finite improving trial keeps the incumbent trajectory
            # and freezes, instead of the reference's unconditional adoption
            # of the last trial (AL-ILQR.cpp:149-199).
            accepted = (costn < cost0) & ~jnp.isnan(costn)
            keep = lambda o, n: jnp.where(accepted, n, o)  # noqa: E731
            (Xn, fXn, Un, Asn, Bsn, Jsn, Isn, Csn, costn) = (
                jax.tree_util.tree_map(
                    keep, (X, fX, U, As, Bs, Js, Is, Cs, cost0),
                    (Xn, fXn, Un, Asn, Bsn, Jsn, Isn, Csn, costn)))
            guard_frozen = ~accepted
        else:
            guard_frozen = jnp.asarray(False)

        # Dual/penalty update every lag_update_step iterations (cpp:202-208).
        do_update = ((it + 1) % lag_update_step) == 0
        new_penalty = jnp.where(do_update, penalty * scaling, penalty)
        new_lam = jnp.where(do_update, jnp.maximum(lam + new_penalty * Csn, 0.0), lam)

        if with_callback:
            jax.debug.callback(_emit_progress, cb_id, it + 1, costn, alpha,
                               ordered=True)

        done = (early_stop & (alpha * jnp.sqrt(du_acc) < 1e-3)) | guard_frozen
        return (Xn, fXn, Un, Asn, Bsn, Jsn, Isn, Csn, costn, new_lam,
                new_penalty, it + 1, done)

    def iter_cond(carry):
        it, done = carry[11], carry[12]
        return (it < nb_iter) & ~done

    carry0 = (X, fX, U, As, Bs, Js, Is, Cs, cost0, lam0, penalty0,
              jnp.asarray(0, jnp.int32), jnp.asarray(False))
    out = jax.lax.while_loop(iter_cond, iter_body, carry0)
    X, fX, U, lam, cost, it = out[0], out[1], out[2], out[9], out[8], out[11]
    return ALILQRResult(X=X, fX=fX, U=U, multipliers=lam, cost=cost, iterations=it)


def _active_sets(cons: Constraints, lam, penalty, X, U):
    """Penalty-scaled active sets + violations over the whole horizon, from
    the accepted trajectory — the values the reference captures inside its
    forward rollout (AL-ILQR.cpp:189-191). Constraints touch only (x, u), so
    this is FK-free vector math, vmapped over the H-1 steps."""

    def f(lam_k, x, u, A_k, b_k):
        g = A_k @ jnp.concatenate([x, u]) - b_k
        inactive = (g < 0) & (lam_k == 0)
        return penalty * jnp.where(inactive, 0.0, 1.0), g

    return jax.vmap(f)(lam, X[:-1], U, cons.A, cons.b)


def _backward_core_al(spec: Spec, As, Bs, l_x, l_u, l_xx, lN_x, lN_xx,
                      ckx, cku, Is, Cs, lam):
    """AL backward pass from precomputed quadratized stage terms: the iLQR
    recursion plus the constraint terms of AL-ILQR.cpp:129-134. Is carries
    the penalty-scaled active-set diagonals captured after the previous
    accepted rollout (the reference's by-design lag of the penalty value
    behind dual updates)."""
    nu = spec.nu
    dtype = l_x.dtype
    R = jnp.diag(spec.Rt.astype(dtype))
    eye_reg = 1e-6 * jnp.eye(nu, dtype=dtype)
    const_ab = funcs.constant_AB(spec, dtype) if isinstance(As, tuple) else None

    # A = I, B = dt I collapse for first-order non-time kinds (same
    # simplification as ilqr._backward_core's diag_lti branch).
    base = spec.subs[0] if spec.kind == "sequential" else spec
    diag_lti = (const_ab is not None and base.nb_deriv == 1
                and not base.time_optimal)
    dt_s = base.dt.astype(dtype) if diag_lti else None

    def bstep(carry, inp):
        P, p = carry
        if const_ab is not None:
            A, B = const_ab
            lx, lu, lxx, cx, cu, Ik, g, lam_k = inp
        else:
            A, B, lx, lu, lxx, cx, cu, Ik, g, lam_k = inp
        Icx = Ik[:, None] * cx
        Icu = Ik[:, None] * cu
        lig = lam_k + Ik * g
        if diag_lti:
            Qux = dt_s * P + cu.T @ Icx
            Quu = R + dt_s * dt_s * P + cu.T @ Icu
            Qxx = lxx + P + cx.T @ Icx
            Qu = lu + dt_s * p + cu.T @ lig
            Qx = lx + p + cx.T @ lig
        else:
            PA = P @ A
            Qux = B.T @ PA + cu.T @ Icx
            Quu = R + B.T @ P @ B + cu.T @ Icu
            Qxx = lxx + A.T @ PA + cx.T @ Icx
            Qu = lu + B.T @ p + cu.T @ lig
            Qx = lx + A.T @ p + cx.T @ lig
        Qxu = Qux.T
        Kd = -solve_spd(Quu + eye_reg,
                        jnp.concatenate([Qux, Qu[:, None]], axis=-1))
        K, d = Kd[:, :-1], Kd[:, -1]
        P1 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qxu @ K
        p1 = Qx + K.T @ (Quu @ d) + K.T @ Qu + Qxu @ d
        return (P1, p1), (K, d)

    common = (l_x, l_u, l_xx, ckx, cku, Is, Cs, lam)
    scan_in = common if const_ab is not None else (As, Bs) + common
    (_, _), (Ks, ds) = jax.lax.scan(bstep, (lN_xx, lN_x), scan_in,
                                    reverse=True)
    return Ks, ds


def _solve_body_sparse(spec, cons, lam0, U0, nb_iter, lag_update_step,
                       penalty0, scaling_factor, line_search, early_stop,
                       kp_steps, guard=False, record=False):
    """Control-flow- and FK-restructured AL-iLQR with identical numerics.

    The dynamics and constraints never touch FK, so line-search trials run
    the FK-free _light_rollout; keypoint residual costs enter only at the
    statically known keypoint steps; active sets are recomputed from the
    accepted trajectory (identical values to the reference's in-rollout
    capture). Line-search trials alpha = 1, 1/2, ..., 2^-10 run as a masked
    scan adopting the first acceptable trial (last trial on floor-out),
    iterations as a masked scan with early-stopped lanes frozen.
    """
    dtype = spec.x0.dtype
    H, nu, nx = spec.horizon, spec.nu, spec.nx
    penalty0 = jnp.asarray(penalty0, dtype)
    scaling = jnp.asarray(scaling_factor, dtype)
    ckx = cons.A[:, :, :nx]
    cku = cons.A[:, :, nx:]

    lti = funcs.constant_AB(spec, dtype) is not None

    zK = jnp.zeros((H - 1, nu, nx), dtype=dtype)
    zd = jnp.zeros((H - 1, nu), dtype=dtype)
    X, U, cost0, _ = _light_rollout(
        spec, jnp.asarray(0.0, dtype), zK, zd, jnp.zeros((H, nx), dtype), U0,
        kp_steps)
    Is0, Cs0 = _active_sets(cons, lam0, penalty0, X, U)
    if line_search:
        alphas = (2.0 ** -jnp.arange(0, 11)).astype(dtype)
    else:
        alphas = jnp.ones((1,), dtype)

    def iter_body(carry, _):
        X, U, Is, Cs, cost0, lam, penalty, it, done = carry[:9]
        if lti:
            As, Bs = (), ()
        else:
            # Per-step A/B only for the single accepted trajectory (the
            # trial rollouts never materialize them).
            _, As, Bs = jax.vmap(lambda x, u: funcs.dynamics(spec, x, u))(
                X[:-1], U)
        l_terms = _grads_sparse(spec, X, U, kp_steps)
        Ks, ds = _backward_core_al(spec, As, Bs, *l_terms, ckx, cku, Is, Cs,
                                   lam)

        # Trials as a masked scan over the alpha grid (see
        # ilqr._solve_body_sparse for why this stays sequential on TPU):
        # first passing alpha adopted, floor trial sticks when none passes.
        def trial(tc, a):
            accepted, best = tc
            out = _light_rollout(spec, a, Ks, ds, X, U, kp_steps)
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
            # Guarded mode (see ilqr._solve_body_sparse): floored out with
            # no finite improving trial -> keep the incumbent and freeze.
            keep = lambda o, n: jnp.where(acc, n, o)  # noqa: E731
            Xn, Un, costn = keep(X, Xn), keep(U, Un), keep(cost0, costn)
            guard_frozen = ~acc
        else:
            guard_frozen = jnp.asarray(False)

        # Active sets from the accepted trajectory with the pre-update
        # lam/penalty — the values the accepted trial's rollout captured.
        Isn, Csn = _active_sets(cons, lam, penalty, Xn, Un)

        # Dual/penalty update every lag_update_step iterations (cpp:202-208).
        do_update = ((it + 1) % lag_update_step) == 0
        new_penalty = jnp.where(do_update, penalty * scaling, penalty)
        new_lam = jnp.where(do_update,
                            jnp.maximum(lam + new_penalty * Csn, 0.0), lam)

        new = (Xn, Un, Isn, Csn, costn, new_lam, new_penalty, it + 1,
               done | (early_stop & (alpha * jnp.sqrt(du_acc) < 1e-3))
               | guard_frozen)
        old = (X, U, Is, Cs, cost0, lam, penalty, it, done)
        if record:
            pc, pa = carry[9], carry[10]
            new = new + (pc.at[it].set(costn), pa.at[it].set(alpha))
            old = old + (pc, pa)
        carry = jax.tree_util.tree_map(
            lambda o, n: jnp.where(done, o, n), old, new)
        return carry, None

    carry0 = (X, U, Is0, Cs0, cost0, lam0, penalty0,
              jnp.asarray(0, jnp.int32), jnp.asarray(False))
    if record:
        nanf = jnp.full((nb_iter,), jnp.nan, dtype)
        carry0 = carry0 + (nanf, nanf)
    carry, _ = jax.lax.scan(iter_body, carry0, None, length=nb_iter)
    X, U, _, _, cost, lam, _, it, _ = carry[:9]
    progress = ({"cost": carry[9], "alpha": carry[10]} if record else None)
    fX = jax.vmap(lambda x: funcs.fx_jac(spec, x)[0])(X)
    return ALILQRResult(X=X, fX=fX, U=U, multipliers=lam, cost=cost,
                        iterations=it, progress=progress)


# Shared callback registry (see solvers.ilqr): callbacks flow through the
# trace as integer ids, so concurrent solves never share mutable state.
from ilqr_planner_tpu.solvers.ilqr import (_cb_registry, _emit_progress,
                                           _register_cb)


def solve(
    spec: Spec,
    constraints: Constraints,
    init_lambda,
    U0,
    nb_iter: int,
    lag_update_step: int,
    penalty: float,
    scaling_factor: float,
    line_search: bool = True,
    early_stop: bool = True,
    callback: Optional[object] = None,
    guard: bool = False,
    record: bool = False,
) -> ALILQRResult:
    """AL_ILQR::solve(U0, nb_iter, lag_update_step, penalty, scaling_factor,
    line_search, early_stop, cb) (AL-ILQR.h:35-55).

    guard: opt-in divergence guard (default off for reference parity),
    mirroring ilqr.solve(guard=True): a floored-out line search with no
    finite improving trial keeps the incumbent trajectory and stops, instead
    of the reference's unconditional adoption of the last trial
    (AL-ILQR.cpp:149-199).
    """
    U0 = jnp.asarray(U0)
    if U0.shape != (spec.horizon - 1, spec.nu):
        raise ValueError(f"U0 must be [{spec.horizon - 1}, {spec.nu}], got {U0.shape}")
    lam0 = jnp.asarray(init_lambda)
    if lam0.ndim == 1:
        lam0 = jnp.broadcast_to(lam0, (spec.horizon - 1,) + lam0.shape)
    if record and callback is not None:
        raise ValueError("record=True and callback are mutually exclusive")
    if callback is None:
        return _solve_impl(spec, constraints, lam0, U0, int(nb_iter),
                           int(lag_update_step), float(penalty),
                           float(scaling_factor), bool(line_search),
                           bool(early_stop), False, static_kp_steps(spec),
                           guard=bool(guard), record=bool(record))
    cb_id = _register_cb(callback)
    try:
        res = _solve_impl(spec, constraints, lam0, U0, int(nb_iter),
                          int(lag_update_step), float(penalty),
                          float(scaling_factor), bool(line_search),
                          bool(early_stop), True, static_kp_steps(spec),
                          cb_id=jnp.asarray(cb_id, jnp.int32),
                          guard=bool(guard))
        jax.block_until_ready(res)
        return res
    finally:
        _cb_registry.pop(cb_id, None)
