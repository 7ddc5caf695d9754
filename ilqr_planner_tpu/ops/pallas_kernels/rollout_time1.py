"""Whole-trajectory Pallas ROLLOUT kernel for the time-optimal 1st-order
kind (round-5 verdict item 1's forward extension, scoped to the kinds whose
line search cannot use the scan-free affine family).

One kernel call runs the full closed-loop trial rollout
    du_k = K_k (x_k - xo_k) + alpha d_k,   u_k = uo_k + du_k,
    q'   = q + s^2 u_q,  t' = t + s^2      (s = u_k[-1], dt_k = s^2;
                                            PosOrnTimePlannerSys.cpp:154-162)
with the state carry resident in VMEM, double-buffered per-step input DMA
(K, d, xo, uo packed as rows), and per-step (x', u, ||du||^2) streamed out.
The XLA `lax.scan` rollout pays ~20 fusion-boundary HBM round-trips per
step at op-issue latency; here the whole step is one VMEM-resident body.

Limit/keypoint/control costs are NOT computed in-kernel: the caller
assembles them over the returned trajectory (fleet._limit_cost_full +
the static keypoint steps), identical cost VALUES to fleet._rollout up to
reduction order — the same contract as the affine line search
(fleet._run_trials_affine).

Scope: time-optimal, nb_deriv == 1, n == m (= dof + 1). The per-step math
mirrors fleet._rollout's time/1st-order branch exactly (bit-exact X/U/du2
in f64 interpret mode — pinned by tests/test_segment_backward.py).
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["rollout_time1_pallas", "rollout_time1_supported",
           "ROLLOUT_T1_AUTO"]

# Auto-enable for the production 'auto' rollout mode; see
# docs/round5_notes.md for the same-run A/B that set this.
ROLLOUT_T1_AUTO = True

_LS_CANDIDATES = (16, 8, 4, 2, 1)


def _pick_ls(B):
    for ls in _LS_CANDIDATES:
        if B % (ls * 128) == 0:
            return ls
    return None


def rollout_time1_supported(B, n, m, nb_deriv, time, dtype, interpret=False):
    """Static gate for the time-optimal rollout kernel."""
    if nb_deriv != 1 or not time or n != m:
        return False
    if _pick_ls(B) is None:
        return False
    if interpret:
        return True
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return jax.default_backend() in ("tpu", "axon")


def _kernel(alpha_ref, x0_ref, steps_ref, out_ref,
            x_scr, inbuf, outbuf, sem_in, sem_out, *, H, n, m):
    """steps_ref [G, H-1, R, LS, 128] rows: K (m*n, row i*n+j = K[i][j]),
    d (m), xo (n), uo (m). out_ref [G, H-1, n+m+1, LS, 128] rows: x' (n),
    u (m), ||du||^2 (1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    mn = m * n
    dof = m - 1

    def in_copy(t):
        return pltpu.make_async_copy(steps_ref.at[g, t], inbuf.at[t % 2],
                                     sem_in.at[t % 2])

    def out_copy(t):
        return pltpu.make_async_copy(outbuf.at[t % 2], out_ref.at[g, t],
                                     sem_out.at[t % 2])

    a = alpha_ref[0]
    for i in range(n):
        x_scr[i] = x0_ref[0, i]

    def step(t, _):
        in_copy(t).wait()

        @pl.when(t <= H - 3)
        def _():
            in_copy(t + 1).start()

        buf = inbuf.at[t % 2]
        x = [x_scr[i] for i in range(n)]
        diff = [x[j] - buf[mn + m + j] for j in range(n)]
        du = [sum(buf[i * n + j] * diff[j] for j in range(n))
              + a * buf[mn + i] for i in range(m)]
        u = [buf[mn + m + n + i] + du[i] for i in range(m)]
        s = u[m - 1]
        dtk = s * s
        x1 = [x[i] + dtk * u[i] for i in range(dof)] + [x[n - 1] + dtk]
        du2 = sum(v * v for v in du)

        @pl.when(t >= 2)
        def _():
            out_copy(t - 2).wait()
        ob = outbuf.at[t % 2]
        for i in range(n):
            ob[i] = x1[i]
            x_scr[i] = x1[i]
        for i in range(m):
            ob[n + i] = u[i]
        ob[n + m] = du2
        out_copy(t).start()
        return 0

    in_copy(0).start()
    jax.lax.fori_loop(0, H - 1, step, 0)
    if H - 1 >= 2:
        out_copy(H - 3).wait()
    if H - 1 >= 1:
        out_copy(H - 2).wait()


def _run_tile(alpha, x0, steps, H, n, m, LS, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hm1 = H - 1
    dtype = x0.dtype
    R = steps.shape[1]
    RO = n + m + 1
    tile = lambda x: x.reshape(1, *x.shape[:-1], LS, 128)  # noqa: E731
    kern = functools.partial(_kernel, H=H, n=n, m=m)
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, LS, 128), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((1, Hm1, RO, LS, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((n, LS, 128), dtype),            # x carry
            pltpu.VMEM((2, R, LS, 128), dtype),         # input buffer
            pltpu.VMEM((2, RO, LS, 128), dtype),        # output buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.reshape(alpha.astype(dtype), (1,)), tile(x0), tile(steps))
    LB = LS * 128
    Xs = out[0, :, :n].reshape(Hm1, n, LB)
    U = out[0, :, n:n + m].reshape(Hm1, m, LB)
    du2 = out[0, :, n + m].reshape(Hm1, LB)
    return Xs, U, du2


def build_steps(Ks, ds, Xref, Uref):
    """Pack the per-step rollout inputs once per backward pass: the alpha
    trials inside the line-search while_loop share this array (Ks/ds/Xref/
    Uref are loop-invariant there; only alpha changes)."""
    Hm1, m, n, B = Ks.shape
    return jnp.concatenate(
        [Ks.reshape(Hm1, m * n, B), ds, Xref[:-1], Uref], axis=1)


def rollout_time1_pallas(alpha, Ks, ds, Xref, Uref, x0, interpret=False):
    """Closed-loop trial rollout -> (X [H, n, B], U [H-1, m, B],
    du2 [H-1, B]) with du2_k = ||du_k||^2 per step.

    Ks [H-1, m, n, B], ds/Uref [H-1, m, B], Xref [H, n, B] (only rows
    0..H-2 are read — the reference trajectory the gains were cut around),
    x0 [n, B]; alpha a traced scalar.
    """
    Hm1, m, n, B = Ks.shape
    return rollout_from_steps(alpha, build_steps(Ks, ds, Xref, Uref), x0,
                              Hm1 + 1, n, m, interpret)


def rollout_from_steps(alpha, steps, x0, H, n, m, interpret=False):
    """Kernel entry on a pre-packed `build_steps` array (see
    rollout_time1_pallas for the contract)."""
    B = x0.shape[-1]
    Hm1 = H - 1
    if n != m:
        raise ValueError(f"time-optimal rollout kernel needs n == m, got "
                         f"n={n} m={m}")
    LS = _pick_ls(B)
    if LS is None:
        raise ValueError(f"B={B} must be a multiple of 128")
    LB = LS * 128
    G = B // LB
    alpha = jnp.asarray(alpha)

    def run(x0_t, steps_t):
        Xs, U, du2 = _run_tile(alpha, x0_t, steps_t, H, n, m, LS, interpret)
        return Xs, U, du2

    if G == 1:
        Xs, U, du2 = run(x0, steps)
        return jnp.concatenate([x0[None], Xs], axis=0), U, du2

    def body(g, acc):
        Xs_a, U_a, du2_a = acc
        start = g * LB
        sl = lambda a: jax.lax.dynamic_slice_in_dim(  # noqa: E731
            a, start, LB, axis=a.ndim - 1)
        Xs_t, U_t, du2_t = run(sl(x0), sl(steps))
        Xs_a = jax.lax.dynamic_update_slice_in_dim(Xs_a, Xs_t, start, axis=2)
        U_a = jax.lax.dynamic_update_slice_in_dim(U_a, U_t, start, axis=2)
        du2_a = jax.lax.dynamic_update_slice_in_dim(du2_a, du2_t, start,
                                                    axis=1)
        return Xs_a, U_a, du2_a

    init = (jnp.zeros((Hm1, n, B), x0.dtype),
            jnp.zeros((Hm1, m, B), x0.dtype),
            jnp.zeros((Hm1, B), x0.dtype))
    Xs, U, du2 = jax.lax.fori_loop(0, G, body, init)
    return jnp.concatenate([x0[None], Xs], axis=0), U, du2
