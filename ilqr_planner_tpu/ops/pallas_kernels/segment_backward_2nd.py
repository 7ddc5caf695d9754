"""Whole-sweep Pallas backward for the 2ND-ORDER LTI and TIME-OPTIMAL
1st-order kinds.

Round-5 extension of ops/pallas_kernels/segment_backward.py to the
double-integrator dynamics A = I + dt E (E^2 = 0), B = [dt^2/2 I; dt I]
(PosOrnPlannerSys.cpp:125-130): n = 2*dof states, m = dof controls; and
(late round 5) to the sqrt-dt TIME-OPTIMAL first-order dynamics A = I,
B = [[s^2 I, 2 s dq_cmd], [0, 2 s]] (PosOrnTimePlannerSys.cpp:161-162):
n = m = dof + 1, B read from the streamed per-step control. Same design —
(P, p) carry resident in VMEM for the entire sweep, double-buffered
per-step input DMA, deferred-wait output DMA, dense keypoint Hessians
DMA'd only at the static keypoint steps.

The per-step math is NOT re-derived: the kernel body calls the fleet
solver's own trace-level list algebra (`fleet._q_terms` band-structured
Q assembly + `fleet._gains_value` exact collapsed value recursion) on
(LS, 128) vector blocks — those helpers are pure arithmetic over anything
supporting +/-/*, so the XLA path and the kernel run IDENTICAL math by
construction (parity tests pin it bit-close in f64 interpret mode).

Scope: (a) kind='second': nb_deriv == 2, not time-optimal, no AL terms,
m == dof == n/2; (b) kind='time1': nb_deriv == 1, time-optimal, no AL
terms, n == m == dof + 1.
"""

import functools
from types import SimpleNamespace

import jax
import jax.numpy as jnp

__all__ = ["segment_backward_pallas_2nd", "pallas2_backward_supported",
           "PALLAS2_AUTO", "segment_backward_pallas_time1",
           "pallas_time1_backward_supported", "PALLAS_TIME1_AUTO"]

# Auto-enable switch for the production 'auto' backward mode: ON — the
# same-run hardware A/B (in-jit x10, B=4096, H=400 posorn2nd sweep)
# measured 48.65 ms (XLA uniform scan) -> 22.81 ms (this kernel), 2.13x.
# The margin is far larger than the first-order kernel's ~1.2x because the
# 2nd-order XLA scan body compiles to many more fusions per step whose
# boundary intermediates round-trip HBM, all of which the VMEM-resident
# kernel removes. f64 interpret parity < 1e-10 vs the XLA path (identical
# list algebra by construction).
PALLAS2_AUTO = True


# (NT, LS) candidates for the 2nd-order kernel. Unlike the first-order
# kernel, NT = 1 is preferred here pending a measured win from NT = 2: the
# n = 14 body already carries ample instruction-level parallelism, and each
# extra NT multiplies the (large) kernel trace and VMEM working set.
_NT_LS_CANDIDATES_2ND = ((1, 16), (1, 8), (2, 4), (1, 4), (2, 2),
                         (1, 2), (2, 1), (1, 1))


def _pick_nt_ls_2nd(B):
    for nt, ls in _NT_LS_CANDIDATES_2ND:
        if B % (nt * ls * 128) == 0:
            return nt, ls
    return None


def pallas2_backward_supported(B, n, m, nb_deriv, time, has_al, dtype,
                               interpret=False):
    """Static gate for the 2nd-order Pallas sweep."""
    if nb_deriv != 2 or time or has_al or n != 2 * m:
        return False
    if _pick_nt_ls_2nd(B) is None:
        return False
    if interpret:
        return True
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return jax.default_backend() in ("tpu", "axon")


# Auto-enable switch for the time-optimal 1st-order kernel in the 'auto'
# backward mode. ON — same-run hardware A/B (in-jit x20, B=2048, H=100
# timeopt sweep): see docs/round5_notes.md (the time-kind XLA scan body has
# the dense chain-rule column's extra fusion boundaries, same class of win
# as the 2nd-order kernel's 2.13x).
PALLAS_TIME1_AUTO = True


def pallas_time1_backward_supported(B, n, m, nb_deriv, time, has_al, dtype,
                                    interpret=False):
    """Static gate for the time-optimal 1st-order Pallas sweep."""
    if nb_deriv != 1 or not time or has_al or n != m:
        return False
    if _pick_nt_ls_2nd(B) is None:
        return False
    if interpret:
        return True
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return jax.default_backend() in ("tpu", "axon")


def _kernel(params_ref, P0_ref, p0_ref, steps_ref, gxx_ref, kd_ref,
            P_scr, p_scr, inbuf, gxxbuf, outbuf, sem_in, sem_gxx, sem_out,
            *, H, n, m, NT, dt, Rt, kp_slots, kind):
    """One full backward sweep per grid step (NT lane tiles interleaved).

    steps_ref [G, H-1, 2n+m, NT, LS, 128]: rows 0..n-1 limit diag l2,
    n..2n-1 stage gradient lx (keypoint -J^T P e folded), 2n..2n+m-1
    controls u. gxx_ref [G, n_kp, n, n, NT, LS, 128]. kd_ref
    [G, H-1, m, n+1, NT, LS, 128]: K in cols 0..n-1, d in col n.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ilqr_planner_tpu.solvers import fleet as _fleet

    g = pl.program_id(0)
    # trace-time constants (dt/Rt are STATIC here so the fleet algebra's
    # constant folding applies exactly as on the XLA path)
    del params_ref
    if kind == "time1":
        # sqrt-dt time-optimal, first order: n = m = dof + 1; dt comes
        # from the streamed per-step control (PosOrnTimePlannerSys.cpp:
        # 154-162), so cc.dt is unused by _q_terms' time branch
        cc = SimpleNamespace(n=n, m=m, dof=m - 1, nb_deriv=1, time=True,
                             dt=None, Rt=list(Rt))
    else:
        cc = SimpleNamespace(n=n, m=m, dof=m, nb_deriv=2, time=False, dt=dt,
                             Rt=list(Rt))

    def in_copy(t):
        return pltpu.make_async_copy(steps_ref.at[g, t], inbuf.at[t % 2],
                                     sem_in.at[t % 2])

    def out_copy(t):
        return pltpu.make_async_copy(outbuf.at[t % 2], kd_ref.at[g, t],
                                     sem_out.at[t % 2])

    for ti in range(NT):
        for i in range(n):
            p_scr[i, ti] = p0_ref[0, i, ti]
            for j in range(n):
                P_scr[i, j, ti] = P0_ref[0, i, j, ti]

    def step(t, kp_slot):
        in_copy(t).wait()
        @pl.when(t >= 1)
        def _():
            in_copy(t - 1).start()

        buf = inbuf.at[t % 2]
        outs = []
        for ti in range(NT):
            l2 = [buf[i, ti] for i in range(n)]
            lx = [buf[n + i, ti] for i in range(n)]
            ut = [buf[2 * n + i, ti] for i in range(m)]
            P = [[P_scr[i, j, ti] for j in range(n)] for i in range(n)]
            p = [p_scr[i, ti] for i in range(n)]
            gxx = None
            if kp_slot is not None:
                gxx = [[gxxbuf[i, j, ti] for j in range(n)]
                       for i in range(n)]
            # the fleet's own band-structured Q assembly + exact collapsed
            # value recursion, on (LS, 128) blocks
            Quu, Qux, Qu, Qxx, Qx = _fleet._q_terms(cc, P, p, l2, lx, ut,
                                                    gxx)
            outs.append(_fleet._gains_value(Quu, Qux, Qu, Qxx, Qx))

        @pl.when(t <= H - 4)
        def _():
            out_copy(t + 2).wait()
        ob = outbuf.at[t % 2]
        for ti in range(NT):
            P1, p1, K, d = outs[ti]
            for i in range(m):
                ob[i, n, ti] = d[i]
                for j in range(n):
                    ob[i, j, ti] = K[i][j]
            for i in range(n):
                p_scr[i, ti] = p1[i]
                for j in range(n):
                    P_scr[i, j, ti] = P1[i][j]
        out_copy(t).start()

    in_copy(H - 2).start()
    kp_steps = sorted(kp_slots, reverse=True)
    hi = H - 1
    for k in kp_steps:
        if hi - 1 > k:
            def seg_body(it, _, hi=hi):
                step(hi - 1 - it, None)
                return 0
            jax.lax.fori_loop(0, hi - 1 - k, seg_body, 0)
        gc = pltpu.make_async_copy(gxx_ref.at[g, kp_slots[k]], gxxbuf,
                                   sem_gxx)
        gc.start()
        gc.wait()
        step(k, kp_slots[k])
        hi = k
    if hi > 0:
        def seg_body(it, _, hi=hi):
            step(hi - 1 - it, None)
            return 0
        jax.lax.fori_loop(0, hi, seg_body, 0)

    if H - 1 >= 2:
        out_copy(1).wait()
    if H - 1 >= 1:
        out_copy(0).wait()


def _run_tile(steps, P0, p0, gxx, kp_slots, H, n, m, NT, LS, dt, Rt,
              interpret, kind="second"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hm1 = H - 1
    dtype = P0.dtype
    tile = lambda x: x.reshape(1, *x.shape[:-1], NT, LS, 128)  # noqa: E731
    kern = functools.partial(_kernel, H=H, n=n, m=m, NT=NT, dt=dt,
                             Rt=tuple(float(v) for v in Rt),
                             kp_slots=kp_slots, kind=kind)
    params = jnp.zeros((1,), dtype)  # placeholder (constants are static)
    kd = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, n, NT, LS, 128),
                         lambda g: (g, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, NT, LS, 128),
                         lambda g: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((1, Hm1, m, n + 1, NT, LS, 128),
                                       dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, NT, LS, 128), dtype),        # P carry
            pltpu.VMEM((n, NT, LS, 128), dtype),           # p carry
            pltpu.VMEM((2, 2 * n + m, NT, LS, 128), dtype),  # input buffer
            pltpu.VMEM((n, n, NT, LS, 128), dtype),        # gxx buffer
            pltpu.VMEM((2, m, n + 1, NT, LS, 128), dtype),  # output buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(params, tile(P0), tile(p0), tile(steps), tile(gxx))
    LB = NT * LS * 128
    Ks = kd[0, :, :, :n].reshape(Hm1, m, n, LB)
    ds = kd[0, :, :, n].reshape(Hm1, m, LB)
    return Ks, ds


def segment_backward_pallas_2nd(P0, p0, L2, lx, U, gxx, kp_steps, dt, Rt,
                                interpret=False):
    """Full 2nd-order backward sweep -> (Ks [H-1, m, n, B], ds [H-1, m, B]).

    P0 [n, n, B], p0 [n, B]: terminal cost-to-go (keypoint term at H-1
    folded). L2/lx [H-1, n, B]; U [H-1, m, B]; gxx [n_kp, n, n, B] at the
    static `kp_steps`. n must equal 2*m (double integrator).
    """
    if P0.shape[0] != 2 * U.shape[1]:
        raise ValueError(f"2nd-order kernel needs n == 2m, got "
                         f"n={P0.shape[0]} m={U.shape[1]}")
    return _segment_backward(P0, p0, L2, lx, U, gxx, kp_steps, dt, Rt,
                             interpret, "second")


def segment_backward_pallas_time1(P0, p0, L2, lx, U, gxx, kp_steps, Rt,
                                  interpret=False):
    """Full time-optimal 1st-order backward sweep (same contract as the
    2nd-order entry). n must equal m (= dof + 1, the sqrt-dt control
    appended, PosOrnTimePlannerSys.cpp:67-69); the per-step durations
    dt_k = s_k^2 come from the streamed controls U."""
    if P0.shape[0] != U.shape[1]:
        raise ValueError(f"time-optimal kernel needs n == m, got "
                         f"n={P0.shape[0]} m={U.shape[1]}")
    return _segment_backward(P0, p0, L2, lx, U, gxx, kp_steps, None, Rt,
                             interpret, "time1")


def _segment_backward(P0, p0, L2, lx, U, gxx, kp_steps, dt, Rt, interpret,
                      kind):
    n, _, B = P0.shape
    Hm1, m = U.shape[0], U.shape[1]
    H = Hm1 + 1
    dtype = P0.dtype
    cfg = _pick_nt_ls_2nd(B)
    if cfg is None:
        raise ValueError(f"B={B} must be a multiple of 128")
    NT, LS = cfg
    LB = NT * LS * 128
    G = B // LB
    kp_steps = tuple(int(k) for k in kp_steps)
    kp_slots = {k: i for i, k in enumerate(kp_steps)}

    steps = jnp.concatenate([L2, lx, U], axis=1)       # [H-1, 2n+m, B]
    if not len(kp_steps):
        gxx = jnp.zeros((1, n, n, B), dtype)

    if G == 1:
        return _run_tile(steps, P0, p0, gxx, kp_slots, H, n, m, NT, LS,
                         dt, Rt, interpret, kind)

    def body(g, acc):
        Ks_acc, ds_acc = acc
        start = g * LB
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, LB,  # noqa: E731
                                                    axis=a.ndim - 1)
        Ks_t, ds_t = _run_tile(sl(steps), sl(P0), sl(p0), sl(gxx), kp_slots,
                               H, n, m, NT, LS, dt, Rt, interpret, kind)
        Ks_acc = jax.lax.dynamic_update_slice_in_dim(Ks_acc, Ks_t, start,
                                                     axis=3)
        ds_acc = jax.lax.dynamic_update_slice_in_dim(ds_acc, ds_t, start,
                                                     axis=2)
        return Ks_acc, ds_acc

    init = (jnp.zeros((Hm1, m, n, B), dtype), jnp.zeros((Hm1, m, B), dtype))
    return jax.lax.fori_loop(0, G, body, init)
