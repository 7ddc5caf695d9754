"""Keypoint-sparse fleet backward sweep as ONE Pallas TPU kernel.

This is the round-3 roofline's named lever (docs/roofline.md): the fleet
solver's backward (solvers/fleet.py:_backward) runs the reference Riccati
recursion (ILQRRecursive.cpp:73-97) lane-major, but as a lax.scan whose
~3.5k-vector-op body compiles to dozens of XLA fusions per step — the
per-step fusion launches and the HBM round-trips of the (P, p) carry and
boundary intermediates dominate the ~5 kFLOP of real work. Here the WHOLE
sweep (all H-1 steps, including the statically-known keypoint steps) runs
as one kernel invocation per lane-tile group:

  * the (P, p) cost-to-go carry lives in VMEM scratch for the entire sweep
    — it never touches HBM;
  * per-step inputs (limit-penalty diagonal, stage gradient, controls)
    stream HBM -> VMEM with a double-buffered async copy (the next step's
    input loads while the current step computes);
  * gains (K, d) stream VMEM -> HBM with a deferred-wait store;
  * the dense keypoint Hessians J^T P J enter ONLY at the static keypoint
    steps (DMA'd there and nowhere else) — the keypoint sparsity that the
    round-2 dense kernel (ops/pallas_kernels/riccati.py) lost 3x to;
  * (round 5) each kernel invocation carries NT INDEPENDENT lane tiles and
    interleaves their recursions in one body: the per-step math is a serial
    Cholesky/solve dependency chain, so a second independent chain gives
    the Mosaic scheduler work to overlap latency with. Honestly measured
    (same-run, in-jit x20): NT=2/LS=8 4.50 ms vs NT=1/LS=16 4.59 ms per
    B=8192 sweep (~2%; an earlier 1.2x reading was intra-run tunnel
    drift), NT=2/LS=16 and NT=4 regress on VMEM working-set pressure.
    Kept because (2, 8) never measured worse; values are bit-exact.

Scope: the first-order LTI kinds (A = I, B = dt I, m = n —
PosOrnPlannerSys.cpp:119-123 and the joint/point kinds), no AL terms.
Everything else stays on the XLA uniform-scan path.

Per-step math: the exact algebraic reduction of the reference recursion
for the first-order LTI case (see fleet._gains_value_lti1 and the in-kernel
comment): with M = dt^2 P + diag(Rt + reg), the regularized gains and the
UNregularized value recursion (ILQRRecursive.cpp:89-94) collapse to a
Cholesky inverse of M plus diagonal scalings — the large mutually-
cancelling P-dependent products are never formed.

Lane layout: scenarios struct-of-arrays with the lane axis as trailing
[NT, LS, 128] dims (a contiguous minor-axis split of B — no transposes);
every small-matrix element is one (LS, 128) vector block per tile, every
scalar op in the recursion an (LS, 128)-wide vector op over all lanes of
that tile.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["segment_backward_pallas", "pallas_backward_supported"]


# (NT, LS) candidates, best first, from the same-run in-jit x20 sweep at
# B=8192 (single-call timings sit on the tunnel's ~30 ms round-trip floor;
# the round-4 "~30 us/step/tile" figure was that artifact — real cost
# ~5.8 us/step/1024-lane tile): (2, 8) 4.50 ms, (1, 16) 4.59, (2, 16) 5.45
# and (4, 8) 5.49 (VMEM working-set pressure), LS = 32 regressed earlier.
_NT_LS_CANDIDATES = ((2, 8), (1, 16), (2, 4), (1, 8), (2, 2),
                     (1, 4), (2, 1), (1, 2), (1, 1))


def _pick_nt_ls(B):
    """Best (NT, LS) whose NT*LS*128-lane group divides B; None when B is
    not a multiple of 128.

    (Measured dead ends, kept for the record: whole-batch LS = B/128 with
    G = 1 OOMs scoped VMEM at LS = 72, and a B-minor output layout via
    strided DMA slices faulted the TPU worker — docs/round4_notes.md.)"""
    for nt, ls in _NT_LS_CANDIDATES:
        if B % (nt * ls * 128) == 0:
            return nt, ls
    return None


def _pick_ls(B):
    """Back-compat helper: the LS of the picked (NT, LS) config."""
    cfg = _pick_nt_ls(B)
    return None if cfg is None else cfg[1]


def pallas_backward_supported(B, n, m, nb_deriv, time, has_al, dtype,
                              interpret=False):
    """Static gate for the Pallas sweep: first-order LTI (m == n), no AL,
    lane count tileable, f32 on a real TPU (any dtype under interpret)."""
    if nb_deriv != 1 or time or has_al or m != n:
        return False
    if _pick_nt_ls(B) is None:
        return False
    if interpret:
        return True
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _kernel(params_ref, P0_ref, p0_ref, steps_ref, gxx_ref, kd_ref,
            P_scr, p_scr, inbuf, gxxbuf, outbuf, sem_in, sem_gxx, sem_out,
            *, H, n, NT, kp_slots):
    """One full backward sweep per grid step (one group of NT lane tiles).

    steps_ref [G, H-1, 3n, NT, LS, 128]: rows 0..n-1 = limit diag l2
    (already squared, System.cpp:286-308), n..2n-1 = stage gradient lx
    (keypoint -J^T P e folded in at keypoint steps), 2n..3n-1 = controls u.
    gxx_ref [G, n_kp, n, n, NT, LS, 128]: dense keypoint Hessians at the
    static inner keypoint steps; kp_slots maps step t -> slot (host-side).
    kd_ref [G, H-1, n, n+1, NT, LS, 128]: K in cols 0..n-1, d in col n.
    The NT tiles are mathematically independent; their recursions are
    emitted interleaved per step so the scheduler overlaps the serial
    Cholesky chains.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    dt = params_ref[0]
    reg = params_ref[1]
    r = [params_ref[2 + i] for i in range(n)]
    dt2 = dt * dt
    inv_dt = 1.0 / dt
    inv_dt2 = inv_dt * inv_dt
    rr_ = [r[i] + reg for i in range(n)]

    def in_copy(t):
        return pltpu.make_async_copy(steps_ref.at[g, t], inbuf.at[t % 2],
                                     sem_in.at[t % 2])

    def out_copy(t):
        return pltpu.make_async_copy(outbuf.at[t % 2], kd_ref.at[g, t],
                                     sem_out.at[t % 2])

    # carry <- terminal value (computed outside: keypoint term at H-1)
    for ti in range(NT):
        for i in range(n):
            p_scr[i, ti] = p0_ref[0, i, ti]
            for j in range(n):
                P_scr[i, j, ti] = P0_ref[0, i, j, ti]

    def tile_math(l2, lx, ut, P, p, stage_gxx):
        """One tile's step: the exact algebraic reduction of the reference
        recursion for the first-order LTI case. With M = Quu + reg I =
        dt^2 P + diag(rr_) and K/d from the regularized solve
        (ILQRRecursive.cpp:89-91), substituting M K = -Qux, M d = -Qu into
        the UNregularized value recursion (cpp:93-94) collapses every
        P-dependent product:
          K  = (M^-1 diag(rr_) - I) / dt
          d  = -M^-1 Qu,      Qu = Rt u + dt p
          P1 = stage + (diag(rr_) - diag(rr_) M^-1 diag(rr_)) / dt^2
               - reg K^T K
          p1 = lx - (Rt u + diag(rr_) d) / dt - reg K^T d
        Identical math to fleet._gains_value_lti1, numerically MORE stable
        (the large mutually-cancelling terms are never formed)."""
        M = [[dt2 * P[i][j] + (rr_[i] if i == j else 0.0) for j in range(n)]
             for i in range(n)]

        # Cholesky M = L L^T (SPD + ridge), then Minv by substitution on I.
        L = [[None] * n for _ in range(n)]
        Li = [None] * n
        for j in range(n):
            acc = M[j][j]
            for k in range(j):
                acc = acc - L[j][k] * L[j][k]
            Ljj = jnp.sqrt(acc)
            L[j][j] = Ljj
            Li[j] = 1.0 / Ljj
            for i in range(j + 1, n):
                acc = M[i][j]
                for k in range(j):
                    acc = acc - L[i][k] * L[j][k]
                L[i][j] = acc * Li[j]
        Minv = [[None] * n for _ in range(n)]
        for c in range(n):
            y = [None] * n
            for i in range(c, n):
                if i == c:
                    y[i] = Li[c]
                else:
                    y[i] = -sum(L[i][k] * y[k] for k in range(c, i)) * Li[i]
            for i in range(n - 1, c - 1, -1):
                acc = y[i]
                for k in range(i + 1, n):
                    acc = acc - L[k][i] * Minv[k][c]
                Minv[i][c] = acc * Li[i]
            for i in range(c, n):
                Minv[c][i] = Minv[i][c]

        K = [[(Minv[i][j] * rr_[j] - (1.0 if i == j else 0.0)) * inv_dt
              for j in range(n)] for i in range(n)]
        Qu = [r[i] * ut[i] + dt * p[i] for i in range(n)]
        d = [-sum(Minv[i][k] * Qu[k] for k in range(n)) for i in range(n)]

        P1 = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                acc = ((rr_[i] if i == j else 0.0)
                       - rr_[i] * Minv[i][j] * rr_[j]) * inv_dt2
                acc = acc - reg * sum(K[k][i] * K[k][j] for k in range(n))
                # same add order as fleet._gains_value_lti1: diagonal limit
                # term first, dense keypoint term second
                if i == j:
                    acc = acc + l2[i]
                if stage_gxx is not None:
                    acc = acc + stage_gxx[i][j]
                P1[i][j] = acc
                if j != i:
                    P1[j][i] = acc
        p1 = [lx[i] - (r[i] * ut[i] + rr_[i] * d[i]) * inv_dt
              - reg * sum(K[k][i] * d[k] for k in range(n))
              for i in range(n)]
        return P1, p1, K, d

    def step(t, kp_slot):
        """One backward step at traced time t for ALL NT tiles; kp_slot is
        a STATIC slot index into gxx_ref (None at non-keypoint steps)."""
        in_copy(t).wait()
        # prefetch the next (earlier) step while this one computes
        @pl.when(t >= 1)
        def _():
            in_copy(t - 1).start()

        buf = inbuf.at[t % 2]
        outs = []
        for ti in range(NT):
            l2 = [buf[i, ti] for i in range(n)]
            lx = [buf[n + i, ti] for i in range(n)]
            ut = [buf[2 * n + i, ti] for i in range(n)]
            P = [[P_scr[i, j, ti] for j in range(n)] for i in range(n)]
            p = [p_scr[i, ti] for i in range(n)]
            stage_gxx = None
            if kp_slot is not None:
                stage_gxx = [[gxxbuf[i, j, ti] for j in range(n)]
                             for i in range(n)]
            outs.append(tile_math(l2, lx, ut, P, p, stage_gxx))

        # stream out K, d (deferred wait: the slot's previous store was
        # issued two steps ago at t + 2)
        @pl.when(t <= H - 4)
        def _():
            out_copy(t + 2).wait()
        ob = outbuf.at[t % 2]
        for ti in range(NT):
            P1, p1, K, d = outs[ti]
            for i in range(n):
                ob[i, n, ti] = d[i]
                for j in range(n):
                    ob[i, j, ti] = K[i][j]
            for i in range(n):
                p_scr[i, ti] = p1[i]
                for j in range(n):
                    P_scr[i, j, ti] = P1[i][j]
        out_copy(t).start()

    # kick off the first input load, then walk the static segment structure
    in_copy(H - 2).start()
    kp_steps = sorted(kp_slots, reverse=True)
    hi = H - 1
    for k in kp_steps:
        if hi - 1 > k:
            def seg_body(it, _, hi=hi):
                step(hi - 1 - it, None)
                return 0
            jax.lax.fori_loop(0, hi - 1 - k, seg_body, 0)
        # static keypoint step: blocking gxx load + dense-stage step
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

    # drain the last two in-flight stores
    if H - 1 >= 2:
        out_copy(1).wait()
    if H - 1 >= 1:
        out_copy(0).wait()


# ---------------------------------------------------------------------------
# wrapper: lane-minor [.., B] arrays <-> (G, .., NT, LS, 128) groups
# ---------------------------------------------------------------------------

def _run_tile(steps, P0, p0, gxx, params, kp_slots, H, n, NT, LS, interpret):
    """One lane group ([.., NT*LS*128] minor axis): reshape to
    (NT, LS, 128) blocks (contiguous — FREE, no transpose) and run the
    whole-sweep kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hm1 = H - 1
    dtype = P0.dtype
    tile = lambda x: x.reshape(1, *x.shape[:-1], NT, LS, 128)  # noqa: E731
    kern = functools.partial(_kernel, H=H, n=n, NT=NT, kp_slots=kp_slots)
    kd = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # params
            pl.BlockSpec((1, n, n, NT, LS, 128),
                         lambda g: (g, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),                 # P0
            pl.BlockSpec((1, n, NT, LS, 128),
                         lambda g: (g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),                 # p0
            pl.BlockSpec(memory_space=pl.ANY),                     # steps
            pl.BlockSpec(memory_space=pl.ANY),                     # gxx
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((1, Hm1, n, n + 1, NT, LS, 128),
                                       dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, NT, LS, 128), dtype),       # P carry
            pltpu.VMEM((n, NT, LS, 128), dtype),          # p carry
            pltpu.VMEM((2, 3 * n, NT, LS, 128), dtype),   # input dbl buffer
            pltpu.VMEM((n, n, NT, LS, 128), dtype),       # gxx buffer
            pltpu.VMEM((2, n, n + 1, NT, LS, 128), dtype),  # output dbl buf
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(params, tile(P0), tile(p0), tile(steps), tile(gxx))
    LB = NT * LS * 128
    Ks = kd[0, :, :, :n].reshape(Hm1, n, n, LB)
    ds = kd[0, :, :, n].reshape(Hm1, n, LB)
    return Ks, ds


def segment_backward_pallas(P0, p0, L2, lx, U, gxx, kp_steps, dt, Rt,
                            reg=1e-6, interpret=False):
    """Full backward sweep -> (Ks [H-1, n, n, B], ds [H-1, n, B]).

    P0 [n, n, B], p0 [n, B]: terminal cost-to-go (keypoint term at H-1
    already folded). L2/lx [H-1, n, B]: per-step limit diagonal and stage
    gradient (keypoint -J^T P e folded at keypoint steps). U [H-1, n, B].
    gxx [n_kp, n, n, B] + static kp_steps tuple: dense keypoint Hessians at
    the inner keypoint steps (may be empty).

    Lane groups are processed as a fori_loop over MINOR-axis slices of the
    lane axis (dynamic_slice / dynamic_update_slice), so the wrapper never
    transposes the gains array — the round-2 grid-over-tiles design paid
    two such ~200 MB transposes per backward call, ~35% of the whole solve.
    """
    n, _, B = P0.shape
    Hm1 = U.shape[0]
    H = Hm1 + 1
    dtype = P0.dtype
    cfg = _pick_nt_ls(B)
    if cfg is None:
        raise ValueError(f"B={B} must be a multiple of 128")
    NT, LS = cfg
    LB = NT * LS * 128
    G = B // LB
    kp_steps = tuple(int(k) for k in kp_steps)
    kp_slots = {k: i for i, k in enumerate(kp_steps)}

    steps = jnp.concatenate([L2, lx, U], axis=1)       # [H-1, 3n, B]
    if not len(kp_steps):
        gxx = jnp.zeros((1, n, n, B), dtype)
    params = jnp.concatenate([
        jnp.asarray([dt, reg], dtype), jnp.asarray(Rt, dtype).reshape(n)])

    if G == 1:
        return _run_tile(steps, P0, p0, gxx, params, kp_slots, H, n, NT, LS,
                         interpret)

    def body(g, acc):
        Ks_acc, ds_acc = acc
        start = g * LB
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, LB,  # noqa: E731
                                                    axis=a.ndim - 1)
        Ks_t, ds_t = _run_tile(sl(steps), sl(P0), sl(p0), sl(gxx), params,
                               kp_slots, H, n, NT, LS, interpret)
        Ks_acc = jax.lax.dynamic_update_slice_in_dim(Ks_acc, Ks_t, start,
                                                     axis=3)
        ds_acc = jax.lax.dynamic_update_slice_in_dim(ds_acc, ds_t, start,
                                                     axis=2)
        return Ks_acc, ds_acc

    init = (jnp.zeros((Hm1, n, n, B), dtype), jnp.zeros((Hm1, n, B), dtype))
    return jax.lax.fori_loop(0, G, body, init)
