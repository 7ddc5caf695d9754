"""Fused quadratization + Riccati backward sweep as a Pallas TPU kernel.

The hot loop of the recursive solver (ILQRRecursive.cpp:73-97) for the
structured first-order systems (A = I, B = dt I — PosOrnPlannerSys.cpp:
119-123 and the joint/point kinds): per time step, build the Gauss-Newton
stage terms l_x = -J^T Q e - L q, l_xx = J^T Q J + diag(L^2)
(System.cpp:248-308), fold them into the value recursion, invert the
regularized Quu, and emit the gains K, d.

TPU mapping: scenarios are laid out struct-of-arrays with the lane axis
shaped (LS, 128) as the trailing two dims, so every small-matrix element is
one (LS, 128) VPU tile and each n x n matrix op unrolls into n^2..n^3 vector
FMAs over all lanes at once. Per-step inputs stream HBM -> VMEM with async
DMA; the (P, p) value state lives in VMEM scratch across the whole sweep;
the n x n Quu inverse is an in-register Gauss-Jordan without pivoting (Quu
is SPD plus the reference's 1e-6 ridge, ILQRRecursive.cpp:89).

Hardware status (TPU v5e, B=4096, H=100; bench_pallas_probe.py and
bench_pallas_vs_fleet.py at the repo root, logs in docs/): compiles and
matches on real TPU, 32.8x faster than the batch-leading-axis XLA reference
below — but the production batch path (solvers/fleet.py) runs the same
lane-major sweep keypoint-sparse in plain XLA and wins 3x end-to-end, so
this kernel is the layout oracle, not the production backward.

`riccati_backward_reference` is the same math in plain JAX — the test
oracle and the non-TPU fallback. Both take batched arrays:

  J  [B, H, nq, n]   residual Jacobians per step
  e  [B, H, nq]      residuals (keypoint-masked)
  ld [B, H, n]       limit-penalty diagonal; lq [B, H, n] violations
  u  [B, H-1, n]     controls
  prec [H, nq, nq]   precisions (lane-invariant)
  -> K [B, H-1, n, n], d [B, H-1, n]
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["riccati_backward_structured", "riccati_backward_reference"]


# ---------------------------------------------------------------------------
# plain-JAX reference (also the non-TPU fallback)
# ---------------------------------------------------------------------------

def riccati_backward_reference(J, e, ld, lq, u, prec, Rt, dt, reg=1e-6):
    """Structured backward sweep in plain JAX, batched over the lead axis."""
    B, H, nq, n = J.shape
    dtype = J.dtype
    dt = jnp.asarray(dt, dtype)

    QJ = jnp.einsum("hac,bhcj->bhaj", prec, J)      # Q J
    Qe = jnp.einsum("hac,bhc->bha", prec, e)        # Q e
    lxx = jnp.einsum("bhai,bhaj->bhij", J, QJ) + jax.vmap(jax.vmap(jnp.diag))(ld * ld)
    lx = -jnp.einsum("bhai,bha->bhi", J, Qe) - ld * lq

    eye = jnp.eye(n, dtype=dtype)
    Rdiag = jnp.asarray(Rt, dtype)

    def bstep(carry, inp):
        P, p = carry
        lxx_t, lx_t, u_t = inp
        Quu = jnp.diag(Rdiag)[None] + dt * dt * P
        Qux = dt * P
        Qxx = lxx_t + P
        Qu = Rdiag * u_t + dt * p
        Qx = lx_t + p
        Minv = -jnp.linalg.inv(Quu + reg * eye[None])
        K = Minv @ Qux
        d = jnp.einsum("bij,bj->bi", Minv, Qu)
        KT = jnp.swapaxes(K, -1, -2)
        P1 = Qxx + KT @ Quu @ K + KT @ Qux + jnp.swapaxes(Qux, -1, -2) @ K
        p1 = (Qx + jnp.einsum("bji,bjk,bk->bi", K, Quu, d)
              + jnp.einsum("bji,bj->bi", K, Qu)
              + jnp.einsum("bij,bj->bi", jnp.swapaxes(Qux, -1, -2), d))
        return (P1, p1), (K, d)

    PN = lxx[:, -1]
    pN = lx[:, -1]
    scan_in = (jnp.swapaxes(lxx[:, :-1], 0, 1), jnp.swapaxes(lx[:, :-1], 0, 1),
               jnp.swapaxes(u, 0, 1))
    (_, _), (Ks, ds) = jax.lax.scan(bstep, (PN, pN), scan_in, reverse=True)
    return jnp.swapaxes(Ks, 0, 1), jnp.swapaxes(ds, 0, 1)


# ---------------------------------------------------------------------------
# Pallas kernel helpers: n x n algebra over (LS, 128)-tile elements
# ---------------------------------------------------------------------------

def _mm(A, B_, n, m, k):
    out = []
    for i in range(n):
        row = []
        for j in range(k):
            acc = A[i][0] * B_[0][j]
            for s in range(1, m):
                acc = acc + A[i][s] * B_[s][j]
            row.append(acc)
        out.append(row)
    return out


def _mv(A, x, n, m):
    out = []
    for i in range(n):
        acc = A[i][0] * x[0]
        for s in range(1, m):
            acc = acc + A[i][s] * x[s]
        out.append(acc)
    return out


def _transpose(A, n, m):
    return [[A[i][j] for i in range(n)] for j in range(m)]


def _gauss_jordan_inv(M, n):
    """Gauss-Jordan inverse without pivoting, elementwise over all lanes."""
    A = [row[:] for row in M]
    inv = [[jnp.ones_like(A[0][0]) if i == j else jnp.zeros_like(A[0][0])
            for j in range(n)] for i in range(n)]
    for k in range(n):
        piv = 1.0 / A[k][k]
        A[k] = [a * piv for a in A[k]]
        inv[k] = [a * piv for a in inv[k]]
        for r in range(n):
            if r == k:
                continue
            f = A[r][k]
            A[r] = [a - f * b for a, b in zip(A[r], A[k])]
            inv[r] = [a - f * b for a, b in zip(inv[r], inv[k])]
    return inv


def _kernel(prec_ref, params_ref, J_ref, e_ref, ld_ref, lq_ref, u_ref,
            K_ref, d_ref, P_scr, p_scr, jbuf, ebuf, ldbuf, lqbuf, ubuf,
            kbuf, dbuf, sem_in, sem_out, *, H, nq, n):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    dt = params_ref[0]
    reg = params_ref[1]
    r = [params_ref[2 + i] for i in range(n)]

    def load_step(t, with_u):
        cps = [
            pltpu.make_async_copy(J_ref.at[g, t], jbuf, sem_in.at[0]),
            pltpu.make_async_copy(e_ref.at[g, t], ebuf, sem_in.at[1]),
            pltpu.make_async_copy(ld_ref.at[g, t], ldbuf, sem_in.at[2]),
            pltpu.make_async_copy(lq_ref.at[g, t], lqbuf, sem_in.at[3]),
        ]
        if with_u:
            cps.append(pltpu.make_async_copy(u_ref.at[g, t], ubuf, sem_in.at[4]))
        for c in cps:
            c.start()
        for c in cps:
            c.wait()

    def stage_terms(t):
        Jt = [[jbuf[a, i] for i in range(n)] for a in range(nq)]
        et = [ebuf[a] for a in range(nq)]
        ldt = [ldbuf[i] for i in range(n)]
        lqt = [lqbuf[i] for i in range(n)]
        # QJ[a][i] = sum_c prec[t, a, c] * J[c][i]; Qe[a] likewise
        QJ, Qe = [], []
        for a in range(nq):
            row = []
            for i in range(n):
                acc = prec_ref[t, a, 0] * Jt[0][i]
                for c in range(1, nq):
                    acc = acc + prec_ref[t, a, c] * Jt[c][i]
                row.append(acc)
            QJ.append(row)
            acc = prec_ref[t, a, 0] * et[0]
            for c in range(1, nq):
                acc = acc + prec_ref[t, a, c] * et[c]
            Qe.append(acc)
        lxx = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(n):
                acc = Jt[0][i] * QJ[0][j]
                for a in range(1, nq):
                    acc = acc + Jt[a][i] * QJ[a][j]
                if i == j:
                    acc = acc + ldt[i] * ldt[i]
                lxx[i][j] = acc
        lx = []
        for i in range(n):
            acc = Jt[0][i] * Qe[0]
            for a in range(1, nq):
                acc = acc + Jt[a][i] * Qe[a]
            lx.append(-acc - ldt[i] * lqt[i])
        return lxx, lx

    # terminal step
    load_step(H - 1, with_u=False)
    lxxN, lxN = stage_terms(H - 1)
    for i in range(n):
        p_scr[i] = lxN[i]
        for j in range(n):
            P_scr[i, j] = lxxN[i][j]

    def body(it, _):
        t = H - 2 - it
        load_step(t, with_u=True)
        lxx, lx = stage_terms(t)
        P = [[P_scr[i, j] for j in range(n)] for i in range(n)]
        p = [p_scr[i] for i in range(n)]
        ut = [ubuf[i] for i in range(n)]

        Quu_reg = [[dt * dt * P[i][j] + ((r[i] + reg) if i == j else 0.0)
                    for j in range(n)] for i in range(n)]
        Qux = [[dt * P[i][j] for j in range(n)] for i in range(n)]
        Qu = [r[i] * ut[i] + dt * p[i] for i in range(n)]
        Qx = [lx[i] + p[i] for i in range(n)]

        Minv = _gauss_jordan_inv(Quu_reg, n)
        negM = [[-Minv[i][j] for j in range(n)] for i in range(n)]
        K = _mm(negM, Qux, n, n, n)
        d = _mv(negM, Qu, n, n)

        # value recursion uses the UNregularized Quu (ILQRRecursive.cpp:93)
        Quu = [[Quu_reg[i][j] - (reg if i == j else 0.0) for j in range(n)]
               for i in range(n)]
        KT = _transpose(K, n, n)
        KTQ = _mm(KT, Quu, n, n, n)
        KTQK = _mm(KTQ, K, n, n, n)
        KTQux = _mm(KT, Qux, n, n, n)
        QxuK = _mm(_transpose(Qux, n, n), K, n, n, n)
        for i in range(n):
            for j in range(n):
                P_scr[i, j] = (lxx[i][j] + P[i][j] + KTQK[i][j]
                               + KTQux[i][j] + QxuK[i][j])
        KTQd = _mv(KTQ, d, n, n)
        KTQu = _mv(KT, Qu, n, n)
        Qxud = _mv(_transpose(Qux, n, n), d, n, n)
        for i in range(n):
            p_scr[i] = Qx[i] + KTQd[i] + KTQu[i] + Qxud[i]

        for i in range(n):
            dbuf[i] = d[i]
            for j in range(n):
                kbuf[i, j] = K[i][j]
        ck = pltpu.make_async_copy(kbuf, K_ref.at[g, t], sem_out.at[0])
        cd = pltpu.make_async_copy(dbuf, d_ref.at[g, t], sem_out.at[1])
        ck.start()
        cd.start()
        ck.wait()
        cd.wait()
        return 0

    jax.lax.fori_loop(0, H - 1, body, 0)


def riccati_backward_structured(J, e, ld, lq, u, prec, Rt, dt, reg=1e-6,
                                lane_sublanes=8, interpret=False):
    """Pallas-fused structured backward sweep.

    B must be a multiple of lane_sublanes * 128 (pad the scenario batch to
    fill lane tiles). Falls back to the plain-JAX reference on non-TPU
    backends unless `interpret=True` forces the kernel interpreter.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, nq, n = J.shape
    LS = lane_sublanes
    LB = LS * 128
    if B % LB:
        raise ValueError(f"B={B} must be a multiple of {LB} lanes")
    G = B // LB
    dtype = J.dtype

    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return riccati_backward_reference(J, e, ld, lq, u, prec, Rt, dt, reg)

    def soa(x, inner):
        # [B, T, *inner] -> [G, T, *inner, LS, 128]
        T = x.shape[1]
        x = x.reshape(G, LB, T, *inner)
        x = jnp.moveaxis(x, 1, -1)
        return x.reshape(G, T, *inner, LS, 128)

    J_s = soa(J, (nq, n))
    e_s = soa(e, (nq,))
    ld_s = soa(ld, (n,))
    lq_s = soa(lq, (n,))
    u_s = soa(u, (n,))

    params = jnp.concatenate([
        jnp.asarray([dt, reg], dtype), jnp.asarray(Rt, dtype).reshape(n)
    ])

    kern = functools.partial(_kernel, H=H, nq=nq, n=n)

    K_s, d_s = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prec
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pl.ANY),      # J
            pl.BlockSpec(memory_space=pl.ANY),      # e
            pl.BlockSpec(memory_space=pl.ANY),      # ld
            pl.BlockSpec(memory_space=pl.ANY),      # lq
            pl.BlockSpec(memory_space=pl.ANY),      # u
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, H - 1, n, n, LS, 128), dtype),
            jax.ShapeDtypeStruct((G, H - 1, n, LS, 128), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, n, LS, 128), dtype),   # P
            pltpu.VMEM((n, LS, 128), dtype),      # p
            pltpu.VMEM((nq, n, LS, 128), dtype),  # J buffer
            pltpu.VMEM((nq, LS, 128), dtype),     # e buffer
            pltpu.VMEM((n, LS, 128), dtype),      # ld buffer
            pltpu.VMEM((n, LS, 128), dtype),      # lq buffer
            pltpu.VMEM((n, LS, 128), dtype),      # u buffer
            pltpu.VMEM((n, n, LS, 128), dtype),   # K write buffer
            pltpu.VMEM((n, LS, 128), dtype),      # d write buffer
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(prec.astype(dtype), params, J_s, e_s, ld_s, lq_s, u_s)

    def unsoa(x, inner):
        T = x.shape[1]
        x = x.reshape(G, T, *inner, LB)
        x = jnp.moveaxis(x, -1, 1)
        return x.reshape(B, T, *inner)

    return unsoa(K_s, (n, n)), unsoa(d_s, (n,))
