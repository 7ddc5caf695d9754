"""Lane-major (struct-of-arrays) fleet solver for first-order systems.

The vmapped recursive solver (parallel.solve_batch) is layout-bound on TPU:
with the scenario batch as the LEADING axis, XLA lays each small matrix's
trailing dims (7..15) onto the 128-wide vector lanes, so every elementwise
op and small matmul runs at ~5% lane utilization. This module re-expresses
the whole solve — rollouts, FK, quaternion residuals, limit penalties, the
Riccati backward sweep, line search, early stopping — with the scenario
batch as the MINOR (trailing) axis and every small-matrix dimension unrolled
at trace time into Python lists of [B] vectors. Each n x n operation becomes
n^2..n^3 fused vector FMAs over all B lanes at once (the same layout the
Pallas kernel in ops/pallas_kernels/riccati.py uses, here in plain XLA so it
fuses with everything around it and runs on any backend).

Numerics are the sparse recursive-solver path bit-for-bit in structure
(ilqr._solve_body_sparse): identical alpha schedule (1, 1/2, ..., 2^-10,
first acceptable trial adopted, last trial on floor-out —
ILQRRecursive.cpp:101-157), identical 1e-6-regularized gain elimination
(ILQRRecursive.cpp:89-91), identical early stop
alpha*sqrt(sum_k ||du_k||) < 1e-3 && cost < 1e-3 (ILQRRecursive.cpp:174),
identical Gauss-Newton quadratization (System.cpp:248-311) and keypoint
residuals (PosOrnKeypoint.cpp:24-45, sd.h:48-82). Differences are reduction
orders (~1 ulp in f32).

Scope: first-order (nb_deriv=1) kinds — 'posorn', 'joint', 'point' and the
time-optimal 'posorn_time' / 'joint_time' (sqrt-dt control,
PosOrnTimePlannerSys.cpp:149-184) — with chain robots. Per-scenario
variation: the initial state x0. Other kinds fall back to
parallel.solve_batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_planner_tpu.solvers.ilqr import ILQRResult
from ilqr_planner_tpu.systems.spec import Spec

__all__ = ["make_fleet_solver", "fleet_supported"]


def fleet_supported(spec: Spec) -> bool:
    """True when this spec is in the lane-major solver's fast-path scope."""
    return (
        spec.kind in ("posorn", "joint", "point", "posorn_time", "joint_time")
        and spec.nb_deriv == 1
        and (spec.kind in ("joint", "joint_time")
             or (spec.robot.kind == "chain" and spec.robot.frame is None))
    )


# ---------------------------------------------------------------------------
# host-side constant extraction
# ---------------------------------------------------------------------------

class _Consts:
    """Concrete (numpy) problem constants, folded into the trace."""

    def __init__(self, spec: Spec):
        if not fleet_supported(spec):
            raise ValueError(
                f"fleet solver supports first-order posorn/joint/point/"
                f"posorn_time/joint_time chain specs; got kind={spec.kind!r} "
                f"nb_deriv={spec.nb_deriv}"
            )
        self.kind = spec.kind
        self.n = spec.nx
        self.m = spec.nu
        self.dof = spec.dof
        self.time = bool(spec.time_optimal)
        self.H = spec.horizon
        self.np_dtype = np.dtype(jnp.dtype(spec.x0.dtype).name)
        f = lambda a: np.asarray(a, self.np_dtype)
        self.dt = None if self.time else float(f(spec.dt))
        self.Rt = [float(v) for v in f(spec.Rt)]
        self.limits_set = spec.limits_set
        if self.limits_set:
            self.smax = [float(v) for v in f(spec.state_max)]
            self.smin = [float(v) for v in f(spec.state_min)]
            self.weight = [float(v) for v in f(spec.limit_weight)]
            self.penalty = float(f(spec.penalty))
        if spec.kind not in ("joint", "joint_time"):
            ch = spec.robot.chain
            self.origin_rot = f(ch.origin_rot)
            self.origin_pos = f(ch.origin_pos)
            self.axis = f(ch.axis)
            self.prismatic = np.asarray(ch.prismatic) > 0
            self.tip_rot = f(ch.tip_rot)
            self.tip_pos = f(ch.tip_pos)
            self.car_dim = spec.robot.nb_car_dim
        # keypoints: static steps with concrete targets/precisions
        mask = np.asarray(spec.kp_mask) != 0
        mu = f(spec.mu)
        prec = f(spec.prec)
        pos_radius = f(spec.pos_radius)
        orn_thresh = f(spec.orn_thresh)
        self.kp = []
        for k in np.nonzero(mask)[0]:
            self.kp.append({
                "k": int(k),
                "mu": mu[k],
                "prec": prec[k],
                "radius": float(pos_radius[k]),
                "thresh": [float(v) for v in orn_thresh[k]],
            })
        self.kp_steps = tuple(d["k"] for d in self.kp)


# ---------------------------------------------------------------------------
# lane-major micro-algebra: nested lists of [B] vectors, unrolled at trace
# ---------------------------------------------------------------------------

def _rows(arr):
    """[n, B] array -> list of n [B] slices."""
    return [arr[i] for i in range(arr.shape[0])]


def _mat(arr):
    """[n, m, B] array -> n x m nested list of [B] slices."""
    return [[arr[i, j] for j in range(arr.shape[1])] for i in range(arr.shape[0])]


def _const_mm(A, C):
    """A (lists of [B]) @ C (numpy const), skipping exact-zero constants."""
    n, k, m = len(A), len(A[0]), C.shape[1]
    out = []
    for i in range(n):
        row = []
        for j in range(m):
            acc = None
            for s in range(k):
                c = float(C[s, j])
                if c == 0.0:
                    continue
                term = A[i][s] * c if c != 1.0 else A[i][s]
                acc = term if acc is None else acc + term
            row.append(0.0 if acc is None else acc)
        out.append(row)
    return out


def _solve_aug(M, Rhs):
    """Gauss-Jordan without pivoting on nested lists: M^{-1} Rhs.

    The same static-index elimination as ops.linalg.solve_spd (stable for the
    SPD-plus-ridge systems here), every scalar op a [B]-wide vector op.
    """
    n = len(M)
    A = [row[:] for row in M]
    X = [row[:] for row in Rhs]
    for k in range(n):
        piv = 1.0 / A[k][k]
        A[k] = [a * piv for a in A[k]]
        X[k] = [a * piv for a in X[k]]
        for r in range(n):
            if r == k:
                continue
            fac = A[r][k]
            A[r] = [a - fac * b for a, b in zip(A[r], A[k])]
            X[r] = [a - fac * b for a, b in zip(X[r], X[k])]
    return X


# ---------------------------------------------------------------------------
# FK + geometric Jacobian, lane-major (chain_fk/chain_jacobian re-expressed)
# ---------------------------------------------------------------------------

def _fk_soa(cc: _Consts, q, want_jac: bool):
    """Chain FK over lanes: q = list of dof [B] vectors.

    Returns (p_ee [3 lists], quat [4 lists], J [6 x dof lists or None]) —
    the joint walk of models/chain.py:_frames with all 3x3 algebra unrolled.
    """
    nj = len(q)
    R = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    p = [0.0, 0.0, 0.0]
    zs, os_ = [], []
    for i in range(nj):
        opos = cc.origin_pos[i]
        p = [p[j] + sum(R[j][s] * float(opos[s]) for s in range(3)
                        if float(opos[s]) != 0.0) for j in range(3)]
        R = _const_mm(R, cc.origin_rot[i])
        a = cc.axis[i]
        z = [sum(R[j][s] * float(a[s]) for s in range(3) if float(a[s]) != 0.0)
             for j in range(3)]
        if cc.prismatic[i]:
            p = [p[j] + z[j] * q[i] for j in range(3)]
        else:
            ax, ay, az = (float(v) for v in a)
            K = np.array([[0.0, -az, ay], [az, 0.0, -ax], [-ay, ax, 0.0]],
                         cc.np_dtype)
            K2 = (K @ K).astype(cc.np_dtype)
            s_, c_ = jnp.sin(q[i]), jnp.cos(q[i])
            omc = 1.0 - c_
            Raa = [[(1.0 if j == m else 0.0)
                    + (s_ * float(K[j, m]) if float(K[j, m]) != 0.0 else 0.0)
                    + (omc * float(K2[j, m]) if float(K2[j, m]) != 0.0 else 0.0)
                    for m in range(3)] for j in range(3)]
            R = [[sum(R[j][s] * Raa[s][m] for s in range(3)) for m in range(3)]
                 for j in range(3)]
        zs.append(z)
        os_.append(list(p))
    p_ee = [p[j] + sum(R[j][s] * float(cc.tip_pos[s]) for s in range(3)
                       if float(cc.tip_pos[s]) != 0.0) for j in range(3)]
    R_ee = _const_mm(R, cc.tip_rot)
    quat = _mat_to_quat_soa(R_ee)
    if not want_jac:
        return p_ee, quat, None
    # Geometric Jacobian columns (chain.py:chain_jacobian)
    J = [[None] * nj for _ in range(6)]
    for i in range(nj):
        z, o = zs[i], os_[i]
        if cc.prismatic[i]:
            jv = z
            jw = [0.0, 0.0, 0.0]
        else:
            d = [p_ee[j] - o[j] for j in range(3)]
            jv = [z[1] * d[2] - z[2] * d[1],
                  z[2] * d[0] - z[0] * d[2],
                  z[0] * d[1] - z[1] * d[0]]
            jw = z
        for r in range(3):
            J[r][i] = jv[r]
            J[3 + r][i] = jw[r]
    return p_ee, quat, J


def _mat_to_quat_soa(R):
    """Branchless Shepperd extraction, the lane-major twin of
    ops.so3.mat_to_quat (same candidates, same argmax select, same
    normalization)."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22

    def ssqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-30))

    s0 = ssqrt(tr + 1.0) * 2.0
    q0 = [0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0]
    s1 = ssqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = [(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1]
    s2 = ssqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = [(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2]
    s3 = ssqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = [(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3]

    scores = [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11]
    best = jnp.argmax(jnp.stack(scores), axis=0)
    q = [jnp.where(best == 0, q0[j],
                   jnp.where(best == 1, q1[j],
                             jnp.where(best == 2, q2[j], q3[j])))
         for j in range(4)]
    nrm = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    return [v / nrm for v in q]


# ---------------------------------------------------------------------------
# keypoint residuals + Gauss-Newton terms at one static step
# ---------------------------------------------------------------------------

def _dquat_jac_np(qt):
    w, x, y, z = (float(v) for v in qt)
    return np.array([[-x, w, -z, y], [-y, z, w, -x], [-z, -y, x, w]])


def _posorn_residual_soa(kp, p, quat):
    """PosOrnKeypoint::diff (PosOrnKeypoint.cpp:24-45) over lanes:
    r_p = p* - p, r_o = -2 E(q*) logMap(q*, q), with the reference's
    dead-zone shrinkage when radius/thresholds are nonzero
    (PosOrnKeypointDistFunct.cpp:13-35)."""
    mu = kp["mu"]
    c = len(p)
    p_t = [float(v) for v in mu[:c]]
    q_t = np.asarray(mu[c:c + 4], np.float64)
    r_p = [p_t[j] - p[j] for j in range(c)]

    # logMap(q_t, quat) with the sd.h guards (sd.h:48-82)
    qt_n = q_t / np.linalg.norm(q_t)
    ynrm = jnp.sqrt(sum(v * v for v in quat))
    ysafe = jnp.where(ynrm > 0, ynrm, 1.0)
    yn = [v / ysafe for v in quat]
    dot = sum(yn[j] * float(qt_n[j]) for j in range(4))
    temp = [yn[j] - dot * float(qt_n[j]) for j in range(4)]
    tn = jnp.sqrt(sum(v * v for v in temp))
    dclip = jnp.clip(dot, -1.0, 1.0)
    ac = jnp.arccos(dclip)
    dist = jnp.where(dclip < 0, ac - np.pi, ac)
    tsafe = jnp.where(tn > 0, tn, 1.0)
    lm = [jnp.where(tn == 0, 0.0, dist * temp[j] / tsafe) for j in range(4)]
    yzero = (quat[0] == 0) & (quat[1] == 0) & (quat[2] == 0) & (quat[3] == 0)
    lm = [jnp.where(yzero, 0.0, v) for v in lm]
    # E(q*) uses the RAW target quaternion (funcs._posorn_residual builds it
    # from mu directly, before any normalization).
    E = _dquat_jac_np(q_t)
    r_o = [-2.0 * sum(float(E[j, s]) * lm[s] for s in range(4)
                      if float(E[j, s]) != 0.0) for j in range(3)]

    if kp["radius"] != 0.0:
        nrm = jnp.sqrt(sum(v * v for v in r_p))
        safe = jnp.where(nrm == 0, 1.0, nrm)
        r_p = [jnp.where(nrm <= kp["radius"],
                         0.0, v / safe * (nrm - kp["radius"])) for v in r_p]
    if any(t != 0.0 for t in kp["thresh"]):
        r_o = [jnp.where(jnp.abs(v) <= t, 0.0, v - jnp.sign(v) * t)
               for v, t in zip(r_o, kp["thresh"])]
    return r_p + r_o


def _kp_terms(cc: _Consts, kp, x, want_grads: bool):
    """(cost, gx, Gxx) of the keypoint at its step: cost = e^T P e,
    gx = J^T P e, Gxx = J^T P J (System.cpp:213-311), lane-major.
    gx/Gxx are None when want_grads is False.

    For the time-optimal kinds the residual gains a trailing time component
    t* - t whose Jacobian row is a single 1 at the time column
    (SpacetimeKeypoint.cpp:12-24, PosOrnTimePlannerSys.cpp:92-96)."""
    n, dof = cc.n, cc.dof
    P = np.asarray(kp["prec"], np.float64)
    nq = P.shape[0]

    if cc.kind in ("joint", "joint_time"):
        fx = x
        e = [float(kp["mu"][a]) - x[a] for a in range(n)]
        J = None  # identity (incl. the time row for joint_time)
    else:
        p, quat, J = _fk_soa(cc, x[:dof],
                             want_jac=want_grads or cc.kind == "point")
        if cc.kind == "point":
            fx = p
            e = [float(kp["mu"][a]) - p[a] for a in range(cc.car_dim)]
            J = J[:cc.car_dim] if J is not None else None
        else:
            fx = p + quat
            e = _posorn_residual_soa(kp, p, quat)
            # posorn J: 6 geometric rows pair with [r_p, r_o]
        if cc.time:
            fx = fx + [x[n - 1]]
            e = e + [float(kp["mu"][-1]) - x[n - 1]]

    # zero-state guard (PosOrnKeypoint.cpp:29 via funcs.residual)
    zero_state = fx[0] == 0
    for v in fx[1:]:
        zero_state = zero_state & (v == 0)
    e = [jnp.where(zero_state, 0.0, v) for v in e]

    # v = P e (skip structural zeros of the concrete precision)
    nz = [(a, s, float(P[a, s])) for a in range(nq) for s in range(nq)
          if float(P[a, s]) != 0.0]
    v = [None] * nq
    for a, s, c in nz:
        term = c * e[s]
        v[a] = term if v[a] is None else v[a] + term
    v = [jnp.zeros_like(e[0]) if t is None else t for t in v]
    cost = sum(e[a] * v[a] for a in range(nq))

    if not want_grads:
        return cost, None, None

    if cc.kind in ("joint", "joint_time"):
        # J = I: gx = P e; Gxx = P (constant, folds into the trace)
        Gxx = [[float(P[i, j]) for j in range(n)] for i in range(n)]
        return cost, v, Gxx

    # Geometric rows: gx_i = sum_a J[a][i] v_a over the FK columns; the
    # time row/col (posorn_time) contributes v[nq-1] at the time column.
    ng = nq - 1 if cc.time else nq  # geometric residual rows
    gx = [sum(J[a][i] * v[a] for a in range(ng)) for i in range(dof)]
    gx += [jnp.zeros_like(x[0])] * (n - dof)
    PJ = [[None] * n for _ in range(nq)]
    for a, s, c in nz:
        if s < ng:
            for j in range(dof):
                term = c * J[s][j]
                PJ[a][j] = term if PJ[a][j] is None else PJ[a][j] + term
        else:  # time column of J (entry 1 at state column n-1)
            PJ[a][n - 1] = c if PJ[a][n - 1] is None else PJ[a][n - 1] + c
    for a in range(nq):
        for j in range(n):
            if PJ[a][j] is None:
                PJ[a][j] = 0.0
    Gxx = [[sum(J[a][i] * PJ[a][j] for a in range(ng)) for j in range(n)]
           for i in range(dof)]
    if cc.time:
        gx[n - 1] = v[nq - 1]
        Gxx += [[jnp.zeros_like(x[0])] * n for _ in range(n - dof)]
        Gxx[n - 1] = [PJ[nq - 1][j] for j in range(n)]
    return cost, gx, Gxx


# ---------------------------------------------------------------------------
# joint-limit penalty, lane-major (System.cpp:121-142)
# ---------------------------------------------------------------------------

def _limit_soa(cc: _Consts, x):
    """(cost, Lq list, L2 list) at one state; zeros when limits unset."""
    n = cc.n
    if not cc.limits_set:
        z = jnp.zeros_like(x[0])
        return z, [0.0] * n, [0.0] * n
    cost = jnp.zeros_like(x[0])
    Lq, L2 = [], []
    for i in range(n):
        if cc.weight[i] == 0.0:
            Lq.append(0.0)
            L2.append(0.0)
            continue
        over = x[i] > cc.smax[i]
        under = x[i] < cc.smin[i]
        active = over | under
        Ld = jnp.where(active, cc.penalty, 0.0)
        ql = jnp.where(over, cc.smax[i] - x[i],
                       jnp.where(under, cc.smin[i] - x[i], 0.0))
        ql = jnp.where(active, ql, 0.0)
        cost = cost + Ld * ql * ql
        Lq.append(Ld * ql)
        L2.append(Ld * Ld)
    return cost, Lq, L2


def _limit_arrays(cc: _Consts, X):
    """Vectorized (full-array) limit terms over [H, n, B]: (Lq, L2) arrays.

    Same math as _limit_soa but computed in one shot for the backward pass.
    """
    if not cc.limits_set:
        return jnp.zeros_like(X), jnp.zeros_like(X)
    smax = jnp.asarray(np.asarray(cc.smax, cc.np_dtype))[None, :, None]
    smin = jnp.asarray(np.asarray(cc.smin, cc.np_dtype))[None, :, None]
    w = jnp.asarray(np.asarray(cc.weight, cc.np_dtype))[None, :, None]
    over = X > smax
    under = X < smin
    active = (w != 0) & (over | under)
    Ld = jnp.where(active, cc.penalty, 0.0).astype(X.dtype)
    ql = jnp.where(over, smax - X, jnp.where(under, smin - X, 0.0))
    ql = jnp.where(active, ql, 0.0).astype(X.dtype)
    return Ld * ql, Ld * Ld


# ---------------------------------------------------------------------------
# rollout (FK-free scan + static keypoint costs) — _light_rollout, lane-major
# ---------------------------------------------------------------------------

def _rollout(cc: _Consts, alpha, Ks, ds, Xref, Uref, x0):
    """Closed-loop rollout u = uo + K (x - xo) + alpha d over all lanes.

    Ks [H-1,m,n,B], ds/Uref [H-1,m,B], Xref [H,n,B], x0 [n,B]; alpha scalar
    (traced) or float. Returns (X [H,n,B], U [H-1,m,B], cost [B], du [B]).
    """
    n, m, dof = cc.n, cc.m, cc.dof
    dt = cc.dt

    def step(carry, inp):
        x, cost, du_acc = carry  # x: list of n [B]
        K, d, xo, uo = inp
        dx = [x[j] - xo[j] for j in range(n)]
        du = [sum(K[i, j] * dx[j] for j in range(n)) + alpha * d[i]
              for i in range(m)]
        u = [uo[i] + du[i] for i in range(m)]
        lim_c, _, _ = _limit_soa(cc, x)
        if cc.time:
            # dt_k = s^2 with s the last control (PosOrnTimePlannerSys.cpp:
            # 154-161); the time state integrates dt_k.
            s_ = u[m - 1]
            dtk = s_ * s_
            x1 = ([x[i] + dtk * u[i] for i in range(dof)]
                  + [x[n - 1] + dtk])
        else:
            x1 = [x[i] + dt * u[i] for i in range(n)]
        du_acc = du_acc + jnp.sqrt(sum(v * v for v in du))
        return (x1, cost + lim_c, du_acc), (jnp.stack(x1), jnp.stack(u))

    zero = jnp.zeros_like(x0[0])
    (xH, cost, du_acc), (Xs, U) = jax.lax.scan(
        step, (_rows(x0), zero, zero), (Ks, ds, Xref[:-1], Uref)
    )
    lim_N, _, _ = _limit_soa(cc, xH)
    cost = cost + lim_N
    X = jnp.concatenate([x0[None], Xs], axis=0)  # [H, n, B]
    # control penalty enters the cost value only at keypoint steps
    # (System.cpp:217-221); keypoint residual costs at the static steps.
    for kp in cc.kp:
        k = kp["k"]
        if k < cc.H - 1:
            uk = U[k]
            cost = cost + sum(cc.Rt[i] * uk[i] * uk[i] for i in range(m))
        kc, _, _ = _kp_terms(cc, kp, _rows(X[k]), want_grads=False)
        cost = cost + kc
    return X, U, cost, du_acc


# ---------------------------------------------------------------------------
# backward Riccati sweep, lane-major, segmented at static keypoint steps
# ---------------------------------------------------------------------------

def _bwd_step(cc: _Consts, P, p, lxx_diag, lx, u, gxx=None):
    """One structured backward step (A = I, B = dt I): gains + value update.

    lxx_diag: list n (limit L^2 diagonal); gxx: optional dense keypoint
    Hessian term (nested lists). Reproduces ILQRRecursive.cpp:82-94 with the
    regularized elimination for [K|d] and the UNregularized Quu in the value
    recursion.
    """
    n = cc.n
    dt = cc.dt
    reg = 1e-6
    Quu = [[dt * dt * P[i][j] + (cc.Rt[i] if i == j else 0.0)
            for j in range(n)] for i in range(n)]
    M = [[Quu[i][j] + (reg if i == j else 0.0) for j in range(n)]
         for i in range(n)]
    Qux = [[dt * P[i][j] for j in range(n)] for i in range(n)]
    Qu = [cc.Rt[i] * u[i] + dt * p[i] for i in range(n)]
    Qx = [lx[i] + p[i] for i in range(n)]
    Qxx = [[P[i][j] + (lxx_diag[i] if i == j else 0.0)
            + (gxx[i][j] if gxx is not None else 0.0)
            for j in range(n)] for i in range(n)]

    sol = _solve_aug(M, [Qux[i] + [Qu[i]] for i in range(n)])
    K = [[-sol[i][j] for j in range(n)] for i in range(n)]
    d = [-sol[i][n] for i in range(n)]

    QuuK = [[sum(Quu[i][s] * K[s][j] for s in range(n)) for j in range(n)]
            for i in range(n)]
    Quud = [sum(Quu[i][s] * d[s] for s in range(n)) for i in range(n)]
    P1 = [[Qxx[i][j]
           + sum(K[s][i] * QuuK[s][j] for s in range(n))
           + sum(K[s][i] * Qux[s][j] for s in range(n))
           + sum(Qux[s][i] * K[s][j] for s in range(n))
           for j in range(n)] for i in range(n)]
    p1 = [Qx[i]
          + sum(K[s][i] * Quud[s] for s in range(n))
          + sum(K[s][i] * Qu[s] for s in range(n))
          + sum(Qux[s][i] * d[s] for s in range(n))
          for i in range(n)]
    return P1, p1, K, d


def _bwd_step_to(cc: _Consts, P, p, lxx_diag, lx, u, gxx=None):
    """Time-optimal first-order backward step: A = I and the chain-rule
    B = [[s^2 I, 2 s dq_cmd], [0, 2 s]] of PosOrnTimePlannerSys.cpp:161-162,
    exploiting B's structure (one dense column) instead of dense matmuls.
    K is [m, n] lane-major; value recursion uses the unregularized Quu."""
    n, m, dof = cc.n, cc.m, cc.dof
    reg = 1e-6
    s_ = u[m - 1]
    dtk = s_ * s_
    g = [2.0 * s_ * u[i] for i in range(dof)]  # dq_cmd chain-rule column
    h = 2.0 * s_

    def btm(M, cols):
        """B^T @ M for M [n, cols] nested lists."""
        out = [[dtk * M[i][j] for j in range(cols)] for i in range(dof)]
        out.append([sum(g[r] * M[r][j] for r in range(dof)) + h * M[n - 1][j]
                    for j in range(cols)])
        return out

    PB = [[dtk * P[i][j] for j in range(dof)]
          + [sum(P[i][r] * g[r] for r in range(dof)) + P[i][n - 1] * h]
          for i in range(n)]
    Qux = btm(P, n)                       # B^T P A with A = I   [m, n]
    Quu = btm(PB, m)                      # B^T P B              [m, m]
    for i in range(m):
        Quu[i][i] = Quu[i][i] + cc.Rt[i]
    Btp = ([dtk * p[i] for i in range(dof)]
           + [sum(g[r] * p[r] for r in range(dof)) + h * p[n - 1]])
    Qu = [cc.Rt[i] * u[i] + Btp[i] for i in range(m)]
    Qx = [lx[i] + p[i] for i in range(n)]
    Qxx = [[P[i][j] + (lxx_diag[i] if i == j else 0.0)
            + (gxx[i][j] if gxx is not None else 0.0)
            for j in range(n)] for i in range(n)]

    M = [[Quu[i][j] + (reg if i == j else 0.0) for j in range(m)]
         for i in range(m)]
    sol = _solve_aug(M, [Qux[i] + [Qu[i]] for i in range(m)])
    K = [[-sol[i][j] for j in range(n)] for i in range(m)]
    d = [-sol[i][n] for i in range(m)]

    QuuK = [[sum(Quu[i][r] * K[r][j] for r in range(m)) for j in range(n)]
            for i in range(m)]
    Quud = [sum(Quu[i][r] * d[r] for r in range(m)) for i in range(m)]
    P1 = [[Qxx[i][j]
           + sum(K[r][i] * QuuK[r][j] for r in range(m))
           + sum(K[r][i] * Qux[r][j] for r in range(m))
           + sum(Qux[r][i] * K[r][j] for r in range(m))
           for j in range(n)] for i in range(n)]
    p1 = [Qx[i]
          + sum(K[r][i] * Quud[r] for r in range(m))
          + sum(K[r][i] * Qu[r] for r in range(m))
          + sum(Qux[r][i] * d[r] for r in range(m))
          for i in range(n)]
    return P1, p1, K, d


def _backward(cc: _Consts, X, U):
    """Full backward sweep -> (Ks [H-1,m,n,B], ds [H-1,m,B]).

    Limit-penalty quadratics stream as per-step DIAGONALS (they are diagonal,
    System.cpp:286-308); the dense J^T P J keypoint Hessians enter only at
    the static keypoint steps, which split the sweep into scan segments with
    an unrolled keypoint step between — no [H,n,n,B] Hessian array ever
    exists.
    """
    n, H = cc.n, cc.H
    B = X.shape[-1]
    dtype = X.dtype
    Lq, L2 = _limit_arrays(cc, X)  # [H, n, B]
    lx_all = -Lq

    kp_by_step = {kp["k"]: kp for kp in cc.kp}

    # terminal value (cost at H-1 with u = 0, System.cpp:236-246)
    xN = _rows(X[H - 1])
    P = [[jnp.broadcast_to(jnp.asarray(0.0, dtype), (B,))
          + (L2[H - 1, i] if i == j else 0.0) for j in range(n)]
         for i in range(n)]
    p = [jnp.broadcast_to(jnp.asarray(0.0, dtype), (B,)) + lx_all[H - 1, i]
         for i in range(n)]
    if (H - 1) in kp_by_step:
        _, gx, gxx = _kp_terms(cc, kp_by_step[H - 1], xN, want_grads=True)
        p = [p[i] - gx[i] for i in range(n)]
        P = [[P[i][j] + gxx[i][j] for j in range(n)] for i in range(n)]

    step_fn = _bwd_step_to if cc.time else _bwd_step

    def seg_step(carry, inp):
        P_c, p_c = carry
        l2_t, lx_t, u_t = inp
        P1, p1, K, d = step_fn(cc, _mat_pack(P_c, n), _rows_pack(p_c, n),
                               _rows(l2_t), _rows(lx_t), _rows(u_t))
        return (_to_arr(P1), jnp.stack(p1)), (_to_arr(K), jnp.stack(d))

    def run_segment(P, p, hi, lo):
        """Scan steps t = hi-1 .. lo (reverse) with diagonal-only Hessians."""
        if hi <= lo:
            return P, p, None, None
        carry = (_to_arr(P), jnp.stack(p))
        inputs = (L2[lo:hi], lx_all[lo:hi], U[lo:hi])
        (P_a, p_a), (Ks_seg, ds_seg) = jax.lax.scan(
            seg_step, carry, inputs, reverse=True)
        return _mat(P_a), _rows(p_a), Ks_seg, ds_seg

    Ks_parts, ds_parts = [], []
    t = H - 2
    # walk down through keypoint steps < H-1 (descending)
    inner_kps = sorted((k for k in kp_by_step if k < H - 1), reverse=True)
    for k in inner_kps:
        P, p, Ks_seg, ds_seg = run_segment(P, p, t + 1, k + 1)
        if Ks_seg is not None:
            Ks_parts.append(Ks_seg)
            ds_parts.append(ds_seg)
        # unrolled keypoint step at t = k with the dense Hessian term
        _, gx, gxx = _kp_terms(cc, kp_by_step[k], _rows(X[k]), want_grads=True)
        lx_k = [lx_all[k, i] - gx[i] for i in range(n)]
        P_n, p_n, K, d = step_fn(cc, P, p, _rows(L2[k]), lx_k, _rows(U[k]),
                                 gxx=gxx)
        P, p = P_n, p_n
        Ks_parts.append(_to_arr(K)[None])
        ds_parts.append(jnp.stack(d)[None])
        t = k - 1
    P, p, Ks_seg, ds_seg = run_segment(P, p, t + 1, 0)
    if Ks_seg is not None:
        Ks_parts.append(Ks_seg)
        ds_parts.append(ds_seg)
    Ks = jnp.concatenate(Ks_parts[::-1], axis=0)
    ds = jnp.concatenate(ds_parts[::-1], axis=0)
    return Ks, ds


def _to_arr(M):
    return jnp.stack([jnp.stack(row) for row in M])


def _mat_pack(arr, n):
    return [[arr[i, j] for j in range(n)] for i in range(n)]


def _rows_pack(arr, n):
    return [arr[i] for i in range(n)]


# ---------------------------------------------------------------------------
# full solve: iteration scan + backtracking trial scan, all lanes masked
# ---------------------------------------------------------------------------

def make_fleet_solver(spec: Spec, nb_iter: int, line_search: bool = True,
                      early_stop: bool = True):
    """Build a jitted lane-major fleet solve: (x0s [B,n], U0s [B,H-1,n]) ->
    ILQRResult with a leading scenario axis. The spec must be concrete
    (not traced); its arrays fold into the program as constants.
    """
    cc = _Consts(spec)
    n, m, H = cc.n, cc.m, cc.H
    if line_search:
        alphas = tuple(2.0 ** -i for i in range(11))  # 1 .. 2^-10
    else:
        alphas = (1.0,)

    def solve(x0s, U0s):
        x0 = jnp.moveaxis(jnp.asarray(x0s), 0, -1)      # [n, B]
        U0 = jnp.moveaxis(jnp.asarray(U0s), 0, -1)      # [H-1, m, B]
        B = x0.shape[-1]
        dtype = x0.dtype
        zK = jnp.zeros((H - 1, m, n, B), dtype)
        zd = jnp.zeros((H - 1, m, B), dtype)
        zX = jnp.zeros((H, n, B), dtype)
        X, U, cost0, _ = _rollout(cc, 0.0, zK, zd, zX, U0, x0)

        a_sched = jnp.asarray(np.asarray(alphas, cc.np_dtype))

        def iter_body(carry, _):
            X, U, cost0, Ks, ds, it, done, alpha_l, du_l = carry
            Ks_n, ds_n = _backward(cc, X, U)

            # Trials run as a sequential scan over the alpha grid, each a
            # full-width lane-major rollout. (Measured on the TPU: vmapping
            # the alpha axis into the rollout — one H-scan of 11x-wide ops —
            # is 4.6x SLOWER here; the 11x carry spills out of VMEM, while
            # sequential trials keep each step's working set resident.
            # 14.4k vs 3.1k solves/s at B=4608.)
            def trial(tc, a):
                accepted, best = tc
                Xt, Ut, ct, dut = _rollout(cc, a, Ks_n, ds_n, X, U, x0)
                ok = (ct < cost0) & ~jnp.isnan(ct)
                take = ~accepted  # first passing alpha wins; floor-out sticks
                sel = lambda b, o: jnp.where(take, o, b)
                best = (sel(best[0], Xt), sel(best[1], Ut), sel(best[2], ct),
                        sel(best[3], dut),
                        sel(best[4], jnp.broadcast_to(a, (B,))))
                return (accepted | ok, best), None

            dummy = (X, U, cost0, jnp.zeros((B,), dtype), jnp.ones((B,), dtype))
            (acc, picked), _ = jax.lax.scan(
                trial, (jnp.zeros((B,), bool), dummy), a_sched)
            Xn, Un, costn, du_acc, alpha = picked

            new_done = done | (early_stop
                               & (alpha * jnp.sqrt(du_acc) < 1e-3)
                               & (costn < 1e-3))
            new = (Xn, Un, costn, Ks_n, ds_n, it + 1, new_done, alpha, du_acc)
            old = (X, U, cost0, Ks, ds, it, done, alpha_l, du_l)
            carry = jax.tree_util.tree_map(
                lambda o, nw: jnp.where(done, o, nw), old, new)
            return carry, None

        carry0 = (X, U, cost0, zK, zd, jnp.zeros((B,), jnp.int32),
                  jnp.zeros((B,), bool), jnp.ones((B,), dtype),
                  jnp.zeros((B,), dtype))
        X, U, cost, Ks, ds, it, done, alpha, _ = jax.lax.scan(
            iter_body, carry0, None, length=nb_iter)[0]

        fX = _fx_traj(cc, X)
        return ILQRResult(
            X=jnp.moveaxis(X, -1, 0),
            fX=fX,
            U=jnp.moveaxis(U, -1, 0),
            Ks=jnp.moveaxis(Ks, -1, 0),
            ds=jnp.moveaxis(ds * alpha, -1, 0),
            cost=cost,
            iterations=it,
            alpha=alpha,
        )

    return jax.jit(solve)


def _fx_traj(cc: _Consts, X):
    """fX [B, H, nt] for the whole accepted trajectory: the horizon flattens
    into the lane axis so the FK walk runs once over H*B lanes."""
    H, n, dof = cc.H, cc.n, cc.dof
    B = X.shape[-1]
    if cc.kind in ("joint", "joint_time"):
        return jnp.moveaxis(X, -1, 0)
    q_flat = X[:, :dof].transpose(1, 0, 2).reshape(dof, H * B)
    p, quat, _ = _fk_soa(cc, _rows(q_flat), want_jac=False)
    comps = p if cc.kind == "point" else p + quat
    if cc.time:
        comps = comps + [X[:, n - 1].reshape(H * B)]
    fx = jnp.stack(comps)  # [nt, H*B]
    return fx.reshape(len(comps), H, B).transpose(2, 1, 0)
