"""Lane-major (struct-of-arrays) fleet solver.

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

Scope (round 3 — the round-2 scope was first-order chain kinds only):
  * kinds 'posorn', 'joint', 'point' at nb_deriv 1 AND 2 (double-integrator
    A/B of PosOrnPlannerSys.cpp:125-130 exploited block-wise in
    _bwd_step_2nd), and the first-order time-optimal 'posorn_time' /
    'joint_time' (sqrt-dt control, PosOrnTimePlannerSys.cpp:149-184);
  * object frames (TransformedSimulationInterface.cpp:53-103): folded into
    the trace as constant rotations applied after the shared world FK walk;
  * 'sequential' composition (SequentialSystem.cpp:13-278): per-sub
    residual/limit/control-cost terms summed lane-major, the world FK walk
    shared across subsystems on the same chain;
  * per-scenario keypoint targets/precisions/dead-zones: `overrides`
    lifts mu/prec/pos_radius/orn_thresh from trace constants to [B]-lane
    arrays, keeping the fast path for (x0, keypoints, weights) scenario
    batches (System.cpp:321-361 is the single-problem analogue);
  * AL-iLQR (AL-ILQR.cpp:19-232): make_fleet_solver_al adds the lane-wide
    active-set terms to the same backward sweep and runs the dual/penalty
    update masked per lane.

Everything else falls back to parallel.solve_batch's vmap path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_planner_tpu.solvers.al_ilqr import ALILQRResult, Constraints
from ilqr_planner_tpu.solvers.ilqr import ILQRResult
from ilqr_planner_tpu.systems.spec import Spec

__all__ = ["make_fleet_solver", "make_fleet_solver_al", "fleet_supported",
           "FLEET_OVERRIDES"]

# Spec leaves the fleet path can take per-scenario (besides q0/x0).
FLEET_OVERRIDES = ("mu", "prec", "pos_radius", "orn_thresh")


def _sub_ok(s: Spec) -> bool:
    if s.kind in ("joint", "joint_time"):
        return s.nb_deriv in (1, 2)
    if s.kind == "point":
        # chain robots, or planar robots without an object frame (the
        # reference's Robot2D has no orientation to express in a frame)
        return s.nb_deriv in (1, 2) and (
            s.robot.kind == "chain"
            or (s.robot.kind == "planar" and s.robot.frame is None))
    if s.kind == "posorn":
        return s.nb_deriv in (1, 2) and s.robot.kind == "chain"
    if s.kind == "posorn_time":
        return s.nb_deriv in (1, 2) and s.robot.kind == "chain"
    return False


def fleet_supported(spec: Spec) -> bool:
    """True when this spec is in the lane-major solver's fast-path scope."""
    if spec.kind == "sequential":
        return all(_sub_ok(s) for s in spec.subs)
    return _sub_ok(spec)


# ---------------------------------------------------------------------------
# host-side constant extraction
# ---------------------------------------------------------------------------

class _SubC:
    """Concrete constants of one (sub)system."""

    def __init__(self, spec: Spec, np_dtype, ov_names=()):
        self.kind = spec.kind
        self.nb_deriv = spec.nb_deriv
        self.time = bool(spec.time_optimal)
        self.n = spec.nx
        self.dof = spec.dof
        self.nt = spec.nt
        self.nq = spec.nq_var
        f = lambda a: np.asarray(a, np_dtype)
        self.Rt = [float(v) for v in f(spec.Rt)]
        self.limits_set = spec.limits_set
        if self.limits_set:
            self.smax = [float(v) for v in f(spec.state_max)]
            self.smin = [float(v) for v in f(spec.state_min)]
            self.weight = [float(v) for v in f(spec.limit_weight)]
            self.penalty = float(f(spec.penalty))
        self.chain_key = None
        self.frame = None
        self.planar = False
        if spec.kind not in ("joint", "joint_time"):
            self.car_dim = spec.robot.nb_car_dim
            if spec.robot.kind == "planar":
                self.planar = True
                self.lengths = [float(v) for v in f(spec.robot.planar.lengths)]
                self.chain_key = ("planar", tuple(self.lengths))
            else:
                ch = spec.robot.chain
                self.origin_rot = f(ch.origin_rot)
                self.origin_pos = f(ch.origin_pos)
                self.axis = f(ch.axis)
                self.prismatic = np.asarray(ch.prismatic) > 0
                self.tip_rot = f(ch.tip_rot)
                self.tip_pos = f(ch.tip_pos)
                self.chain_key = (self.origin_rot.tobytes(),
                                  self.origin_pos.tobytes(),
                                  self.axis.tobytes(), self.prismatic.tobytes(),
                                  self.tip_rot.tobytes(),
                                  self.tip_pos.tobytes())
                if spec.robot.frame is not None:
                    T = np.asarray(spec.robot.frame, np.float64)
                    self.frame = (T[:3, :3], T[:3, 3])
        # keypoints: static steps; targets/precisions/dead-zones either
        # concrete numpy constants or (when listed in ov_names) bound to
        # [B]-lane arrays at trace time by _bind_kp.
        mask = np.asarray(spec.kp_mask) != 0
        mu = f(spec.mu)
        prec = f(spec.prec)
        pos_radius = f(spec.pos_radius)
        orn_thresh = f(spec.orn_thresh)
        self.ov_names = tuple(ov_names)
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


class _Consts:
    """Concrete (numpy) problem constants, folded into the trace."""

    def __init__(self, spec: Spec, ov_names=()):
        if not fleet_supported(spec):
            raise ValueError(
                f"fleet solver scope: posorn/joint/point/posorn_time/"
                f"joint_time nb_deriv 1-2 (point also on frameless planar "
                f"robots), sequential thereof; "
                f"got kind={spec.kind!r} nb_deriv={spec.nb_deriv}")
        ov_names = tuple(ov_names)
        bad = set(ov_names) - set(FLEET_OVERRIDES)
        if bad:
            raise ValueError(f"unsupported fleet overrides: {sorted(bad)}")
        self.kind = spec.kind
        self.n = spec.nx
        self.m = spec.nu
        self.dof = spec.dof
        self.nb_deriv = spec.nb_deriv
        self.time = bool(spec.time_optimal)
        self.H = spec.horizon
        self.np_dtype = np.dtype(jnp.dtype(spec.x0.dtype).name)
        f = lambda a: np.asarray(a, self.np_dtype)
        self.dt = None if self.time else float(f(spec.dt))
        # Top-level Rt drives the solver's cost_u/cost_uu (System.cpp:274-284);
        # per-sub Rt enters the cost VALUE at that sub's keypoint steps.
        self.Rt = [float(v) for v in f(spec.Rt)]
        subs = spec.subs if spec.kind == "sequential" else (spec,)
        self.subs = [_SubC(s, self.np_dtype, ov_names) for s in subs]
        self.ov_names = ov_names
        # unique chains (the world FK walk is shared across subs on the
        # same chain; frames differ per sub)
        self.chain_of = []
        keys = {}
        for sc in self.subs:
            if sc.chain_key is None:
                self.chain_of.append(None)
            else:
                self.chain_of.append(keys.setdefault(sc.chain_key, sc))
        steps = sorted({k for sc in self.subs for k in sc.kp_steps})
        self.kp_steps = tuple(steps)
        self.kp_at = {k: [(i, d) for i, sc in enumerate(self.subs)
                          for d in sc.kp if d["k"] == k] for k in steps}
        self.any_limits = any(sc.limits_set for sc in self.subs)
        # time-axis scan unroll factor: trades trace/compile size for
        # fewer TPU loop iterations (the ~us/step launch overhead dominates
        # long horizons at small-to-mid batch; see docs/fleet_unroll_r03.log)
        self.unroll = 1
        # backward implementation: 'auto' | 'xla' | 'pallas' |
        # 'pallas_interpret' (see make_fleet_solver / _backward)
        self.backward_impl = "auto"


# ---------------------------------------------------------------------------
# lane-major micro-algebra: nested lists whose entries are either Python
# floats (trace-time constants, folded eagerly) or [B] vectors. Exact-zero /
# exact-one constants short-circuit, so structured matrices (integrator A/B,
# diagonal precisions, block-diagonal Jacobians) cost only their nonzeros.
# ---------------------------------------------------------------------------

def _c(v):
    """True when v is a host scalar constant."""
    return isinstance(v, (float, int, np.floating, np.integer))


def _mul(a, b):
    if _c(a):
        a = float(a)
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if _c(b):
            return a * float(b)
    if _c(b):
        b = float(b)
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
    return a * b


def _add(a, b):
    if _c(a) and float(a) == 0.0:
        return b
    if _c(b) and float(b) == 0.0:
        return a
    if _c(a) and _c(b):
        return float(a) + float(b)
    return a + b


def _sub_(a, b):
    if _c(b) and float(b) == 0.0:
        return a
    if _c(a) and _c(b):
        return float(a) - float(b)
    return a - b


def _dot(u, v):
    acc = 0.0
    for a, b in zip(u, v):
        acc = _add(acc, _mul(a, b))
    return acc


def _mv(M, v):
    """M [r][k] @ v [k] -> [r]."""
    return [_dot(row, v) for row in M]


def _mm(A, B):
    """A [r][k] @ B [k][m] -> [r][m]."""
    k = len(B)
    m = len(B[0])
    return [[_dot(row, [B[s][j] for s in range(k)]) for j in range(m)]
            for row in A]


def _tr(M):
    return [[M[i][j] for i in range(len(M))] for j in range(len(M[0]))]


def _np_rows(C):
    """numpy [r, k] -> nested float lists (constants)."""
    return [[float(v) for v in row] for row in np.asarray(C)]


def _rows(arr):
    """[n, B] array -> list of n [B] slices."""
    return [arr[i] for i in range(arr.shape[0])]


def _mat(arr):
    """[n, m, B] array -> n x m nested list of [B] slices."""
    return [[arr[i, j] for j in range(arr.shape[1])] for i in range(arr.shape[0])]


def _to_arr(M):
    return jnp.stack([jnp.stack(row) for row in M])


def _full(v, like):
    """Materialize a possibly-constant entry as a [B] array."""
    return jnp.broadcast_to(jnp.asarray(v, like.dtype), like.shape) if _c(v) else v


def _bfull(v, like):
    """Materialize a possibly-constant BOOLEAN as a [B] bool array."""
    return jnp.broadcast_to(jnp.asarray(bool(v)), like.shape) if _c(v) else v


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
        A[k] = [_mul(a, piv) for a in A[k]]
        X[k] = [_mul(a, piv) for a in X[k]]
        for r in range(n):
            if r == k:
                continue
            fac = A[r][k]
            A[r] = [_sub_(a, _mul(fac, b)) for a, b in zip(A[r], A[k])]
            X[r] = [_sub_(a, _mul(fac, b)) for a, b in zip(X[r], X[k])]
    return X


# ---------------------------------------------------------------------------
# S^3 ops, lane-major (ops/sd.py re-expressed entrywise; sd.h:19-99)
# ---------------------------------------------------------------------------

def _q_norm(q):
    return jnp.sqrt(sum(_mul(v, v) for v in q))


def _q_unit(q):
    """to_unit_norm with the zero guard (sd.h:19-21)."""
    if all(_c(v) for v in q):
        arr = np.asarray([float(v) for v in q], np.float64)
        n = np.linalg.norm(arr)
        return [float(v) for v in (arr / (n if n > 0 else 1.0))]
    n = _q_norm(q)
    safe = jnp.where(n > 0, n, 1.0)
    return [v / safe for v in q]


def _q_is_zero(q):
    """Exact all-zero test (sd.h isZero guard); Python bool for all-const
    input, [B] bool array otherwise (const-nonzero entries short-circuit)."""
    if all(_c(v) for v in q):
        return all(float(v) == 0.0 for v in q)
    if any(_c(v) and float(v) != 0.0 for v in q):
        return False
    traced = [v for v in q if not _c(v)]
    z = traced[0] == 0
    for v in traced[1:]:
        z = z & (v == 0)
    return z


def _q_distance(n1, n2):
    """Geodesic distance w/ hemisphere flip on already-given entries
    (RAW dot, clamp, -pi shift when negative; sd.h:48-62)."""
    dot = _dot(n1, n2)
    dclip = jnp.clip(dot, -1.0, 1.0) if not _c(dot) else min(max(dot, -1.0), 1.0)
    if _c(dclip):
        ac = float(np.arccos(dclip))
        return ac - float(np.pi) if dclip < 0 else ac
    ac = jnp.arccos(dclip)
    return jnp.where(dclip < 0, ac - np.pi, ac)


def _q_log_map(base, y):
    """log_map(base, y) with the sd.h:67-82 guards, entrywise."""
    b = _q_unit(base)
    yn = _q_unit(y)
    dot = _dot(b, yn)
    temp = [_sub_(yn[j], _mul(dot, b[j])) for j in range(len(b))]
    tn = _q_norm(temp)
    dist = _q_distance(b, yn)
    tsafe = jnp.where(tn > 0, tn, 1.0)
    out = [jnp.where(tn == 0, 0.0, _mul(dist, temp[j]) / tsafe)
           for j in range(len(b))]
    zb = _q_is_zero(base)
    zy = _q_is_zero(y)
    if _c(zb) and _c(zy):
        if zb or zy:
            return [0.0] * len(b)
        return out
    degen = _bfull(zb, tn) | _bfull(zy, tn)
    return [jnp.where(degen, 0.0, v) for v in out]


def _q_transport(v, b1, b2):
    """Parallel transport of tangent v from b1 to b2 (sd.h:87-99):
    d2 = distance(b1,b2)^2 on the RAW entries, guards reproduced."""
    d = _q_distance(b1, b2)
    d2 = _mul(d, d)
    l12 = _q_log_map(b1, b2)
    l21 = _q_log_map(b2, b1)
    coef = _dot(l12, v) / jnp.where(d2 > 0, d2, 1.0)
    out = [_sub_(v[j], _mul(coef, _add(l12[j], l21[j]))) for j in range(len(v))]
    out = [jnp.where(d2 == 0, _full(v[j], d2), out[j]) for j in range(len(v))]
    zb = _q_is_zero(b1)
    zy = _q_is_zero(b2)
    if _c(zb) and _c(zy) and not (zb or zy):
        return out
    degen = _bfull(zb, d2) | _bfull(zy, d2)
    return [jnp.where(degen, _full(v[j], d2), out[j]) for j in range(len(v))]


def _dquat_jac(qt):
    """E(q) rows (sd.h:23-27) from const-or-lane entries, w-first."""
    w, x, y, z = qt
    neg = lambda a: -float(a) if _c(a) else -a
    return [[neg(x), w, neg(z), y],
            [neg(y), z, w, neg(x)],
            [neg(z), neg(y), x, w]]


def _quat_rate(quat, w3):
    """0.5 E(q)^T w (SimulationInterface.cpp:69-73), lane-major."""
    E = _dquat_jac(quat)
    return [_mul(0.5, _dot([E[r][c] for r in range(3)], w3)) for c in range(4)]


# ---------------------------------------------------------------------------
# FK + geometric Jacobian, lane-major (models/chain.py re-expressed), with
# the world walk shared across subsystems and object frames applied as
# constant rotations (TransformedSimulationInterface.cpp:53-103)
# ---------------------------------------------------------------------------

def _fk_walk(ch: "_SubC", q):
    """World chain walk: q = list of dof [B]. Returns (p [3], R [3][3],
    zs [nj][3], os [nj][3]) — models/chain.py:_frames unrolled."""
    nj = len(q)
    R = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    p = [0.0, 0.0, 0.0]
    zs, os_ = [], []
    for i in range(nj):
        opos = ch.origin_pos[i]
        p = [_add(p[j], _dot(R[j], [float(v) for v in opos])) for j in range(3)]
        R = _mm(R, _np_rows(ch.origin_rot[i]))
        a = ch.axis[i]
        z = [_dot(R[j], [float(v) for v in a]) for j in range(3)]
        if ch.prismatic[i]:
            p = [_add(p[j], _mul(z[j], q[i])) for j in range(3)]
        else:
            ax, ay, az = (float(v) for v in a)
            K = np.array([[0.0, -az, ay], [az, 0.0, -ax], [-ay, ax, 0.0]])
            K2 = K @ K
            s_, c_ = jnp.sin(q[i]), jnp.cos(q[i])
            omc = 1.0 - c_
            Raa = [[_add(_add(1.0 if j == m else 0.0,
                              _mul(s_, float(K[j, m]))),
                    _mul(omc, float(K2[j, m]))) for m in range(3)]
                   for j in range(3)]
            R = _mm(R, Raa)
        zs.append(z)
        os_.append(list(p))
    return p, R, zs, os_


def _walk_tip(ch: "_SubC", p, R):
    """Apply the fixed tip transform: world EE pose."""
    p_ee = [_add(p[j], _dot(R[j], [float(v) for v in ch.tip_pos]))
            for j in range(3)]
    R_ee = _mm(R, _np_rows(ch.tip_rot))
    return p_ee, R_ee


def _walk_jac(ch: "_SubC", zs, os_, p_ee):
    """World geometric Jacobian 6 x dof from the walk (chain_jacobian)."""
    nj = len(zs)
    J = [[0.0] * nj for _ in range(6)]
    for i in range(nj):
        z, o = zs[i], os_[i]
        if ch.prismatic[i]:
            jv = z
            jw = [0.0, 0.0, 0.0]
        else:
            d = [_sub_(p_ee[j], o[j]) for j in range(3)]
            jv = [_sub_(_mul(z[1], d[2]), _mul(z[2], d[1])),
                  _sub_(_mul(z[2], d[0]), _mul(z[0], d[2])),
                  _sub_(_mul(z[0], d[1]), _mul(z[1], d[0]))]
            jw = z
        for r in range(3):
            J[r][i] = jv[r]
            J[3 + r][i] = jw[r]
    return J


def _apply_frame(fr, p, R):
    """p' = Rf^T (p - pf), R' = Rf^T R (cpp:67-69, 94-103)."""
    Rf, pf = fr
    d = [_sub_(p[j], float(pf[j])) for j in range(3)]
    p2 = [_dot([float(Rf[j][i]) for j in range(3)], d) for i in range(3)]
    R2 = _mm(_np_rows(Rf.T), R)
    return p2, R2


def _frame_jac(fr, J):
    """J' = blockdiag(Rf^T, Rf^T) J (cpp:53-58)."""
    Rf, _ = fr
    RfT = _np_rows(Rf.T)
    nj = len(J[0])
    top = _mm(RfT, [J[r] for r in range(3)])
    bot = _mm(RfT, [J[r] for r in range(3, 6)])
    return top + bot


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


def _planar_walk(ch: "_SubC", q, want_jac):
    """Lane-major planar FK (models/planar.py twin): x = sum_i l_i
    [cos q_i, sin q_i] (2DRobot.cpp:28-38) with the reference's forward-
    difference Jacobian, step pi*1e-3 (2DRobot.cpp:49-61). Since joint i
    only enters column i, the FD column is l_i*(cos(q_i+h)-cos(q_i))/h —
    identical values to the full-FK difference at a fraction of the ops.
    Rotational rows are exact zeros (2DRobot.cpp:63-67)."""
    nj = len(ch.lengths)
    cos_q = [jnp.cos(q[i]) for i in range(nj)]
    sin_q = [jnp.sin(q[i]) for i in range(nj)]
    x = sum(_mul(ch.lengths[i], cos_q[i]) for i in range(nj))
    y = sum(_mul(ch.lengths[i], sin_q[i]) for i in range(nj))
    p = [x, y, 0.0]
    J6 = None
    if want_jac:
        h = float(np.pi) * 1e-3
        row0 = [_mul(ch.lengths[i] / h, jnp.cos(q[i] + h) - cos_q[i])
                for i in range(nj)]
        row1 = [_mul(ch.lengths[i] / h, jnp.sin(q[i] + h) - sin_q[i])
                for i in range(nj)]
        zrow = [0.0] * nj
        J6 = [row0, row1, zrow, zrow, zrow, zrow]
    return p, None, J6


def _fk_subs(cc: "_Consts", x, want_jac, want_vel):
    """Per-sub framed kinematics at state x (list of n [B] lanes).

    One world walk per unique chain; each sub applies its constant frame.
    Returns a list aligned with cc.subs: None for joint kinds, else a dict
    with p, quat, J6 (when want_jac), dp, w, dquat (when want_vel).
    """
    dof = cc.dof
    q = x[:dof]
    dq = x[dof:2 * dof] if cc.nb_deriv == 2 else None
    walks = {}
    out = []
    for sc, rep in zip(cc.subs, cc.chain_of):
        if rep is None:
            out.append(None)
            continue
        key = sc.chain_key
        if key not in walks:
            if rep.planar:
                walks[key] = _planar_walk(rep, q, want_jac or want_vel)
            else:
                p, R, zs, os_ = _fk_walk(rep, q)
                p_ee, R_ee = _walk_tip(rep, p, R)
                Jw = (_walk_jac(rep, zs, os_, p_ee)
                      if want_jac or want_vel else None)
                walks[key] = (p_ee, R_ee, Jw)
        p_ee, R_ee, Jw = walks[key]
        if sc.frame is not None:
            p_s, R_s = _apply_frame(sc.frame, p_ee, R_ee)
            J_s = _frame_jac(sc.frame, Jw) if Jw is not None else None
        else:
            p_s, R_s, J_s = p_ee, R_ee, Jw
        d = {"p": p_s, "J6": J_s}
        if sc.kind.startswith("posorn"):
            d["quat"] = _mat_to_quat_soa(R_s)
        if want_vel:
            d["dp"] = [_dot(J_s[r], dq) for r in range(3)]
            w = [_dot(J_s[3 + r], dq) for r in range(3)]
            d["w"] = w
            if sc.kind.startswith("posorn"):
                d["dquat"] = _quat_rate(d["quat"], w)
        out.append(d)
    return out


# ---------------------------------------------------------------------------
# keypoint residuals + Gauss-Newton terms at one static step
# ---------------------------------------------------------------------------

def _bind_kp(sc: "_SubC", kp: dict, ov: dict) -> dict:
    """Rebind a keypoint's target/precision/dead-zone constants to [B]-lane
    arrays from trace-time override arrays (mu [H, nt, B], prec
    [H, nq, nq, B], pos_radius [H, B], orn_thresh [H, 3, B])."""
    if not sc.ov_names:
        return kp
    k = kp["k"]
    out = dict(kp)
    if "mu" in ov:
        out["mu"] = [ov["mu"][k, a] for a in range(sc.nt)]
    if "prec" in ov:
        out["prec"] = [[ov["prec"][k, a, b] for b in range(sc.nq)]
                       for a in range(sc.nq)]
    if "pos_radius" in ov:
        out["radius"] = ov["pos_radius"][k]
    if "orn_thresh" in ov:
        out["thresh"] = [ov["orn_thresh"][k, j] for j in range(3)]
    return out


def _posorn_residual_soa(sc: "_SubC", kp: dict, fkd: dict):
    """PosOrnKeypoint::diff (PosOrnKeypoint.cpp:24-45) over lanes:
    r_p = p* - p, r_o = -2 E(q*) logMap(q*, q); second order appends
    dp* - dp and -2 E(q*)(dq* - transport(dquat, quat, q*)) (cpp:34-41);
    dead-zone shrinkage on the position/orientation rows only when
    radius/thresholds are nonzero (PosOrnKeypointDistFunct.cpp:13-35)."""
    mu = kp["mu"]
    c = sc.car_dim
    p, quat = fkd["p"], fkd["quat"]
    p_t = [mu[j] for j in range(c)]
    q_t = [mu[c + j] for j in range(4)]
    r_p = [_sub_(p_t[j], p[j]) for j in range(c)]
    # E(q*) uses the RAW target quaternion (funcs._posorn_residual builds it
    # from mu directly, before any normalization).
    E = _dquat_jac(q_t)
    lm = _q_log_map(q_t, quat)
    r_o = [_mul(-2.0, _dot(E[j], lm)) for j in range(3)]

    radius = kp["radius"]
    if not (_c(radius) and float(radius) == 0.0):
        nrm = jnp.sqrt(sum(_mul(v, v) for v in r_p))
        safe = jnp.where(nrm == 0, 1.0, nrm)
        r_p = [jnp.where(nrm <= radius, 0.0, v / safe * (nrm - radius))
               for v in r_p]
    th = kp["thresh"]
    if not all(_c(t) and float(t) == 0.0 for t in th):
        r_o = [jnp.where(jnp.abs(v) <= t, 0.0, v - jnp.sign(v) * t)
               for v, t in zip(r_o, th)]

    parts = r_p + r_o
    if sc.nb_deriv == 2:
        dp_t = [mu[c + 4 + j] for j in range(c)]
        dq_t = [mu[2 * c + 4 + j] for j in range(4)]
        dp, dquat = fkd["dp"], fkd["dquat"]
        r_dp = [_sub_(dp_t[j], dp[j]) for j in range(c)]
        tv = _q_transport(dquat, quat, q_t)
        diff = [_sub_(dq_t[j], tv[j]) for j in range(4)]
        r_do = [_mul(-2.0, _dot(E[j], diff)) for j in range(3)]
        parts = parts + r_dp + r_do
    return parts


def _kp_residual(cc: "_Consts", sc: "_SubC", kp: dict, fkd, x):
    """(e [nq], fx [nt]) of one keypoint at its step (funcs.residual)."""
    n = sc.n
    if sc.kind in ("joint", "joint_time"):
        # Unguarded Euclidean residual (AngularKeypoint.cpp:24-27).
        fx = list(x[:n])
        e = [_sub_(kp["mu"][a], x[a]) for a in range(n)]
    elif sc.kind == "point":
        fx = list(fkd["p"][:sc.car_dim])
        if sc.nb_deriv == 2:
            fx = fx + list(fkd["dp"][:sc.car_dim])
        e = [_sub_(kp["mu"][a], fx[a]) for a in range(len(fx))]
    else:  # posorn / posorn_time
        fx = fkd["p"] + fkd["quat"]
        if sc.nb_deriv == 2:
            fx = fx + fkd["dp"] + fkd["dquat"]
        e = _posorn_residual_soa(sc, kp, fkd)
        # Zero-state guard over the pos/orn part only (PosOrnKeypoint.cpp:29);
        # SpacetimeKeypoint::diff computes the time residual unguarded
        # (SpacetimeKeypoint.cpp:19-23). Mirrors funcs.residual.
        zero_state = None
        for v in fx:
            t = (v == 0)
            zero_state = t if zero_state is None else zero_state & t
        e = [jnp.where(zero_state, 0.0, v) for v in e]
        if sc.time:
            fx = fx + [x[n - 1]]
            e = e + [_sub_(kp["mu"][sc.nt - 1], x[n - 1])]
    return e, fx


def _kp_jac(cc: "_Consts", sc: "_SubC", fkd):
    """Dense [nq, n] residual-row Jacobian with block structure as exact
    zeros (folded by the zero-skipping algebra): geometric rows per
    derivative block (PosOrnPlannerSys.cpp:80-102), identity for joint
    kinds (JointSpacePlannerSys.cpp:77-81), unit time row/col
    (PosOrnTimePlannerSys.cpp:85-112)."""
    n, dof = cc.n, cc.dof
    if sc.kind in ("joint", "joint_time"):
        return [[1.0 if i == j else 0.0 for j in range(n)] for i in range(sc.nq)]
    J6 = fkd["J6"]
    core = 6 if sc.kind.startswith("posorn") else sc.car_dim
    rows = []
    for b in range(sc.nb_deriv):
        for r in range(core):
            row = [0.0] * n
            for j in range(dof):
                row[b * dof + j] = J6[r][j]
            rows.append(row)
    if sc.time:
        row = [0.0] * n
        row[n - 1] = 1.0
        rows.append(row)
    return rows


def _kp_terms_at(cc: "_Consts", k: int, x, want_grads: bool, ov=None):
    """(cost, gx [n], Gxx [n][n]) summed over every subsystem keypoint at
    step k: cost = e^T P e, gx = J^T P e, Gxx = J^T P J
    (System.cpp:213-311; summed across subs, SequentialSystem.cpp:119-165).
    gx/Gxx are None when want_grads is False."""
    entries = cc.kp_at[k]
    need_fk = any(cc.subs[i].kind not in ("joint", "joint_time")
                  for i, _ in entries)
    want_vel = cc.nb_deriv == 2 and need_fk
    fkds = (_fk_subs(cc, x, want_jac=want_grads or want_vel, want_vel=want_vel)
            if need_fk else [None] * len(cc.subs))
    cost = 0.0
    gx = [0.0] * cc.n if want_grads else None
    Gxx = [[0.0] * cc.n for _ in range(cc.n)] if want_grads else None
    for i, kp in entries:
        sc = cc.subs[i]
        ov_i = ov[i] if ov else None
        kpb = _bind_kp(sc, kp, ov_i) if ov_i else kp
        e, _ = _kp_residual(cc, sc, kpb, fkds[i], x)
        P = kpb["prec"]
        if isinstance(P, np.ndarray):
            P = _np_rows(P)
        v = _mv(P, e)
        cost = _add(cost, _dot(e, v))
        if not want_grads:
            continue
        Jt = _kp_jac(cc, sc, fkds[i])
        JT = _tr(Jt)
        gs = _mv(JT, v)
        PJ = _mm(P, Jt)
        Gs = _mm(JT, PJ)
        gx = [_add(gx[j], gs[j]) for j in range(cc.n)]
        Gxx = [[_add(Gxx[a][b], Gs[a][b]) for b in range(cc.n)]
               for a in range(cc.n)]
    return cost, gx, Gxx


# ---------------------------------------------------------------------------
# joint-limit penalty, lane-major (System.cpp:121-142), summed over subs
# ---------------------------------------------------------------------------

def _limit_soa(cc: "_Consts", x):
    """(cost, Lq list, L2 list) at one state; zeros when limits unset."""
    n = cc.n
    cost = 0.0
    Lq = [0.0] * n
    L2 = [0.0] * n
    for sc in cc.subs:
        if not sc.limits_set:
            continue
        for i in range(n):
            if sc.weight[i] == 0.0:
                continue
            over = x[i] > sc.smax[i]
            under = x[i] < sc.smin[i]
            active = over | under
            Ld = jnp.where(active, sc.penalty, 0.0)
            ql = jnp.where(over, sc.smax[i] - x[i],
                           jnp.where(under, sc.smin[i] - x[i], 0.0))
            ql = jnp.where(active, ql, 0.0)
            cost = _add(cost, Ld * ql * ql)
            Lq[i] = _add(Lq[i], Ld * ql)
            L2[i] = _add(L2[i], Ld * Ld)
    return cost, Lq, L2


def _limit_arrays(cc: "_Consts", X):
    """Vectorized (full-array) limit terms over [H, n, B]: (Lq, L2) arrays.

    Same math as _limit_soa but computed in one shot for the backward pass.
    """
    Lq = jnp.zeros_like(X)
    L2 = jnp.zeros_like(X)
    for sc in cc.subs:
        if not sc.limits_set:
            continue
        smax = jnp.asarray(np.asarray(sc.smax, cc.np_dtype))[None, :, None]
        smin = jnp.asarray(np.asarray(sc.smin, cc.np_dtype))[None, :, None]
        w = jnp.asarray(np.asarray(sc.weight, cc.np_dtype))[None, :, None]
        over = X > smax
        under = X < smin
        active = (w != 0) & (over | under)
        Ld = jnp.where(active, sc.penalty, 0.0).astype(X.dtype)
        ql = jnp.where(over, smax - X, jnp.where(under, smin - X, 0.0))
        ql = jnp.where(active, ql, 0.0).astype(X.dtype)
        Lq = Lq + Ld * ql
        L2 = L2 + Ld * Ld
    return Lq, L2


# ---------------------------------------------------------------------------
# rollout (FK-free scan + static keypoint costs) — _light_rollout, lane-major
# ---------------------------------------------------------------------------

def _limit_cost_arr(cc: "_Consts", x):
    """Per-step limit-penalty cost on a PACKED [n, B] state, summed over
    subsystems (same math as _limit_soa, ~6 whole-array ops per sub)."""
    cost = jnp.zeros_like(x[0])
    for sc in cc.subs:
        if not sc.limits_set:
            continue
        smax = jnp.asarray(np.asarray(sc.smax, cc.np_dtype))[:, None]
        smin = jnp.asarray(np.asarray(sc.smin, cc.np_dtype))[:, None]
        w = jnp.asarray(np.asarray(sc.weight, cc.np_dtype))[:, None]
        over = x > smax
        under = x < smin
        active = (w != 0) & (over | under)
        Ld = jnp.where(active, sc.penalty, 0.0).astype(x.dtype)
        ql = jnp.where(over, smax - x, jnp.where(under, smin - x, 0.0))
        ql = jnp.where(active, ql, 0.0).astype(x.dtype)
        cost = cost + jnp.sum(Ld * ql * ql, axis=0)
    return cost


def _rollout(cc: "_Consts", alpha, Ks, ds, Xref, Uref, x0, ov=None):
    """Closed-loop rollout u = uo + K (x - xo) + alpha d over all lanes.

    Ks [H-1,m,n,B], ds/Uref [H-1,m,B], Xref [H,n,B], x0 [n,B]; alpha scalar
    (traced) or float. Returns (X [H,n,B], U [H-1,m,B], cost [B], du [B]).

    The scan step works on PACKED [n, B] arrays (~20 whole-array ops), not
    the unrolled per-element lists the backward uses — the rollout is the
    most-executed body (one pass per line-search trial) and the packed form
    keeps it to a handful of XLA fusions per step.
    """
    n, m, dof = cc.n, cc.m, cc.dof
    dt = cc.dt

    def step(carry, inp):
        x, cost, du_acc = carry  # x: [n, B]
        K, d, xo, uo = inp
        du = jnp.sum(K * (x - xo)[None, :, :], axis=1) + alpha * d
        u = uo + du
        lim_c = _limit_cost_arr(cc, x)
        if cc.time:
            # dt_k = s^2 with s the last control (PosOrnTimePlannerSys.cpp:
            # 154-161); the time state integrates dt_k.
            s_ = u[m - 1]
            dtk = s_ * s_
            if cc.nb_deriv == 2:
                # semi-implicit Euler with the per-step duration
                # (PosOrnTimePlannerSys.cpp:165-171)
                q_, dq_ = x[:dof], x[dof:2 * dof]
                ddq = u[:dof]
                x1 = jnp.concatenate(
                    [q_ + dtk[None] * dq_ + (0.5 * dtk * dtk)[None] * ddq,
                     dq_ + dtk[None] * ddq,
                     (x[n - 1] + dtk)[None]])
            else:
                x1 = jnp.concatenate(
                    [x[:dof] + dtk[None] * u[:dof], (x[n - 1] + dtk)[None]])
        elif cc.nb_deriv == 2:
            # semi-implicit Euler (SimulationInterface.cpp:19-26)
            x1 = jnp.concatenate(
                [x[:dof] + dt * x[dof:] + (0.5 * dt * dt) * u,
                 x[dof:] + dt * u])
        else:
            x1 = x + dt * u
        du_acc = du_acc + jnp.sqrt(jnp.sum(du * du, axis=0))
        return (x1, cost + lim_c, du_acc), (x1, u)

    zero = jnp.zeros_like(x0[0])
    (xH, cost, du_acc), (Xs, U) = jax.lax.scan(
        step, (x0, zero, zero), (Ks, ds, Xref[:-1], Uref),
        unroll=cc.unroll,
    )
    cost = cost + _limit_cost_arr(cc, xH)
    X = jnp.concatenate([x0[None], Xs], axis=0)  # [H, n, B]
    cost = _static_step_costs(cc, X, U, ov, cost)
    return X, U, cost, du_acc


def _static_step_costs(cc: "_Consts", X, U, ov, cost):
    """Accumulate the keypoint-residual + control-penalty cost at the
    static keypoint steps onto `cost` ([H, n, B]/[H-1, m, B] -> [B], same
    accumulation order as before the factoring). The control penalty
    enters the cost value only at each sub's keypoint steps with that
    SUB's Rt (System.cpp:217-221, summed across subs
    SequentialSystem.cpp:119-127)."""
    m = cc.m
    for k in cc.kp_steps:
        if k < cc.H - 1:
            uk = U[k]
            for i_sub, _ in cc.kp_at[k]:
                sc = cc.subs[i_sub]
                cost = cost + sum(sc.Rt[i] * uk[i] * uk[i] for i in range(m))
        kc, _, _ = _kp_terms_at(cc, k, _rows(X[k]), False, ov)
        cost = cost + kc
    return cost


# ---------------------------------------------------------------------------
# backward Riccati sweep, lane-major, segmented at static keypoint steps
# ---------------------------------------------------------------------------

def _neg(v):
    return -float(v) if _c(v) else -v


def _q_terms(cc: "_Consts", P, p, lxx_diag, lx, u, gxx, dq=None):
    """Pre-gain Q quantities (Quu, Qux, Qu, Qxx, Qx) at one step, exploiting
    the integrator structure per dynamics kind:
      1st order: A = I, B = dt I (PosOrnPlannerSys.cpp:119-123);
      2nd order: A = I + dt E (E^2 = 0), B = [dt^2/2 I; dt I]
                 (PosOrnPlannerSys.cpp:125-130) — band algebra, no dense
                 matmuls;
      time-optimal 1st order: chain-rule B = [[s^2 I, 2 s dq], [0, 2 s]]
                 (PosOrnTimePlannerSys.cpp:161-162) — one dense column;
      time-optimal 2nd order: A = I + s^2 E, B last column from the
                 UPDATED velocity dq' = dq + s^2 ddq
                 (PosOrnTimePlannerSys.cpp:165-176) — needs the state
                 velocity lanes `dq` [dof].
    """
    n, m, dof = cc.n, cc.m, cc.dof
    dt = cc.dt
    # stage Hessian: diagonal limit quadratic + optional dense keypoint term
    stage = [[_add(lxx_diag[i] if i == j else 0.0,
                   gxx[i][j] if gxx is not None else 0.0)
              for j in range(n)] for i in range(n)]
    if cc.nb_deriv != 2:
        # A = I: Qxx = lxx + P
        Qxx = [[_add(P[i][j], stage[i][j]) for j in range(n)]
               for i in range(n)]

    if cc.time and cc.nb_deriv == 2:
        # n = 2*dof + 1 ([q, dq, t]), m = dof + 1 ([ddq, s]).
        s_ = u[m - 1]
        dtk = s_ * s_
        b1, b2 = 0.5 * dtk * dtk, dtk
        ddq = u[:dof]
        dqn = [_add(dq[i], _mul(dtk, ddq[i])) for i in range(dof)]
        # chain-rule last column wrt s (PosOrnTimePlannerSys.cpp:176,
        # reading the post-step velocity):
        g1 = [2.0 * s_ * dqn[i] + 2.0 * s_ ** 3 * ddq[i] for i in range(dof)]
        g2 = [2.0 * s_ * ddq[i] for i in range(dof)]
        h = 2.0 * s_

        def bt(M, cols):
            """B^T @ M for M [n][cols]."""
            out = [[_add(_mul(b1, M[j][c]), _mul(b2, M[dof + j][c]))
                    for c in range(cols)] for j in range(dof)]
            out.append([
                _add(_add(sum(_mul(g1[i], M[i][c]) for i in range(dof)),
                          sum(_mul(g2[i], M[dof + i][c]) for i in range(dof))),
                     _mul(h, M[n - 1][c])) for c in range(cols)])
            return out

        # PA = P (I + dtk E): add dtk * q-columns into the dq-columns
        PA = [[P[r][c] if not (dof <= c < 2 * dof)
               else _add(P[r][c], _mul(dtk, P[r][c - dof]))
               for c in range(n)] for r in range(n)]
        # PB [n][m]
        PB = [[_add(_mul(b1, P[r][j]), _mul(b2, P[r][dof + j]))
               for j in range(dof)]
              + [_add(_add(sum(_mul(g1[i], P[r][i]) for i in range(dof)),
                           sum(_mul(g2[i], P[r][dof + i])
                               for i in range(dof))),
                      _mul(h, P[r][n - 1]))]
              for r in range(n)]
        Qux = bt(PA, n)
        Quu = bt(PB, m)
        for i in range(m):
            Quu[i][i] = _add(Quu[i][i], cc.Rt[i])
        Btp = ([_add(_mul(b1, p[j]), _mul(b2, p[dof + j]))
                for j in range(dof)]
               + [_add(_add(sum(_mul(g1[i], p[i]) for i in range(dof)),
                            sum(_mul(g2[i], p[dof + i]) for i in range(dof))),
                       _mul(h, p[n - 1]))])
        Qu = [_add(_mul(cc.Rt[i], u[i]), Btp[i]) for i in range(m)]
        Qx = [_add(lx[c],
                   p[c] if not (dof <= c < 2 * dof)
                   else _add(p[c], _mul(dtk, p[c - dof]))) for c in range(n)]
        # Qxx = A^T (PA) + stage: add dtk * q-rows of PA into the dq-rows
        Qxx = [[_add(stage[r][c],
                     PA[r][c] if not (dof <= r < 2 * dof)
                     else _add(PA[r][c], _mul(dtk, PA[r - dof][c])))
                for c in range(n)] for r in range(n)]
        return Quu, Qux, Qu, Qxx, Qx

    if cc.time:
        s_ = u[m - 1]
        dtk = s_ * s_
        g = [2.0 * s_ * u[i] for i in range(dof)]  # dq_cmd chain-rule column
        h = 2.0 * s_

        def btm(M, cols):
            """B^T @ M for M [n][cols]."""
            out = [[_mul(dtk, M[i][j]) for j in range(cols)]
                   for i in range(dof)]
            out.append([_add(_dot(g, [M[r][j] for r in range(dof)]),
                             _mul(h, M[n - 1][j])) for j in range(cols)])
            return out

        PB = [[_mul(dtk, P[i][j]) for j in range(dof)]
              + [_add(_dot([P[i][r] for r in range(dof)], g),
                      _mul(P[i][n - 1], h))]
              for i in range(n)]
        Qux = btm(P, n)                       # B^T P A with A = I   [m, n]
        Quu = btm(PB, m)                      # B^T P B              [m, m]
        for i in range(m):
            Quu[i][i] = _add(Quu[i][i], cc.Rt[i])
        Btp = ([_mul(dtk, p[i]) for i in range(dof)]
               + [_add(_dot(g, p[:dof]), _mul(h, p[n - 1]))])
        Qu = [_add(_mul(cc.Rt[i], u[i]), Btp[i]) for i in range(m)]
        Qx = [_add(lx[i], p[i]) for i in range(n)]
        return Quu, Qux, Qu, Qxx, Qx

    if cc.nb_deriv == 2:
        b1, b2 = 0.5 * dt * dt, dt
        # PA: add dt * (q-columns) into the dq-columns (A = I + dt E)
        PA = [[P[i][j] if j < dof else _add(P[i][j], _mul(dt, P[i][j - dof]))
               for j in range(n)] for i in range(n)]
        Qux = [[_add(_mul(b1, PA[i][j]), _mul(b2, PA[i + dof][j]))
                for j in range(n)] for i in range(m)]
        PB = [[_add(_mul(b1, P[i][j]), _mul(b2, P[i][j + dof]))
               for j in range(m)] for i in range(n)]
        Quu = [[_add(_add(_mul(b1, PB[i][j]), _mul(b2, PB[i + dof][j])),
                     cc.Rt[i] if i == j else 0.0)
                for j in range(m)] for i in range(m)]
        Qu = [_add(_mul(cc.Rt[i], u[i]),
                   _add(_mul(b1, p[i]), _mul(b2, p[i + dof])))
              for i in range(m)]
        Qx = [_add(lx[j],
                   p[j] if j < dof else _add(p[j], _mul(dt, p[j - dof])))
              for j in range(n)]
        # A^T (PA): add dt * (q-rows of PA) into the dq-rows
        Qxx = [[_add(stage[i][j],
                     PA[i][j] if i < dof
                     else _add(PA[i][j], _mul(dt, PA[i - dof][j])))
                for j in range(n)] for i in range(n)]
        return Quu, Qux, Qu, Qxx, Qx

    # first order: A = I, B = dt I, m == n
    Quu = [[_add(_mul(dt * dt, P[i][j]), cc.Rt[i] if i == j else 0.0)
            for j in range(n)] for i in range(n)]
    Qux = [[_mul(dt, P[i][j]) for j in range(n)] for i in range(n)]
    Qu = [_add(_mul(cc.Rt[i], u[i]), _mul(dt, p[i])) for i in range(n)]
    Qx = [_add(lx[i], p[i]) for i in range(n)]
    return Quu, Qux, Qu, Qxx, Qx


def _al_terms(Quu, Qux, Qu, Qxx, Qx, cx, cu, Ik, g, lam):
    """Add the AL constraint terms (AL-ILQR.cpp:129-134) in place:
    cx [nc][n], cu [nc][m] (consts or traced scalars), Ik/g/lam [nc] lanes.
    Ik carries the penalty-scaled active-set diagonal."""
    nc = len(cx)
    m, n = len(Quu), len(Qux[0])
    lig = [_add(lam[c], _mul(Ik[c], g[c])) for c in range(nc)]
    Icx = [[_mul(Ik[c], cx[c][j]) for j in range(n)] for c in range(nc)]
    Icu = [[_mul(Ik[c], cu[c][i]) for i in range(m)] for c in range(nc)]
    for i in range(m):
        Qu[i] = _add(Qu[i], sum(_mul(cu[c][i], lig[c]) for c in range(nc)))
        for j in range(n):
            Qux[i][j] = _add(Qux[i][j],
                             sum(_mul(cu[c][i], Icx[c][j]) for c in range(nc)))
        for j in range(m):
            Quu[i][j] = _add(Quu[i][j],
                             sum(_mul(cu[c][i], Icu[c][j]) for c in range(nc)))
    for a in range(n):
        Qx[a] = _add(Qx[a], sum(_mul(cx[c][a], lig[c]) for c in range(nc)))
        for b in range(n):
            Qxx[a][b] = _add(Qxx[a][b],
                             sum(_mul(cx[c][a], Icx[c][b]) for c in range(nc)))
    return Quu, Qux, Qu, Qxx, Qx


def _gains_value_lti1(cc: "_Consts", P, p, lxx_diag, lx, u, gxx):
    """Collapsed gain + value recursion for the first-order LTI case
    (A = I, B = dt I, m = n), exact algebra of _q_terms + _gains_value.

    With M = Quu + reg I = dt^2 P + diag(rr), rr = Rt + reg, and K/d from
    the regularized solve (ILQRRecursive.cpp:89-91), substituting
    M K = -Qux and M d = -Qu into the UNregularized value recursion
    (cpp:93-94) cancels every P-dependent product:

        K  = (M^-1 diag(rr) - I) / dt
        d  = -M^-1 Qu,        Qu = Rt u + dt p
        P1 = stage + (diag(rr) - diag(rr) M^-1 diag(rr)) / dt^2 - reg K^T K
        p1 = lx - (Rt u + diag(rr) d) / dt - reg K^T d

    ~2x fewer vector ops per step than the generic path and numerically
    MORE stable (the large mutually-cancelling terms are never formed).
    The Pallas whole-sweep kernel runs the same reduction.
    """
    n = cc.n
    dt = cc.dt
    reg = 1e-6
    inv_dt = 1.0 / dt
    inv_dt2 = inv_dt * inv_dt
    rr = [cc.Rt[i] + reg for i in range(n)]
    M = [[_add(_mul(dt * dt, P[i][j]), rr[i] if i == j else 0.0)
          for j in range(n)] for i in range(n)]
    Qu = [_add(_mul(cc.Rt[i], u[i]), _mul(dt, p[i])) for i in range(n)]
    # One stacked solve: M [S | y] = [diag(rr) | Qu]  ->  S = M^-1 diag(rr)
    rhs = [[rr[i] if i == j else 0.0 for j in range(n)] + [Qu[i]]
           for i in range(n)]
    sol = _solve_aug(M, rhs)
    K = [[_mul(inv_dt, _sub_(sol[i][j], 1.0 if i == j else 0.0))
          for j in range(n)] for i in range(n)]
    d = [_neg(sol[i][n]) for i in range(n)]

    P1 = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i, n):
            acc = _mul(inv_dt2, _sub_(rr[i] if i == j else 0.0,
                                      _mul(rr[i], sol[i][j])))
            acc = _sub_(acc, _mul(reg, sum(_mul(K[k][i], K[k][j])
                                           for k in range(n))))
            if i == j:
                acc = _add(acc, lxx_diag[i])
            if gxx is not None:
                acc = _add(acc, gxx[i][j])
            P1[i][j] = acc
            if j != i:
                P1[j][i] = acc
    p1 = [_sub_(_sub_(lx[i],
                      _mul(inv_dt, _add(_mul(cc.Rt[i], u[i]),
                                        _mul(rr[i], d[i])))),
                _mul(reg, sum(_mul(K[k][i], d[k]) for k in range(n))))
          for i in range(n)]
    return P1, p1, K, d


def _gains_value(Quu, Qux, Qu, Qxx, Qx):
    """Regularized gain elimination + UNregularized value recursion
    (ILQRRecursive.cpp:89-94), in the exact collapsed form.

    With M = Quu + reg I and the gains from the regularized solve
    M K = -Qux, M d = -Qu (cpp:89-91), every Quu-dependent product in the
    unregularized recursion (cpp:93-94) cancels:

        K'Quu K + K'Qux + Qxu K = K'(M K - reg K) + K'Qux + Qxu K
                                = -reg K'K + Qxu K
        K'(Quu d + Qu)          = K'(M d - reg d + Qu) = -reg K'd

    so  P1 = Qxx + Qxu K - reg K'K,   p1 = Qx + Qxu d - reg K'd.

    This is the general-(A, B) analogue of the first-order LTI collapse
    (_gains_value_lti1) and serves the 2nd-order, AL, and time-optimal
    kinds: ~2.5x fewer vector ops than forming K'QuuK/K'Qux explicitly,
    and MORE stable in f32 (the large mutually-cancelling terms are never
    formed). P1 is symmetric (Qxu K = -Qux' M^-1 Qux), so only the upper
    triangle is computed.
    """
    m = len(Quu)
    n = len(Qux[0])
    reg = 1e-6
    M = [[_add(Quu[i][j], reg if i == j else 0.0) for j in range(m)]
         for i in range(m)]
    sol = _solve_aug(M, [Qux[i] + [Qu[i]] for i in range(m)])
    K = [[_neg(sol[i][j]) for j in range(n)] for i in range(m)]
    d = [_neg(sol[i][n]) for i in range(m)]

    P1 = [[None] * n for _ in range(n)]
    for i in range(n):
        Ki = [K[r][i] for r in range(m)]
        Qxi = [Qux[r][i] for r in range(m)]
        for j in range(i, n):
            acc = _add(Qxx[i][j], _dot(Qxi, [K[r][j] for r in range(m)]))
            acc = _sub_(acc, _mul(reg, _dot(Ki, [K[r][j] for r in range(m)])))
            P1[i][j] = acc
            if j != i:
                P1[j][i] = acc
    p1 = [_sub_(_add(Qx[i], _dot([Qux[r][i] for r in range(m)], d)),
                _mul(reg, _dot([K[r][i] for r in range(m)], d)))
          for i in range(n)]
    return P1, p1, K, d


def _backward(cc: "_Consts", X, U, ov=None, al=None):
    """Full backward sweep -> (Ks [H-1,m,n,B], ds [H-1,m,B]).

    Limit-penalty quadratics stream as per-step DIAGONALS (they are diagonal,
    System.cpp:286-308); the dense J^T P J keypoint Hessians enter only at
    the static keypoint steps, gathered per step from a tiny
    [n_kp+1, n, n, B] slot table (last slot zero) inside ONE uniform
    reverse scan — no [H,n,n,B] Hessian array ever exists, and the scan
    body compiles once instead of once per inter-keypoint segment. With
    `al` set, the constraint terms of AL-ILQR.cpp:129-134 are added at
    every step: al = dict(cx, cu (consts when uniform, else [H-1,nc,*]
    arrays), Is, g, lam [H-1,nc,B], uniform).
    """
    n, m, H = cc.n, cc.m, cc.H
    B = X.shape[-1]
    dtype = X.dtype
    Lq, L2 = _limit_arrays(cc, X)  # [H, n, B]
    lx_all = -Lq

    if al is not None and al.get("fold"):
        # Diagonal-AL fold (round 5): when every constraint row touches at
        # most ONE state coordinate and no controls (axis-aligned state
        # bounds — the reference tutorial's case, AL-ILQR.h:19-22 with
        # A = e_j rows), the AL backward terms (AL-ILQR.cpp:129-134) are
        # EXACTLY a diagonal stage update:
        #   Qxx += cx' Ik cx   = diag(sum_c Ik_c coef_c^2 at column j_c)
        #   Qx  += cx'(lam + Ik g)          (one column per constraint)
        #   Quu/Qux/Qu unchanged            (cu = 0)
        # so they fold into the streamed L2/lx arrays and the sweep runs
        # the UNCONSTRAINED backward — un-gating the collapsed LTI
        # recursion and the Pallas whole-sweep kernels for AL problems.
        Is_a, g_a, lam_a = al["Is"], al["g"], al["lam"]  # [H-1, nc, B]
        lig = lam_a + Is_a * g_a
        add2 = jnp.zeros((H - 1, n, B), dtype)
        addx = jnp.zeros((H - 1, n, B), dtype)
        for c, j, coef in al["fold"]:
            add2 = add2.at[:, j].add((coef * coef) * Is_a[:, c])
            addx = addx.at[:, j].add(coef * lig[:, c])
        L2 = L2.at[: H - 1].add(add2)
        lx_all = lx_all.at[: H - 1].add(addx)
        al = None

    # terminal value (cost at H-1 with u = 0, System.cpp:236-246)
    xN = _rows(X[H - 1])
    P = [[jnp.broadcast_to(jnp.asarray(0.0, dtype), (B,))
          + (L2[H - 1, i] if i == j else 0.0) for j in range(n)]
         for i in range(n)]
    p = [jnp.broadcast_to(jnp.asarray(0.0, dtype), (B,)) + lx_all[H - 1, i]
         for i in range(n)]
    if (H - 1) in cc.kp_at:
        _, gx, gxx = _kp_terms_at(cc, H - 1, xN, True, ov)
        p = [p[i] - _full(gx[i], p[i]) for i in range(n)]
        P = [[_add(P[i][j], gxx[i][j]) for j in range(n)] for i in range(n)]

    # --- Pallas whole-sweep path: VMEM-resident (P, p) carry, streamed
    # per-step inputs/outputs, dense keypoint Hessians only at the static
    # keypoint steps (ops/pallas_kernels/segment_backward.py). ---
    mode = getattr(cc, "backward_impl", "auto")
    pallas_scope = al is None and cc.nb_deriv == 1 and not cc.time and m == n
    pallas2_scope = (al is None and cc.nb_deriv == 2 and not cc.time
                     and n == 2 * m)
    pallas_t1_scope = (al is None and cc.nb_deriv == 1 and cc.time
                       and m == n)
    if mode in ("pallas", "pallas_interpret") and not (
            pallas_scope or pallas2_scope or pallas_t1_scope):
        # Loud failure, matching segment_backward_pallas's behavior on an
        # untileable B: silently running the XLA scan here would let bench
        # configs report XLA numbers as Pallas.
        raise ValueError(
            f"backward={mode!r} requested but the workload is outside the "
            f"Pallas sweeps' scope (needs first-order m == n, 2nd-order "
            f"n == 2m, or time-optimal first-order m == n — and no AL "
            f"terms; got nb_deriv={cc.nb_deriv}, time={cc.time}, m={m}, "
            f"n={n}, al={'set' if al is not None else 'None'})")

    def pallas_prep():
        """(P_arr, p_arr, lx_arr, gxx_arr, inner_kps) shared by both
        whole-sweep kernels: terminal carry as arrays, keypoint stage
        gradients folded into lx rows, dense Hessians stacked per slot."""
        like = X[0, 0]
        inner_kps = sorted(k for k in cc.kp_at if k < H - 1)
        lx_arr = lx_all[:H - 1]
        if inner_kps:
            gxx_rows, gx_rows = [], []
            for k in inner_kps:
                _, gx_k, gxx_k = _kp_terms_at(cc, k, _rows(X[k]), True, ov)
                gxx_rows.append(_to_arr(
                    [[_full(v, like) for v in row] for row in gxx_k]))
                gx_rows.append(jnp.stack(
                    [_full(gx_k[i], like) for i in range(n)]))
            idx = jnp.asarray(inner_kps)
            lx_arr = lx_arr.at[idx].add(-jnp.stack(gx_rows))
            gxx_arr = jnp.stack(gxx_rows)
        else:
            gxx_arr = jnp.zeros((0, n, n, B), dtype)
        P_arr = _to_arr([[_full(v, like) for v in row] for row in P])
        p_arr = jnp.stack([_full(v, like) for v in p])
        return P_arr, p_arr, lx_arr, gxx_arr, tuple(inner_kps)

    if mode != "xla" and pallas_scope:
        from ilqr_planner_tpu.ops.pallas_kernels.segment_backward import (
            pallas_backward_supported, segment_backward_pallas)

        interp = (mode == "pallas_interpret")
        if (mode in ("pallas", "pallas_interpret")
                or pallas_backward_supported(B, n, m, 1, False, False, dtype)):
            P_arr, p_arr, lx_arr, gxx_arr, inner_kps = pallas_prep()
            return segment_backward_pallas(
                P_arr, p_arr, L2[:H - 1], lx_arr, U, gxx_arr,
                inner_kps, cc.dt, cc.Rt, interpret=interp)

    if mode != "xla" and pallas2_scope:
        from ilqr_planner_tpu.ops.pallas_kernels import segment_backward_2nd

        interp = (mode == "pallas_interpret")
        if (mode in ("pallas", "pallas_interpret")
                or (segment_backward_2nd.PALLAS2_AUTO
                    and segment_backward_2nd.pallas2_backward_supported(
                        B, n, m, 2, False, False, dtype))):
            P_arr, p_arr, lx_arr, gxx_arr, inner_kps = pallas_prep()
            return segment_backward_2nd.segment_backward_pallas_2nd(
                P_arr, p_arr, L2[:H - 1], lx_arr, U, gxx_arr,
                inner_kps, cc.dt, cc.Rt, interpret=interp)

    if mode != "xla" and pallas_t1_scope:
        from ilqr_planner_tpu.ops.pallas_kernels import segment_backward_2nd

        interp = (mode == "pallas_interpret")
        if (mode in ("pallas", "pallas_interpret")
                or (segment_backward_2nd.PALLAS_TIME1_AUTO
                    and segment_backward_2nd.pallas_time1_backward_supported(
                        B, n, m, 1, True, False, dtype))):
            P_arr, p_arr, lx_arr, gxx_arr, inner_kps = pallas_prep()
            return segment_backward_2nd.segment_backward_pallas_time1(
                P_arr, p_arr, L2[:H - 1], lx_arr, U, gxx_arr,
                inner_kps, cc.Rt, interpret=interp)

    # the time-optimal 2nd-order B needs the state velocity lanes at each
    # step (PosOrnTimePlannerSys.cpp:165-176)
    need_dq = cc.time and cc.nb_deriv == 2

    lti1 = al is None and cc.nb_deriv == 1 and not cc.time and cc.m == cc.n

    def full_step(P, p, l2_t, lx_t, u_t, gxx=None, al_t=None, dq_t=None):
        if lti1:
            # collapsed recursion: exact algebra, ~2x fewer ops
            return _gains_value_lti1(cc, P, p, l2_t, lx_t, u_t, gxx)
        Quu, Qux, Qu, Qxx, Qx = _q_terms(cc, P, p, l2_t, lx_t, u_t, gxx,
                                         dq=dq_t)
        if al_t is not None:
            Quu, Qux, Qu, Qxx, Qx = _al_terms(Quu, Qux, Qu, Qxx, Qx, *al_t)
        return _gains_value(Quu, Qux, Qu, Qxx, Qx)

    # --- XLA path (round 5): ONE uniform reverse scan over all H-1 steps.
    # The dense keypoint Hessians live in a small [n_kp+1, n, n, B] constant
    # whose LAST slot is zero; each step gathers its slot (non-keypoint
    # steps gather the zero slot, and x + 0.0 is IEEE-exact, so the values
    # are identical to the former per-segment walk). One scan body compiles
    # ONCE, replacing one compiled body per inter-keypoint segment plus an
    # unrolled trace chunk per keypoint step — the dominant XLA-compile cost
    # on the multi-keypoint 2nd-order/AL workloads (posorn2nd cold compile
    # measured 32.4 s -> see docs/round5_notes.md item 3). The keypoint
    # stage GRADIENTS fold into lx_all rows outside the scan (a - b and
    # a + (-b) are the same IEEE operation).
    inner_kps = sorted(k for k in cc.kp_at if k < H - 1)
    like = X[0, 0]
    lx_arr = lx_all[:H - 1]
    gxx_const = None
    if inner_kps:
        gxx_rows, gx_rows = [], []
        for k in inner_kps:
            _, gx_k, gxx_k = _kp_terms_at(cc, k, _rows(X[k]), True, ov)
            gxx_rows.append(_to_arr(
                [[_full(v, like) for v in row] for row in gxx_k]))
            gx_rows.append(jnp.stack(
                [_full(gx_k[i], like) for i in range(n)]))
        idx = jnp.asarray(inner_kps)
        lx_arr = lx_arr.at[idx].add(-jnp.stack(gx_rows))
        gxx_const = jnp.concatenate(
            [jnp.stack(gxx_rows), jnp.zeros((1, n, n, B), dtype)], axis=0)
        slots = np.full(H - 1, len(inner_kps), np.int32)
        for i, k in enumerate(inner_kps):
            slots[k] = i
        slot_arr = jnp.asarray(slots)

    def step(carry, inp):
        P_c, p_c = carry
        dq_t = None
        if need_dq:
            inp, dqa = inp[:-1], inp[-1]
            dq_t = _rows(dqa)
        gxx_t = None
        if gxx_const is not None:
            inp, slot = inp[:-1], inp[-1]
            gxx_t = _mat(jax.lax.dynamic_index_in_dim(
                gxx_const, slot, keepdims=False))
        if al is None:
            l2_t, lx_t, u_t = inp
            al_t = None
        else:
            l2_t, lx_t, u_t, extra = inp
            if al["uniform"]:
                Is_t, g_t, lam_t = extra
                cx_t, cu_t = al["cx"], al["cu"]
            else:
                cxa, cua, Is_t, g_t, lam_t = extra
                cx_t = [[cxa[c, j] for j in range(n)] for c in range(al["nc"])]
                cu_t = [[cua[c, j] for j in range(m)] for c in range(al["nc"])]
            al_t = (cx_t, cu_t, _rows(Is_t), _rows(g_t), _rows(lam_t))
        P1, p1, K, d = full_step(_mat(P_c), _rows(p_c), _rows(l2_t),
                                 _rows(lx_t), _rows(u_t), gxx=gxx_t,
                                 al_t=al_t, dq_t=dq_t)
        return (_to_arr(P1), jnp.stack(p1)), (_to_arr(K), jnp.stack(d))

    carry = (_to_arr([[_full(v, like) for v in row] for row in P]),
             jnp.stack([_full(v, like) for v in p]))
    inputs = (L2[:H - 1], lx_arr, U)
    if al is not None:
        extra = (al["Is"], al["g"], al["lam"])
        if not al["uniform"]:
            extra = (al["cx"], al["cu"]) + extra
        inputs = inputs + (extra,)
    if gxx_const is not None:
        inputs = inputs + (slot_arr,)
    if need_dq:
        inputs = inputs + (X[:H - 1, cc.dof:2 * cc.dof],)
    (_, _), (Ks, ds) = jax.lax.scan(step, carry, inputs, reverse=True,
                                    unroll=cc.unroll)
    return Ks, ds


# ---------------------------------------------------------------------------
# full solve: iteration scan + backtracking trial scan, all lanes masked
# ---------------------------------------------------------------------------

class _FleetSolver:
    """Callable wrapper: __call__ runs the jitted solve; `inner` is the
    un-jitted traceable function for embedding in shard_map/pjit programs."""

    def __init__(self, fn, jit_fn):
        self.inner = fn
        self._jit = jit_fn

    def __call__(self, *args, **kw):
        return self._jit(*args, **kw)


def _alpha_schedule(cc, line_search):
    if line_search:
        alphas = tuple(2.0 ** -i for i in range(11))  # 1 .. 2^-10
    else:
        alphas = (1.0,)
    return jnp.asarray(np.asarray(alphas, cc.np_dtype))


def _bind_ov(cc: "_Consts", ov_names, ov):
    """Move the scenario axis of override arrays to the lane (minor) axis.

    Returns one dict per subsystem. For sequential specs each override value
    must be a per-sub list (entries may be None to keep that sub's
    constants); for plain specs the single array applies to the one sub.
    """
    if not ov_names:
        return None
    missing = [k for k in ov_names if k not in (ov or {})]
    if missing:
        raise ValueError(f"missing override arrays: {missing}")
    out = []
    for i in range(len(cc.subs)):
        d = {}
        for k in ov_names:
            v = ov[k]
            if cc.kind == "sequential":
                if not isinstance(v, (list, tuple)) or len(v) != len(cc.subs):
                    raise ValueError(
                        f"sequential override {k!r} must be a list with one "
                        f"entry per subsystem ({len(cc.subs)}), None to skip")
                v = v[i]
                if v is None:
                    continue
            d[k] = jnp.moveaxis(jnp.asarray(v), 0, -1)
        out.append(d)
    return tuple(out)


def _run_trials(cc: "_Consts", a_sched, X, U, cost0, Ks, ds, x0, ovb,
                inactive):
    """Backtracking trials alpha = 1, 1/2, ..., 2^-10 as a while_loop over
    the alpha grid: the FIRST acceptable trial is adopted per lane and the
    floor trial sticks on floor-out (identical decisions to the reference's
    sequential backtracking, ILQRRecursive.cpp:101-157). The loop EXITS as
    soon as every lane has accepted — in the common all-lanes-accept-
    alpha=1 regime that is one rollout pass instead of eleven. `inactive`
    lanes (frozen by done-masking; their picked values are discarded by the
    caller) are pre-seeded as accepted so they never force extra passes.

    (Measured on the TPU: vmapping the alpha axis into the rollout — one
    H-scan of 11x-wide ops — is 4.6x SLOWER; the 11x carry spills out of
    VMEM. Sequential passes with early exit keep each step's working set
    resident AND skip the unused tail of the grid.)
    """
    B = cost0.shape[0]
    dtype = cost0.dtype
    n_alpha = a_sched.shape[0]
    dummy = (X, U, cost0, jnp.zeros((B,), dtype), jnp.ones((B,), dtype))

    # Pallas whole-trajectory rollout for the time-optimal 1st-order kind
    # (ops/pallas_kernels/rollout_time1.py): VMEM-resident state carry,
    # streamed (K, d, xo, uo); limit/keypoint costs assembled over the
    # returned trajectory — identical trial decisions up to reduction-
    # order rounding (the affine line search's contract).
    roll = None
    rmode = getattr(cc, "rollout_impl", "auto")
    if (rmode != "xla" and cc.time and cc.nb_deriv == 1
            and cc.m == cc.n):
        from ilqr_planner_tpu.ops.pallas_kernels import rollout_time1 as _rt1

        interp = rmode == "pallas_interpret"
        if (rmode in ("pallas", "pallas_interpret")
                or (_rt1.ROLLOUT_T1_AUTO
                    and _rt1.rollout_time1_supported(B, cc.n, cc.m, 1, True,
                                                     dtype))):
            steps = _rt1.build_steps(Ks, ds, X, U)

            def roll(a):
                Xt, Ut, du2 = _rt1.rollout_from_steps(
                    a, steps, x0, cc.H, cc.n, cc.m, interp)
                ct = _static_step_costs(cc, Xt, Ut, ovb,
                                        _limit_cost_full(cc, Xt))
                dut = jnp.sum(jnp.sqrt(du2), axis=0)
                return Xt, Ut, ct, dut
    if roll is None:
        roll = lambda a: _rollout(cc, a, Ks, ds, X, U, x0, ovb)  # noqa: E731

    def cond(st):
        i, accepted, _ = st
        return (i < n_alpha) & ~jnp.all(accepted)

    def body(st):
        i, accepted, best = st
        a = a_sched[i]
        Xt, Ut, ct, dut = roll(a)
        ok = (ct < cost0) & ~jnp.isnan(ct)
        take = ~accepted  # first passing alpha wins; floor-out sticks
        sel = lambda b, o: jnp.where(take, o, b)
        best = (sel(best[0], Xt), sel(best[1], Ut), sel(best[2], ct),
                sel(best[3], dut), sel(best[4], jnp.broadcast_to(a, (B,))))
        return (i + 1, accepted | ok, best)

    _, _, picked = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), inactive, dummy))
    return picked


# ---------------------------------------------------------------------------
# affine line search: for the LTI kinds (everything except sqrt-dt time-
# optimal, whose B depends on u), the closed-loop trial dynamics
#     x_{k+1} = A x_k + B (uo_k + K_k (x_k - xo_k) + alpha d_k)
# are affine in BOTH x and alpha, so the whole trial trajectory is EXACTLY
#     X(alpha) = Xbase + alpha * Xdir,   U(alpha) = Ubase + alpha * Udir
# with (Xbase, Xdir) from ONE scan carrying both (the alpha=0 rollout and
# its alpha-sensitivity). Each backtracking trial then needs no scan at
# all: the cost of X(alpha) is a handful of parallel whole-array ops
# (limit penalty over [H, n, B], keypoint FK at the static steps, control
# quadratics), and ||du(alpha)|| per step is a per-step quadratic in alpha
# whose three coefficients the scan already produced. Identical decisions
# to the sequential re-rollouts (ILQRRecursive.cpp:101-157) up to
# reduction-order rounding; the measured ~2.5 average rollout passes per
# iteration collapse to 1.
# ---------------------------------------------------------------------------

def _limit_cost_full(cc: "_Consts", X):
    """Total limit-penalty cost of a whole trajectory [H, n, B] -> [B]
    (same math as _limit_cost_arr, one shot over the horizon)."""
    cost = jnp.zeros_like(X[0, 0])
    for sc in cc.subs:
        if not sc.limits_set:
            continue
        smax = jnp.asarray(np.asarray(sc.smax, cc.np_dtype))[None, :, None]
        smin = jnp.asarray(np.asarray(sc.smin, cc.np_dtype))[None, :, None]
        w = jnp.asarray(np.asarray(sc.weight, cc.np_dtype))[None, :, None]
        over = X > smax
        under = X < smin
        active = (w != 0) & (over | under)
        Ld = jnp.where(active, sc.penalty, 0.0).astype(X.dtype)
        ql = jnp.where(over, smax - X, jnp.where(under, smin - X, 0.0))
        ql = jnp.where(active, ql, 0.0).astype(X.dtype)
        cost = cost + jnp.sum(Ld * ql * ql, axis=(0, 1))
    return cost


def _affine_family(cc: "_Consts", Ks, ds, Xref, Uref, x0):
    """One scan -> the exact affine trial family:
    Xb/Xd [H, n, B], Ub/Ud [H-1, m, B], and the per-step ||du||^2 quadratic
    coefficients (a, b, c) [H-1, B] with ||du_k(alpha)||^2 =
    a_k + 2 alpha b_k + alpha^2 c_k."""
    dof = cc.dof
    dt = cc.dt

    def step(carry, inp):
        xb, xd = carry
        K, d, xo, uo = inp
        dub = jnp.sum(K * (xb - xo)[None, :, :], axis=1)
        dud = jnp.sum(K * xd[None, :, :], axis=1) + d
        ub = uo + dub
        if cc.nb_deriv == 2:
            # semi-implicit Euler (SimulationInterface.cpp:19-26), applied
            # to the base point and (linearly) to the direction
            xb1 = jnp.concatenate(
                [xb[:dof] + dt * xb[dof:] + (0.5 * dt * dt) * ub,
                 xb[dof:] + dt * ub])
            xd1 = jnp.concatenate(
                [xd[:dof] + dt * xd[dof:] + (0.5 * dt * dt) * dud,
                 xd[dof:] + dt * dud])
        else:
            xb1 = xb + dt * ub
            xd1 = xd + dt * dud
        qa = jnp.sum(dub * dub, axis=0)
        qb = jnp.sum(dub * dud, axis=0)
        qc = jnp.sum(dud * dud, axis=0)
        return (xb1, xd1), (xb1, xd1, ub, dud, qa, qb, qc)

    xd0 = jnp.zeros_like(x0)
    (_, _), (Xbs, Xds, Ub, Ud, qa, qb, qc) = jax.lax.scan(
        step, (x0, xd0), (Ks, ds, Xref[:-1], Uref), unroll=cc.unroll)
    Xb = jnp.concatenate([x0[None], Xbs], axis=0)
    Xd = jnp.concatenate([xd0[None], Xds], axis=0)
    return Xb, Xd, Ub, Ud, qa, qb, qc


def _run_trials_affine(cc: "_Consts", a_sched, X, U, cost0, Ks, ds, x0, ovb,
                       inactive):
    """Drop-in replacement for _run_trials on the LTI kinds: same first-
    passing-alpha/floor-out decisions (ILQRRecursive.cpp:101-157), but the
    alpha grid is walked with SCAN-FREE trials over the precomputed affine
    family — the early-exit while_loop stays (the common all-accept-alpha=1
    regime evaluates one trial), each trial now a few fused whole-array
    passes instead of an H-step rollout."""
    B = cost0.shape[0]
    dtype = cost0.dtype
    H, m = cc.H, cc.m
    n_alpha = a_sched.shape[0]
    Xb, Xd, Ub, Ud, qa, qb, qc = _affine_family(cc, Ks, ds, X, U, x0)

    def trial(a):
        Xa = Xb + a * Xd
        cost = _limit_cost_full(cc, Xa)
        for k in cc.kp_steps:
            if k < H - 1:
                uk = Ub[k] + a * Ud[k]
                for i_sub, _ in cc.kp_at[k]:
                    sc = cc.subs[i_sub]
                    cost = cost + sum(sc.Rt[i] * uk[i] * uk[i]
                                      for i in range(m))
            kc, _, _ = _kp_terms_at(cc, k, _rows(Xa[k]), False, ovb)
            cost = cost + kc
        # ||du_k(alpha)||^2 is exactly a_k + 2 alpha b_k + alpha^2 c_k >= 0;
        # clamp the rounding tail before the sqrt.
        du = jnp.sum(jnp.sqrt(jnp.maximum(
            qa + (2.0 * a) * qb + (a * a) * qc, 0.0)), axis=0)
        return cost, du

    dummy = (cost0, jnp.zeros((B,), dtype), jnp.ones((B,), dtype))

    def cond(st):
        i, accepted, _ = st
        return (i < n_alpha) & ~jnp.all(accepted)

    def body(st):
        i, accepted, best = st
        a = a_sched[i]
        ct, dut = trial(a)
        ok = (ct < cost0) & ~jnp.isnan(ct)
        take = ~accepted  # first passing alpha wins; floor-out sticks
        sel = lambda b, o: jnp.where(take, o, b)
        best = (sel(best[0], ct), sel(best[1], dut),
                sel(best[2], jnp.broadcast_to(a, (B,))))
        return (i + 1, accepted | ok, best)

    _, _, (costn, du_acc, alpha) = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), inactive, dummy))
    Xn = Xb + alpha[None, None, :] * Xd
    Un = Ub + alpha[None, None, :] * Ud
    return Xn, Un, costn, du_acc, alpha


def _pick_ls_mode(cc: "_Consts", ls: str) -> bool:
    """Resolve the line-search implementation knob -> use_affine bool.

    'auto': affine for the LTI kinds (everything except sqrt-dt time-
    optimal, whose B depends on u so the trial family is not affine in
    alpha), scan otherwise. 'affine'/'scan' force (affine on a time-optimal
    kind is a hard error — the algebra does not apply)."""
    if ls not in ("auto", "affine", "scan"):
        raise ValueError(f"ls must be auto/affine/scan, got {ls!r}")
    if ls == "affine" and cc.time:
        raise ValueError(
            "ls='affine' requires LTI dynamics; the sqrt-dt time-optimal "
            "kinds have control-dependent B (PosOrnTimePlannerSys.cpp:"
            "149-184) so trial trajectories are not affine in alpha")
    return ls == "affine" or (ls == "auto" and not cc.time)


def make_fleet_solver(spec: Spec, nb_iter: int, line_search: bool = True,
                      early_stop: bool = True, overrides=(), unroll: int = 1,
                      backward: str = "auto", ls: str = "auto",
                      record: bool = False, rollout: str = "auto"):
    """Build a jitted lane-major fleet solve: (x0s [B,n], U0s [B,H-1,nu]
    [, ov]) -> ILQRResult with a leading scenario axis. The spec must be
    concrete (not traced); its arrays fold into the program as constants.

    overrides: static tuple of Spec leaf names from FLEET_OVERRIDES that
    vary per scenario; the solve then takes a third argument, a dict of
    arrays with leading scenario axis (mu [B,H,nt], prec [B,H,nQ,nQ],
    pos_radius [B,H], orn_thresh [B,H,3]).

    backward: 'auto' (Pallas whole-sweep kernel when the workload and
    backend support it, else the XLA segmented scan), 'xla', 'pallas'
    (force), or 'pallas_interpret' (force, interpreter mode — CPU tests).

    ls: line-search implementation — 'auto' (the scan-free affine-family
    trials on LTI kinds, sequential re-rollouts on time-optimal kinds),
    'affine' or 'scan' to force. Affine evaluates identical accept/floor
    decisions up to reduction-order rounding (see _run_trials_affine).

    record: return per-lane per-iteration {"cost": [B, nb_iter], "alpha":
    [B, nb_iter]} buffers in result.progress (NaN beyond each lane's
    executed iterations) — tunnel-safe progress without host callbacks.

    rollout: trial-rollout implementation for the scan line search —
    'auto' (the Pallas whole-trajectory kernel on the time-optimal
    1st-order kind when supported, else the lax.scan rollout), 'xla',
    'pallas', 'pallas_interpret' (force). Irrelevant when the affine line
    search applies (LTI kinds evaluate trials scan-free).
    """
    if backward not in ("auto", "xla", "pallas", "pallas_interpret"):
        raise ValueError(f"backward must be auto/xla/pallas/pallas_interpret,"
                         f" got {backward!r}")
    if rollout not in ("auto", "xla", "pallas", "pallas_interpret"):
        raise ValueError(f"rollout must be auto/xla/pallas/pallas_interpret,"
                         f" got {rollout!r}")
    cc = _Consts(spec, overrides)
    cc.unroll = int(unroll)
    cc.backward_impl = backward
    cc.rollout_impl = rollout
    if rollout in ("pallas", "pallas_interpret") and not (
            cc.time and cc.nb_deriv == 1 and cc.m == cc.n):
        raise ValueError(
            f"rollout={rollout!r} requested but the workload is outside the "
            f"rollout kernel's scope (time-optimal first-order, m == n; got "
            f"nb_deriv={cc.nb_deriv}, time={cc.time}, m={cc.m}, n={cc.n})")
    use_affine = _pick_ls_mode(cc, ls)
    n, m, H = cc.n, cc.m, cc.H
    a_sched = _alpha_schedule(cc, line_search)
    ov_names = tuple(overrides)

    def solve(x0s, U0s, ov=None):
        x0 = jnp.moveaxis(jnp.asarray(x0s), 0, -1)      # [n, B]
        U0 = jnp.moveaxis(jnp.asarray(U0s), 0, -1)      # [H-1, m, B]
        ovb = _bind_ov(cc, ov_names, ov)
        B = x0.shape[-1]
        dtype = x0.dtype
        zK = jnp.zeros((H - 1, m, n, B), dtype)
        zd = jnp.zeros((H - 1, m, B), dtype)
        zX = jnp.zeros((H, n, B), dtype)
        X, U, cost0, _ = _rollout(cc, 0.0, zK, zd, zX, U0, x0, ovb)

        def iter_body(carry):
            X, U, cost0, Ks, ds, it, done, alpha_l, du_l = carry[:9]
            active = ~done & (it < nb_iter)
            Ks_n, ds_n = _backward(cc, X, U, ovb)
            run = _run_trials_affine if use_affine else _run_trials
            picked = run(cc, a_sched, X, U, cost0, Ks_n, ds_n, x0,
                         ovb, ~active)
            Xn, Un, costn, du_acc, alpha = picked

            new_done = done | (early_stop
                               & (alpha * jnp.sqrt(du_acc) < 1e-3)
                               & (costn < 1e-3))
            new = (Xn, Un, costn, Ks_n, ds_n, it + 1, new_done, alpha, du_acc)
            old = (X, U, cost0, Ks, ds, it, done, alpha_l, du_l)
            if record:
                # per-lane (cost, alpha) row write at each lane's own
                # executed-iteration index (tunnel-safe progress buffer)
                pc, pa = carry[9], carry[10]
                row = jnp.arange(nb_iter)[:, None] == it[None, :]
                new = new + (jnp.where(row, costn[None, :], pc),
                             jnp.where(row, alpha[None, :], pa))
                old = old + (pc, pa)
            return jax.tree_util.tree_map(
                lambda o, nw: jnp.where(active, nw, o), old, new)

        # Iterations as a while_loop with per-lane masking: lanes freeze
        # independently when done or at their iteration budget (identical
        # results to the fixed-length masked scan), and the loop exits
        # outright once EVERY lane is frozen — with early stopping this
        # skips the all-lanes-converged tail entirely.
        def iter_cond(carry):
            it, done = carry[5], carry[6]
            return jnp.any(~done & (it < nb_iter))

        carry0 = (X, U, cost0, zK, zd, jnp.zeros((B,), jnp.int32),
                  jnp.zeros((B,), bool), jnp.ones((B,), dtype),
                  jnp.zeros((B,), dtype))
        if record:
            nanf = jnp.full((nb_iter, B), jnp.nan, dtype)
            carry0 = carry0 + (nanf, nanf)
        out = jax.lax.while_loop(iter_cond, iter_body, carry0)
        X, U, cost, Ks, ds, it, done, alpha = out[:8]
        progress = ({"cost": jnp.moveaxis(out[9], -1, 0),
                     "alpha": jnp.moveaxis(out[10], -1, 0)}
                    if record else None)

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
            progress=progress,
        )

    return _FleetSolver(solve, jax.jit(solve))


def make_fleet_solver_al(spec: Spec, constraints: Constraints, nb_iter: int,
                         lag_update_step: int, penalty: float,
                         scaling_factor: float, line_search: bool = True,
                         early_stop: bool = True, unroll: int = 1,
                         ls: str = "auto", backward: str = "auto"):
    """Lane-major AL-iLQR fleet: (x0s [B,n], U0s [B,H-1,nu], lam0
    [nc] | [H-1,nc] | [B,H-1,nc]) -> ALILQRResult with a leading scenario
    axis. Reproduces al_ilqr._solve_body_sparse per lane: plain-cost line
    search (AL-ILQR.cpp:193-199), active sets from the accepted trajectory
    with the pre-update lam/penalty, dual update every lag_update_step
    iterations (cpp:202-208), early stop alpha*sqrt(sum||du||) < 1e-3
    (cpp:225) — per-lane masked so converged scenarios freeze."""
    if backward not in ("auto", "xla", "pallas", "pallas_interpret"):
        raise ValueError(f"backward must be auto/xla/pallas/pallas_interpret,"
                         f" got {backward!r}")
    cc = _Consts(spec)
    cc.unroll = int(unroll)
    cc.backward_impl = backward
    use_affine = _pick_ls_mode(cc, ls)
    n, m, H = cc.n, cc.m, cc.H
    A = np.asarray(constraints.A, cc.np_dtype)   # [H-1, nc, n+m]
    bv = np.asarray(constraints.b, cc.np_dtype)  # [H-1, nc]
    nc = A.shape[1]
    uniform = bool(np.all(A == A[0]) and np.all(bv == bv[0]))
    # Diagonal-AL fold plan (see _backward): uniform constraints whose rows
    # touch no controls and at most one state coordinate each fold exactly
    # into the streamed stage arrays. Rows that are entirely zero are inert
    # (cx = cu = 0 contributes nothing, matching the reference's padding).
    fold = None
    if uniform and np.all(A[0, :, n:] == 0) \
            and np.all(np.count_nonzero(A[0, :, :n], axis=1) <= 1):
        fold = []
        for c in range(nc):
            nz = np.nonzero(A[0, c, :n])[0]
            if nz.size == 1:
                fold.append((c, int(nz[0]), float(A[0, c, nz[0]])))
        fold = fold or None
    al_static = {
        "nc": nc,
        "uniform": uniform,
        "fold": fold,
        "cx": ([[float(v) for v in A[0, c, :n]] for c in range(nc)]
               if uniform else jnp.asarray(A[:, :, :n])),
        "cu": ([[float(v) for v in A[0, c, n:]] for c in range(nc)]
               if uniform else jnp.asarray(A[:, :, n:])),
    }
    A_j = jnp.asarray(A)
    b_j = jnp.asarray(bv)
    a_sched = _alpha_schedule(cc, line_search)

    def active_sets(X, U, lam, penalty):
        """Penalty-scaled active sets + violations over the whole horizon
        (AL-ILQR.cpp:21-44, captured per accepted rollout cpp:189-191).

        HIGHEST precision on the violation einsum: g drives active-set
        membership and the dual updates lambda = max(0, lambda + rho*g), and
        AL converges exactly where g -> 0 — the TPU's default bf16 matmul
        passes would put ~1e-2 relative error right there (this is the only
        traced matmul in the fleet module; everything else is unrolled
        scalar algebra unaffected by matmul precision)."""
        XU = jnp.concatenate([X[:-1], U], axis=1)          # [H-1, n+m, B]
        g = jnp.einsum("kcj,kjb->kcb", A_j, XU,
                       precision=jax.lax.Precision.HIGHEST) - b_j[:, :, None]
        inactive = (g < 0) & (lam == 0)
        Ik = jnp.where(inactive, 0.0, 1.0).astype(X.dtype)
        return penalty[None, None, :] * Ik, g

    def solve(x0s, U0s, lam0):
        x0 = jnp.moveaxis(jnp.asarray(x0s), 0, -1)      # [n, B]
        U0 = jnp.moveaxis(jnp.asarray(U0s), 0, -1)      # [H-1, m, B]
        B = x0.shape[-1]
        dtype = x0.dtype
        lam = jnp.asarray(lam0, dtype)
        if lam.ndim == 1:
            lam = jnp.broadcast_to(lam, (H - 1,) + lam.shape)
        if lam.ndim == 2:
            lam = jnp.broadcast_to(lam[..., None], lam.shape + (B,))
        else:  # [B, H-1, nc] per-scenario duals
            lam = jnp.moveaxis(lam, 0, -1)
        pen = jnp.full((B,), penalty, dtype)
        scaling = jnp.asarray(scaling_factor, dtype)

        zK = jnp.zeros((H - 1, m, n, B), dtype)
        zd = jnp.zeros((H - 1, m, B), dtype)
        zX = jnp.zeros((H, n, B), dtype)
        X, U, cost0, _ = _rollout(cc, 0.0, zK, zd, zX, U0, x0)
        Is0, g0 = active_sets(X, U, lam, pen)

        def iter_body(carry):
            X, U, Is, g, cost0, lam, pen, it, done = carry
            active = ~done & (it < nb_iter)
            al = dict(al_static, Is=Is, g=g, lam=lam)
            Ks_n, ds_n = _backward(cc, X, U, None, al)
            run = _run_trials_affine if use_affine else _run_trials
            picked = run(cc, a_sched, X, U, cost0, Ks_n, ds_n, x0,
                         None, ~active)
            Xn, Un, costn, du_acc, alpha = picked

            # Active sets from the accepted trajectory with the pre-update
            # lam/penalty — the values the accepted trial's rollout captured.
            Isn, gn = active_sets(Xn, Un, lam, pen)

            # Dual/penalty update every lag_update_step iterations.
            do_update = ((it + 1) % lag_update_step) == 0  # [B] int lanes
            pen_n = jnp.where(do_update, pen * scaling, pen)
            lam_n = jnp.where(do_update[None, None, :],
                              jnp.maximum(lam + pen_n[None, None, :] * gn, 0.0),
                              lam)

            new_done = done | (early_stop
                               & (alpha * jnp.sqrt(du_acc) < 1e-3))
            new = (Xn, Un, Isn, gn, costn, lam_n, pen_n, it + 1, new_done)
            old = (X, U, Is, g, cost0, lam, pen, it, done)
            return jax.tree_util.tree_map(
                lambda o, nw: jnp.where(active, nw, o), old, new)

        # Per-lane-masked while_loop (see make_fleet_solver): exits as soon
        # as every lane is done or at budget — for the reference's 100-
        # iteration AL schedule most lanes early-stop far sooner.
        def iter_cond(carry):
            it, done = carry[7], carry[8]
            return jnp.any(~done & (it < nb_iter))

        carry0 = (X, U, Is0, g0, cost0, lam, pen,
                  jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool))
        X, U, _, _, cost, lam, _, it, _ = jax.lax.while_loop(
            iter_cond, iter_body, carry0)

        fX = _fx_traj(cc, X)
        return ALILQRResult(
            X=jnp.moveaxis(X, -1, 0),
            fX=fX,
            U=jnp.moveaxis(U, -1, 0),
            multipliers=jnp.moveaxis(lam, -1, 0),
            cost=cost,
            iterations=it,
        )

    return _FleetSolver(solve, jax.jit(solve))


def _fx_traj(cc: "_Consts", X):
    """fX [B, H, nt_total] for the whole accepted trajectory: the horizon
    flattens into the lane axis so each FK walk runs once over H*B lanes;
    sequential subs concatenate (SequentialSystem.cpp:93-113)."""
    H, n = cc.H, cc.n
    B = X.shape[-1]
    x_flat = [X[:, i].reshape(H * B) for i in range(n)]
    need_fk = any(sc.kind not in ("joint", "joint_time") for sc in cc.subs)
    want_vel = cc.nb_deriv == 2 and need_fk
    fkds = (_fk_subs(cc, x_flat, want_jac=want_vel, want_vel=want_vel)
            if need_fk else [None] * len(cc.subs))
    comps = []
    for sc, fkd in zip(cc.subs, fkds):
        if sc.kind in ("joint", "joint_time"):
            comps += x_flat[:sc.n]
            continue
        if sc.kind == "point":
            sub = fkd["p"][:sc.car_dim]
            if sc.nb_deriv == 2:
                sub = sub + fkd["dp"][:sc.car_dim]
        else:
            sub = fkd["p"] + fkd["quat"]
            if sc.nb_deriv == 2:
                sub = sub + fkd["dp"] + fkd["dquat"]
        if sc.time:
            sub = sub + [x_flat[n - 1]]
        comps += sub
    fx = jnp.stack([_full(v, x_flat[0]) for v in comps])  # [nt, H*B]
    return fx.reshape(len(comps), H, B).transpose(2, 1, 0)
