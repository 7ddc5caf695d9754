"""Traced system functions: forward map, residuals, dynamics, costs.

These are the pure-function equivalents of the reference's System virtual
API (System.h:28-194): `fx_jac` replaces the stateful getFxJac teleport
(System.cpp:163-179), `residual` the keypoint diff family, `dynamics` the
forwardPass integrators, and the cost helpers the quadratized Gauss-Newton
cost family (System.cpp:213-311). All functions take a single (unbatched)
sample; batch with vmap.

Reproduced reference quirks (load-bearing for parity):
  * The control penalty u'Ru enters the *cost value* only at keypoint steps
    (it lives inside the kp branch, System.cpp:217-221), while the cost
    gradient/Hessian use R unconditionally (System.cpp:274-284).
  * The joint-limit penalty L is a 0/1-diagonal scaled by `penalty` and the
    quadratic term in cost_xx is L^T L = penalty^2 (System.cpp:286-308).
  * The time-optimal second-order B's last column uses the *updated* joint
    velocity (PosOrnTimePlannerSys.cpp:176 reads getJointsVel after sendAcc).
"""

import jax.numpy as jnp

from ilqr_planner_tpu.models.robot import robot_kin
from ilqr_planner_tpu.ops import sd
from ilqr_planner_tpu.systems.spec import Spec

__all__ = [
    "fx_jac",
    "residual",
    "prec_at",
    "dynamics",
    "stage_cost",
    "final_cost",
    "limit_terms",
    "ctrl_cost",
]


# --------------------------------------------------------------------------
# state unpacking
# --------------------------------------------------------------------------

def _unpack(spec: Spec, x):
    """x -> (q, dq, t). dq is zero for first-order states (System.cpp:164-169)."""
    dof = spec.dof
    q = x[..., :dof]
    if spec.nb_deriv == 2:
        dq = x[..., dof : 2 * dof]
    else:
        dq = jnp.zeros_like(q)
    t = x[..., -1] if spec.time_optimal else None
    return q, dq, t


# --------------------------------------------------------------------------
# forward map f(x) and its Jacobian J [nQ, nx]
# --------------------------------------------------------------------------

def fx_jac(spec: Spec, x):
    """(f(x), J) at state x — pure FK, replacing the reference's robot
    teleport-and-restore (System.cpp:163-179).

    J pairs the residual rows with state columns: geometric Jacobian rows for
    task-space kinds (PosOrnPlannerSys.cpp:80-102), identity for joint-space
    (JointSpacePlannerSys.cpp:77-81), +1 unit row/col for the time axis
    (PosOrnTimePlannerSys.cpp:85-112).
    """
    if spec.kind == "sequential":
        parts = [fx_jac(s, x) for s in spec.subs]
        fx = jnp.concatenate([p[0] for p in parts], axis=-1)
        J = jnp.concatenate([p[1] for p in parts], axis=-2)
        return fx, J

    q, dq, t = _unpack(spec, x)
    ks = robot_kin(spec.robot, q, dq)
    dof, nx = spec.dof, spec.nx

    if spec.kind in ("joint", "joint_time"):
        fx = x
        J = jnp.eye(spec.nq_var, nx, dtype=x.dtype)
        return fx, J

    if spec.kind == "point":
        c = spec.robot.nb_car_dim
        Jt = ks.J[..., :c, :]
        if spec.nb_deriv == 1:
            return ks.x, Jt
        fx = jnp.concatenate([ks.x, ks.dx], axis=-1)
        J = jnp.zeros((2 * c, nx), dtype=x.dtype)
        J = J.at[:c, :dof].set(Jt)
        J = J.at[c:, dof:].set(Jt)
        return fx, J

    # posorn / posorn_time
    J6 = ks.J  # [6, dof]
    if spec.nb_deriv == 1:
        fx = jnp.concatenate([ks.x, ks.quat], axis=-1)
        Jcore = J6
        core_rows = 6
    else:
        dquat = sd.quat_rate(ks.quat, ks.w)
        fx = jnp.concatenate([ks.x, ks.quat, ks.dx, dquat], axis=-1)
        core_rows = 12
        Jcore = jnp.zeros((12, 2 * dof), dtype=x.dtype)
        Jcore = Jcore.at[:6, :dof].set(J6)
        Jcore = Jcore.at[6:, dof:].set(J6)

    if spec.kind == "posorn":
        return fx, Jcore

    # posorn_time: append the time component (row/col of 1)
    fx = jnp.concatenate([fx, t[..., None]], axis=-1)
    J = jnp.zeros((core_rows + 1, nx), dtype=x.dtype)
    J = J.at[:core_rows, : Jcore.shape[-1]].set(Jcore)
    J = J.at[core_rows, nx - 1].set(1.0)
    return fx, J


# --------------------------------------------------------------------------
# keypoint residuals
# --------------------------------------------------------------------------

def _safe_div(a, b):
    return a / jnp.where(b == 0, 1.0, b)


def _posorn_residual(spec: Spec, fx, k):
    """PosOrnKeypoint::diff (PosOrnKeypoint.cpp:24-45) with the dead-zone
    shrinkage of PosOrnKeypointDistFunct (cpp:13-35) applied via per-step
    radius/threshold arrays (zero radius/threshold == plain keypoint)."""
    c = spec.robot.nb_car_dim
    mu_k = spec.mu[k]
    p_t, q_t = mu_k[:c], mu_k[c : c + 4]
    p, quat = fx[:c], fx[c : c + 4]
    E = sd.dquat_to_dx_jac(q_t)
    r_p = p_t - p
    r_o = -2.0 * (E @ sd.log_map(q_t, quat))

    # Dead zones (PosOrnKeypointDistFunct.cpp:17-32), applied to the
    # position/orientation residuals only (not the velocity parts).
    radius = spec.pos_radius[k]
    nrm = jnp.sqrt(jnp.sum(r_p * r_p))
    shrunk = _safe_div(r_p, nrm) * (nrm - radius)
    r_p = jnp.where(nrm <= radius, jnp.zeros_like(r_p), shrunk)
    th = spec.orn_thresh[k]
    r_o = jnp.where(
        jnp.abs(r_o) <= th, jnp.zeros_like(r_o), r_o - jnp.sign(r_o) * th
    )

    parts = [r_p, r_o]
    if spec.nb_deriv == 2:
        dp_t, dq_t = mu_k[c + 4 : 2 * c + 4], mu_k[2 * c + 4 : 2 * c + 8]
        dp, dquat = fx[c + 4 : 2 * c + 4], fx[2 * c + 4 : 2 * c + 8]
        r_dp = dp_t - dp
        r_do = -2.0 * (E @ (dq_t - sd.transport(dquat, quat, q_t)))
        parts += [r_dp, r_do]
    return jnp.concatenate(parts, axis=-1)


def residual(spec: Spec, fx, k):
    """Keypoint residual e(f(x), k); zero when step k has no keypoint
    (System.cpp:103-109) or when the state is exactly zero
    (PosOrnKeypoint.cpp:29)."""
    if spec.kind == "sequential":
        es, off = [], 0
        for s in spec.subs:
            es.append(residual(s, fx[off : off + s.nt], k))
            off += s.nt
        return jnp.concatenate(es, axis=-1)

    if spec.kind.startswith("posorn"):
        fx_po = fx[: spec.nt - 1] if spec.time_optimal else fx
        core = _posorn_residual(spec, fx_po, k)
        # Zero-state guard: exists ONLY in PosOrnKeypoint::diff
        # (PosOrnKeypoint.cpp:29, `if (!state.isZero())`) and covers only the
        # pos/orn residual — SpacetimeKeypoint::diff (cpp:19-23) computes the
        # time residual on the unguarded tail, and AngularKeypoint::diff
        # (cpp:24-27) has no guard at all.
        zero_state = jnp.all(fx_po == 0)
        core = jnp.where(zero_state, jnp.zeros_like(core), core)
        if spec.time_optimal:
            r_t = spec.mu[k][-1] - fx[-1]
            core = jnp.concatenate([core, r_t[None]], axis=-1)
        e = core
    else:  # joint / joint_time / point: plain unguarded Euclidean residual
        e = spec.mu[k] - fx

    return e * spec.kp_mask[k]


def prec_at(spec: Spec, k):
    """Precision at step k; block-diagonal over subsystems for sequential
    (SequentialSystem::getQMatrix diagonal-blocks restriction, cpp:229-232)."""
    if spec.kind == "sequential":
        n = spec.nq_var
        P = jnp.zeros((n, n), dtype=spec.subs[0].prec.dtype)
        off = 0
        for s in spec.subs:
            P = P.at[off : off + s.nq_var, off : off + s.nq_var].set(s.prec[k])
            off += s.nq_var
        return P
    return spec.prec[k]


# --------------------------------------------------------------------------
# joint limits
# --------------------------------------------------------------------------

def limit_terms(spec: Spec, x):
    """(L diagonal, violation q) of inspectJointLimit (System.cpp:121-142).

    L entries equal `penalty` where the (weighted) state exceeds its bounds;
    q = bound - x there, else zero.
    """
    over = x > spec.state_max
    under = x < spec.state_min
    active = (spec.limit_weight != 0) & (over | under)
    Ld = jnp.where(active, spec.penalty, 0.0)
    ql = jnp.where(over, spec.state_max - x, jnp.where(under, spec.state_min - x, 0.0))
    ql = jnp.where(active, ql, 0.0)
    return Ld, ql


def _limit_triplet(spec: Spec, x):
    """(cost, L^T q, diag(L^T L)) summed over subsystems when sequential."""
    if spec.kind == "sequential":
        zero = jnp.zeros(spec.nx, dtype=x.dtype)
        cost, Lq, L2 = jnp.asarray(0.0, dtype=x.dtype), zero, zero
        for s in spec.subs:
            c_s, Lq_s, L2_s = _limit_triplet(s, x)
            cost, Lq, L2 = cost + c_s, Lq + Lq_s, L2 + L2_s
        return cost, Lq, L2
    if not spec.limits_set:
        zero = jnp.zeros(spec.nx, dtype=x.dtype)
        return jnp.asarray(0.0, dtype=x.dtype), zero, zero
    Ld, ql = limit_terms(spec, x)
    return jnp.sum(Ld * ql * ql), Ld * ql, Ld * Ld


def ctrl_cost(spec: Spec, u, k):
    """Control penalty as counted in the cost *value*: each (sub)system adds
    u^T R_s u only when it has a keypoint at k (System.cpp:217-221)."""
    if spec.kind == "sequential":
        return sum(ctrl_cost(s, u, k) for s in spec.subs)
    return spec.kp_mask[k] * jnp.sum(spec.Rt * u * u)


# --------------------------------------------------------------------------
# stage / terminal cost
# --------------------------------------------------------------------------

def stage_cost(spec: Spec, x, fx, u, k):
    """cost(x, u, k) = e^T P e + [kp] u^T R u + q_L^T L q_L (System.cpp:213-234)."""
    e = residual(spec, fx, k)
    P = prec_at(spec, k)
    c = e @ (P @ e) + ctrl_cost(spec, u, k)
    lim_c, _, _ = _limit_triplet(spec, x)
    return c + lim_c


def final_cost(spec: Spec, x, fx):
    """cost_F = cost at k = horizon-1 with u = 0 (System.cpp:236-238)."""
    u0 = jnp.zeros(spec.nu, dtype=x.dtype)
    return stage_cost(spec, x, fx, u0, spec.horizon - 1)


def cost_gradients(spec: Spec, x, fx, J, u, k):
    """(l_x, l_u, l_xx) of the Gauss-Newton quadratization
    (System.cpp:248-311): l_x = -J^T P e - L^T q, l_xx = J^T P J + L^T L,
    l_u = R u (top-level R for sequential, System.cpp:274-284)."""
    e = residual(spec, fx, k)
    P = prec_at(spec, k)
    _, Lq, L2 = _limit_triplet(spec, x)
    l_x = -(J.T @ (P @ e)) - Lq
    l_xx = J.T @ P @ J + jnp.diag(L2)
    l_u = spec.Rt * u
    return l_x, l_u, l_xx


# --------------------------------------------------------------------------
# dynamics
# --------------------------------------------------------------------------

def constant_AB(spec: Spec, dtype):
    """(A, B) for the state-independent integrators, or None for the
    time-optimal kinds whose B depends on (x, u)
    (PosOrnTimePlannerSys.cpp:149-184). Solvers use this to avoid carrying
    per-step A/B arrays for LTI dynamics."""
    if spec.kind == "sequential":
        return constant_AB(spec.subs[0], dtype)
    if spec.time_optimal:
        return None
    dof, nx, nu = spec.dof, spec.nx, spec.nu
    dt = spec.dt.astype(dtype)
    eye = jnp.eye(dof, dtype=dtype)
    if spec.nb_deriv == 1:
        return jnp.eye(nx, dtype=dtype), dt * jnp.eye(nx, nu, dtype=dtype)
    A = jnp.eye(nx, dtype=dtype).at[:dof, dof:].set(dt * eye)
    B = jnp.concatenate([0.5 * dt * dt * eye, dt * eye], axis=0)
    return A, B


def dynamics(spec: Spec, x, u):
    """One integrator step: (x_next, A, B).

    Velocity control (nb_deriv=1): q' = q + dt u (sendVel,
    SimulationInterface.cpp:28-31); A = I, B = dt I
    (PosOrnPlannerSys.cpp:119-123).
    Acceleration control (nb_deriv=2): semi-implicit Euler q' = q + dt dq +
    dt^2/2 u, dq' = dq + dt u (SimulationInterface.cpp:19-26); A = [[I, dt I],
    [0, I]], B = [[dt^2/2 I], [dt I]] (PosOrnPlannerSys.cpp:125-130).
    Time-optimal kinds use dt = s^2 with s = u[-1] and the chain-rule B
    columns of PosOrnTimePlannerSys.cpp:149-184.
    """
    if spec.kind == "sequential":
        return dynamics(spec.subs[0], x, u)

    dof = spec.dof
    nx, nu = spec.nx, spec.nu
    dtype = x.dtype
    eye = jnp.eye(dof, dtype=dtype)

    if not spec.time_optimal:
        dt = spec.dt.astype(dtype)
        if spec.nb_deriv == 1:
            xn = x + dt * u
            A = jnp.eye(nx, dtype=dtype)
            B = dt * jnp.eye(nx, nu, dtype=dtype)
            return xn, A, B
        q, dq = x[:dof], x[dof:]
        qn = q + dt * dq + 0.5 * dt * dt * u
        dqn = dq + dt * u
        xn = jnp.concatenate([qn, dqn])
        A = jnp.eye(nx, dtype=dtype).at[:dof, dof:].set(dt * eye)
        B = jnp.concatenate([0.5 * dt * dt * eye, dt * eye], axis=0)
        return xn, A, B

    # time-optimal: s = sqrt(dt) is the last control component
    s = u[-1]
    dt = s * s
    if spec.nb_deriv == 1:
        q, t = x[:dof], x[-1]
        dq_cmd = u[:-1]
        qn = q + dt * dq_cmd
        xn = jnp.concatenate([qn, (t + dt)[None]])
        A = jnp.eye(nx, dtype=dtype)
        B = jnp.zeros((nx, nu), dtype=dtype)
        B = B.at[:dof, :dof].set(dt * eye)
        B = B.at[:dof, -1].set(2.0 * s * dq_cmd)  # PosOrnTimePlannerSys.cpp:161
        B = B.at[-1, -1].set(2.0 * s)
        return xn, A, B

    q, dq, t = x[:dof], x[dof : 2 * dof], x[-1]
    ddq = u[:-1]
    qn = q + dt * dq + 0.5 * dt * dt * ddq
    dqn = dq + dt * ddq
    xn = jnp.concatenate([qn, dqn, (t + dt)[None]])
    A = jnp.eye(nx, dtype=dtype).at[:dof, dof : 2 * dof].set(dt * eye)
    B = jnp.zeros((nx, nu), dtype=dtype)
    B = B.at[:dof, :dof].set(0.5 * dt * dt * eye)
    B = B.at[dof : 2 * dof, :dof].set(dt * eye)
    # Last column: the reference reads the *updated* velocity here
    # (PosOrnTimePlannerSys.cpp:176: getJointsVel() after sendAcc).
    B = B.at[:dof, -1].set(2.0 * s * dqn + 2.0 * s**3 * ddq)
    B = B.at[dof : 2 * dof, -1].set(2.0 * s * ddq)
    B = B.at[-1, -1].set(2.0 * s)
    return xn, A, B
