"""PyLQR.system: keypoints and planner systems (bindings.cpp:219-692).

System wrappers pair a mutable robot (compat.sim) with a dense functional
`Spec`; the stateful methods (forward_pass drives the robot, reset rewinds
it — System.h:66,159) mirror the reference exactly, while solvers consume
the underlying Spec.
"""

import numpy as np

from ilqr_planner_tpu.compat.sim import SimulationInterface
from ilqr_planner_tpu.systems import funcs
from ilqr_planner_tpu.systems import keypoints as _kp
from ilqr_planner_tpu.systems.spec import make_spec, sequential_spec

__all__ = [
    "Keypoint",
    "PosOrnKeypoint",
    "PosOrnKeypointDistFunct",
    "SpacetimeKeypoint",
    "AngularKeypoint",
    "AngularTimeKeypoint",
    "System",
    "PosOrnPlannerSys",
    "PosOrnTimePlannerSys",
    "JointSpacePlannerSys",
    "JointSpaceTimePlannerSys",
    "SequentialSystem",
]

Keypoint = _kp.Keypoint


class _KpAccessors:
    """Reference keypoint getters (bindings.cpp:262-411)."""

    def get_position(self):
        return np.asarray(self.position)

    def get_orientation(self):
        return np.asarray(self.orientation)

    def get_precision(self):
        return np.asarray(self.precision)

    def get_timestep(self):
        return self.timestep

    def get_state(self):
        return self.state()

    def get_continuous_time(self):
        return getattr(self, "continuous_time", None)


class PosOrnKeypoint(_kp.PosOrnKeypoint, _KpAccessors):
    """First order: PosOrnKeypoint(pos, orn, Q, timestep).
    Second order: PosOrnKeypoint(pos, dpos, orn, dorn, Q, timestep)
    (constructor overloads of bindings.cpp:262-311)."""

    def __init__(self, *args, **kwargs):
        if len(args) == 6 and not kwargs:
            pos, dpos, orn, dorn, Q, ts = args
            super().__init__(pos, orn, Q, ts, dposition=dpos, dorientation=dorn)
        else:
            super().__init__(*args, **kwargs)


class PosOrnKeypointDistFunct(_kp.PosOrnKeypointDistFunct, _KpAccessors):
    """First order: (pos, orn, Q, pos_thresh, orn_thresh, timestep).
    Second order: (pos, dpos, orn, dorn, Q, pos_thresh, orn_thresh, timestep)
    (bindings.cpp:303-306)."""

    def __init__(self, *args, **kwargs):
        if len(args) == 6 and not kwargs:
            pos, orn, Q, pos_thresh, orn_thresh, ts = args
            super().__init__(pos, orn, Q, ts, pos_radius=pos_thresh,
                             orn_thresh=orn_thresh)
        elif len(args) == 8 and not kwargs:
            pos, dpos, orn, dorn, Q, pos_thresh, orn_thresh, ts = args
            super().__init__(pos, orn, Q, ts, pos_radius=pos_thresh,
                             orn_thresh=orn_thresh, dposition=dpos,
                             dorientation=dorn)
        else:
            super().__init__(*args, **kwargs)


class SpacetimeKeypoint(_kp.SpacetimeKeypoint, _KpAccessors):
    """First order: SpacetimeKeypoint(pos, orn, Q, continuous_time, timestep).
    Second order: (pos, dpos, orn, dorn, Q, continuous_time, timestep)."""

    def __init__(self, *args, **kwargs):
        if len(args) == 5 and not kwargs:
            pos, orn, Q, ct, ts = args
            super().__init__(pos, orn, Q, ts, ct)
        elif len(args) == 7 and not kwargs:
            pos, dpos, orn, dorn, Q, ct, ts = args
            super().__init__(pos, orn, Q, ts, ct, dposition=dpos, dorientation=dorn)
        else:
            super().__init__(*args, **kwargs)


class AngularKeypoint(_kp.AngularKeypoint, _KpAccessors):
    """AngularKeypoint(q, Q, timestep) or (q, dq, Q, timestep)."""

    def __init__(self, *args, **kwargs):
        if len(args) == 4 and not kwargs:
            q, dq, Q, ts = args
            super().__init__(q, Q, ts, dposition=dq)
        else:
            super().__init__(*args, **kwargs)


class AngularTimeKeypoint(_kp.AngularTimeKeypoint, _KpAccessors):
    """AngularTimeKeypoint(q, Q, continuous_time, timestep) or
    (q, dq, Q, continuous_time, timestep)."""

    def __init__(self, *args, **kwargs):
        if len(args) == 4 and not kwargs:
            q, Q, ct, ts = args
            super().__init__(q, Q, ts, ct)
        elif len(args) == 5 and not kwargs:
            q, dq, Q, ct, ts = args
            super().__init__(q, Q, ts, ct, dposition=dq)
        else:
            super().__init__(*args, **kwargs)


class System:
    """Base wrapper: couples (robot, Spec) and exposes the reference System
    API (System.h:28-194, bindings.cpp:413-692)."""

    def __init__(self, r: SimulationInterface, spec, keypoints):
        self.r = r
        self.spec = spec
        self.keypoints = sorted(keypoints, key=lambda kp: kp.timestep)

    # -- dims / metadata ----------------------------------------------------
    def get_nb_state_var(self):
        return self.spec.nx

    def get_nb_ctrl_var(self):
        return self.spec.nu

    def get_nb_target_var(self):
        return self.spec.nt

    def get_nb_Q_var(self):
        return self.spec.nq_var

    def get_horizon(self):
        return self.spec.horizon

    def get_nb_deriv(self):
        return self.spec.nb_deriv

    def get_kp_indexes(self):
        return [kp.timestep for kp in self.keypoints]

    def get_init_state(self):
        return np.asarray(self.spec.x0)

    def get_init_fx_state(self):
        fx, _ = funcs.fx_jac(self.spec, self.spec.x0)
        return np.asarray(fx)

    # -- state --------------------------------------------------------------
    def reset(self):
        self.r.set_conf(np.asarray(self.spec.q0), np.asarray(self.spec.dq0))

    def get_state(self):
        parts = [self.r.get_q()]
        if self.spec.nb_deriv == 2:
            parts.append(self.r.get_dq())
        if self.spec.time_optimal:
            parts.append([self.r.get_time()])
        return np.concatenate(parts)

    # -- forward map --------------------------------------------------------
    def get_fx_jac(self, xk=None):
        x = self.get_state() if xk is None else np.asarray(xk, float)
        fx, J = funcs.fx_jac(self.spec, x)
        return np.asarray(fx), np.asarray(J)

    def _apply_state(self, x):
        dof = self.spec.dof
        q = np.asarray(x[:dof])
        dq = np.asarray(x[dof:2 * dof]) if self.spec.nb_deriv == 2 else np.zeros(dof)
        self.r.set_conf(q, dq, reset_time=False)
        if self.spec.time_optimal:
            self.r.set_time(float(x[-1]))

    def forward_pass(self, xk, uk, k):
        """(x_{k+1}, f(x_{k+1}), A, B, J) — also drives the robot, like the
        reference (PosOrnPlannerSys.cpp:114-138)."""
        x1, A, B = funcs.dynamics(self.spec, np.asarray(xk, float),
                                  np.asarray(uk, float))
        x1 = np.asarray(x1)
        self._apply_state(x1)
        fx, J = funcs.fx_jac(self.spec, x1)
        return x1, np.asarray(fx), np.asarray(A), np.asarray(B), np.asarray(J)

    def forward_pass_with_limits(self, xk, uk, k):
        xk = np.asarray(xk, float)
        x1, fx, A, B, J = self.forward_pass(xk, uk, k)
        Ld, ql = funcs.limit_terms(self.spec, xk) if self.spec.limits_set else (
            np.zeros(self.spec.nx), np.zeros(self.spec.nx))
        return (x1, fx, np.asarray(ql), np.zeros(self.spec.nu), A, B, J,
                np.diag(np.asarray(Ld)))

    def forward_pass_batch(self, u):
        """fpBatch (System.cpp:181-211): open-loop rollout."""
        from ilqr_planner_tpu.solvers.batch import _open_loop_rollout

        U = np.asarray(u, float).reshape(self.spec.horizon - 1, self.spec.nu)
        X, fX, As, Bs, Js, Ldiag, qL = _open_loop_rollout(self.spec, U)
        self.reset()
        return (np.asarray(fX).reshape(-1), np.asarray(qL).reshape(-1),
                [(np.asarray(As[i - 1]) if i > 0 else np.eye(self.spec.nx),
                  np.asarray(Bs[i - 1]) if i > 0 else np.zeros((self.spec.nx, self.spec.nu)),
                  np.asarray(Js[i]),
                  np.diag(np.asarray(Ldiag[i])))
                 for i in range(self.spec.horizon)])

    # -- residuals / costs --------------------------------------------------
    def diff(self, state, k):
        return np.asarray(funcs.residual(self.spec, np.asarray(state, float), k))

    def diff_batch(self, x):
        nt = self.spec.nt
        rows = np.asarray(x, float).reshape(-1, nt)
        return np.concatenate([
            self.diff(rows[i], kp.timestep) for i, kp in enumerate(self.keypoints)
        ])

    def cost(self, xk, uk, k):
        xk = np.asarray(xk, float)
        fx, _ = funcs.fx_jac(self.spec, xk)
        return np.array([float(funcs.stage_cost(self.spec, xk, fx,
                                                np.asarray(uk, float), k))])

    def cost_F(self, xk):
        xk = np.asarray(xk, float)
        fx, _ = funcs.fx_jac(self.spec, xk)
        return np.array([float(funcs.final_cost(self.spec, xk, fx))])

    def _grads(self, xk, uk, k):
        xk = np.asarray(xk, float)
        fx, J = funcs.fx_jac(self.spec, xk)
        return funcs.cost_gradients(self.spec, xk, fx, J,
                                    np.asarray(uk, float), k)

    def cost_x(self, xk, uk, k):
        return np.asarray(self._grads(xk, uk, k)[0])

    def cost_u(self, xk, uk, k):
        return np.asarray(self.spec.Rt) * np.asarray(uk, float)

    def cost_xx(self, xk, uk, k):
        return np.asarray(self._grads(xk, uk, k)[2])

    def cost_uu(self, xk, uk, k):
        return np.diag(np.asarray(self.spec.Rt))

    def cost_ux(self, xk, uk, k):
        return np.zeros((self.spec.nu, self.spec.nx))

    def cost_xu(self, xk, uk, k):
        return np.zeros((self.spec.nx, self.spec.nu))

    def cost_F_x(self, xk):
        return self.cost_x(xk, np.zeros(self.spec.nu), self.spec.horizon - 1)

    def cost_F_xx(self, xk):
        return self.cost_xx(xk, np.zeros(self.spec.nu), self.spec.horizon - 1)

    # -- target stacking (System.cpp:321-361) -------------------------------
    def get_mu_vector(self, sparse=True):
        nt = self.spec.nt
        if sparse:
            return np.concatenate([kp.state() for kp in self.keypoints])
        mu = np.zeros(self.spec.horizon * nt)
        for kp in self.keypoints:
            mu[kp.timestep * nt:(kp.timestep + 1) * nt] = kp.state()
        return mu

    def get_Q_matrix(self, sparse=True):
        nq = self.spec.nq_var
        if sparse:
            n = len(self.keypoints)
            Q = np.zeros((n * nq, n * nq))
            for i, kp in enumerate(self.keypoints):
                Q[i * nq:(i + 1) * nq, i * nq:(i + 1) * nq] = kp.precision
            return Q
        Q = np.zeros((self.spec.horizon * nq, self.spec.horizon * nq))
        for kp in self.keypoints:
            t = kp.timestep
            Q[t * nq:(t + 1) * nq, t * nq:(t + 1) * nq] = kp.precision
        return Q


def _make_planner(kind, tag_cls):
    """Factory for the four concrete planner wrappers, handling the
    reference's 3 constructor arities (no limits / q limits / q+dq limits)."""

    class Planner(System):
        def __init__(self, r, keypoints, RtDiag, *args):
            time_kind = kind.endswith("_time")
            tail = 2 if time_kind else 3  # (horizon, nb_deriv[, dt])
            nlim = len(args) - tail
            lims = args[:nlim]
            if time_kind:
                horizon, nb_deriv = args[nlim:]
                dt = None
            else:
                horizon, nb_deriv, dt = args[nlim:]
            kw = {}
            if nlim >= 2:
                kw["q_max"], kw["q_min"] = lims[0], lims[1]
            if nlim == 4:
                kw["dq_max"], kw["dq_min"] = lims[2], lims[3]
            nu = r.get_dof() + (1 if time_kind else 0)
            spec = make_spec(kind, r.robot, keypoints,
                             np.asarray(RtDiag, float).reshape(nu),
                             int(horizon), int(nb_deriv), dt=dt,
                             q0=r.get_q(), dq0=r.get_dq(), **kw)
            super().__init__(r, spec, keypoints)

    Planner.__name__ = tag_cls
    Planner.__qualname__ = tag_cls
    Planner.__doc__ = f"Reference {tag_cls} (kind={kind!r}) over a dense Spec."
    return Planner


PosOrnPlannerSys = _make_planner("posorn", "PosOrnPlannerSys")
PosOrnTimePlannerSys = _make_planner("posorn_time", "PosOrnTimePlannerSys")
JointSpacePlannerSys = _make_planner("joint", "JointSpacePlannerSys")
JointSpaceTimePlannerSys = _make_planner("joint_time", "JointSpaceTimePlannerSys")


class SequentialSystem(System):
    """Composite system over subsystems sharing robot/state/control
    (SequentialSystem.cpp:13-76, bindings.cpp:612-692)."""

    def __init__(self, r, systems, RtDiag, horizon=None, nbDeriv=None):
        self.systems = list(systems)
        spec = sequential_spec(tuple(s.spec for s in systems),
                               np.asarray(RtDiag, float))
        kps = [kp for s in systems for kp in s.keypoints]
        super().__init__(r, spec, kps)

    def get_mu_vector(self, sparse=True):
        nt = self.spec.nt
        if sparse:
            out = []
            for kp in self.keypoints:
                row = []
                for s in self.systems:
                    hit = [k for k in s.keypoints if k.timestep == kp.timestep]
                    row.append(hit[0].state() if hit
                               else np.zeros(s.spec.nt))
                out.append(np.concatenate(row))
            return np.concatenate(out)
        mu = np.zeros(self.spec.horizon * nt)
        off = 0
        for s in self.systems:
            sub = s.get_mu_vector(False).reshape(self.spec.horizon, s.spec.nt)
            for j in range(self.spec.horizon):
                mu[j * nt + off: j * nt + off + s.spec.nt] = sub[j]
            off += s.spec.nt
        return mu

    def get_Q_matrix(self, sparse=True):
        nq = self.spec.nq_var
        if sparse:
            n = len(self.keypoints)
            Q = np.zeros((n * nq, n * nq))
            for i, kp in enumerate(self.keypoints):
                off = 0
                for s in self.systems:
                    hit = [k for k in s.keypoints if k.timestep == kp.timestep]
                    if hit:
                        b = hit[0].precision
                        Q[i * nq + off:i * nq + off + s.spec.nq_var,
                          i * nq + off:i * nq + off + s.spec.nq_var] = b
                    off += s.spec.nq_var
            return Q
        Q = np.zeros((self.spec.horizon * nq, self.spec.horizon * nq))
        off = 0
        for s in self.systems:
            sub = s.get_Q_matrix(False)
            for j in range(self.spec.horizon):
                Q[j * nq + off:j * nq + off + s.spec.nq_var,
                  j * nq + off:j * nq + off + s.spec.nq_var] = (
                    sub[j * s.spec.nq_var:(j + 1) * s.spec.nq_var,
                        j * s.spec.nq_var:(j + 1) * s.spec.nq_var])
            off += s.spec.nq_var
        return Q

    def reset(self):
        for s in self.systems:
            s.reset()
        super().reset()
