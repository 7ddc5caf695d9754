"""PyLQR.solver: solver classes over System wrappers (bindings.cpp:695-869).

Same constructor/solve signatures as the reference; solve() delegates to the
jitted functional solvers and returns NumPy results in the reference's
shapes (lists of per-step vectors become [T, dim] arrays, which the
tutorials' `np.asarray(...)` handles identically).
"""

from typing import List

import numpy as np

from ilqr_planner_tpu.compat.system import System
from ilqr_planner_tpu.solvers import al_ilqr as _al
from ilqr_planner_tpu.solvers import batch as _batch
from ilqr_planner_tpu.solvers import ilqr as _ilqr
from ilqr_planner_tpu.solvers.lqt import LQT as _LQT

__all__ = ["ILQRRecursive", "AL_ILQR", "Constraint", "BatchILQR",
           "BatchILQRCP", "LQT"]


class ILQRRecursive:
    """ILQRRecursive(s); solve(U0, nb_iter, line_search, early_stop, cb=None)
    -> (X, f_X, U, Ks, ds, cost) (bindings.cpp:840-859)."""

    def __init__(self, s: System):
        self.s = s

    def solve(self, U0, nb_iter, line_search=True, early_stop=True, cb=None,
              guard=False):
        U0 = np.asarray(U0, float).reshape(self.s.spec.horizon - 1,
                                           self.s.spec.nu)
        res = _ilqr.solve(self.s.spec, U0, nb_iter, line_search, early_stop,
                          callback=cb, guard=guard)
        self.s.reset()
        return (np.asarray(res.X), np.asarray(res.fX), np.asarray(res.U),
                np.asarray(res.Ks), np.asarray(res.ds), float(res.cost))


class Constraint:
    """A S <= b constraint container (AL-ILQR.h:19-22, bindings.cpp:723)."""

    def __init__(self):
        self.A = np.zeros((0, 0))
        self.b = np.zeros(0)


class AL_ILQR:
    """AL_ILQR(s, inequality, initLambda); solve(U0, nb_iter,
    lag_update_step, penalty, scaling_factor, line_search, early_stop, cb)
    -> (X, f_X, U) (bindings.cpp:733-770)."""

    def __init__(self, s: System, inequality: List[Constraint], initLambda):
        self.s = s
        H = s.spec.horizon
        if len(inequality) != H - 1:
            raise ValueError(f"need {H - 1} per-step constraints")
        nc = max((np.asarray(c.b).shape[0] for c in inequality), default=0)
        ns = s.spec.nx + s.spec.nu
        A = np.zeros((H - 1, nc, ns))
        b = np.zeros((H - 1, nc))
        lam = np.zeros((H - 1, nc))
        for k, c in enumerate(inequality):
            ck = np.asarray(c.A, float)
            if ck.size:
                A[k, : ck.shape[0], : ck.shape[1]] = ck
                b[k, : np.asarray(c.b).shape[0]] = np.asarray(c.b, float)
            lk = np.asarray(initLambda[k], float)
            lam[k, : lk.shape[0]] = lk
        self.constraints = _al.Constraints(A=A, b=b)
        self.init_lambda = lam

    def solve(self, U0, nb_iter, lag_update_step, penalty, scaling_factor,
              line_search=True, early_stop=True, cb=None):
        U0 = np.asarray(U0, float).reshape(self.s.spec.horizon - 1,
                                           self.s.spec.nu)
        res = _al.solve(self.s.spec, self.constraints, self.init_lambda, U0,
                        nb_iter, lag_update_step, penalty, scaling_factor,
                        line_search, early_stop, callback=cb)
        self.s.reset()
        return np.asarray(res.X), np.asarray(res.fX), np.asarray(res.U)


class BatchILQR:
    """BatchILQR(s[, Q]); solve(nb_iter, u0, early_stop, cb=None) -> u
    (bindings.cpp:778-796)."""

    def __init__(self, s: System, Q=None):
        self.s = s
        self.Q = Q

    def solve(self, nb_iter, u0, early_stop=True, cb=None):
        res = _batch.solve(self.s.spec, tuple(self.s.get_kp_indexes()),
                           nb_iter, np.asarray(u0, float).reshape(-1),
                           early_stop, callback=cb, Q=self.Q)
        self.s.reset()
        return np.asarray(res.u)


class BatchILQRCP:
    """BatchILQRCP(s, psi) or (s, Q, psi); solve(nb_iter, u0, early_stop, cb)
    -> u (bindings.cpp:800-829)."""

    def __init__(self, s: System, Q_or_psi=None, psi=None):
        self.s = s
        if psi is None:
            self.Q, self.psi = None, Q_or_psi
        else:
            self.Q, self.psi = Q_or_psi, psi

    def solve(self, nb_iter, u0, early_stop=True, cb=None):
        res = _batch.solve_cp(self.s.spec, self.psi,
                              tuple(self.s.get_kp_indexes()), nb_iter,
                              np.asarray(u0, float).reshape(-1), early_stop,
                              callback=cb, Q=self.Q)
        self.s.reset()
        return np.asarray(res.u)


class LQT(_LQT):
    """Reference-name aliases over solvers.lqt.LQT (bindings.cpp:862-869)."""

    def solve_DP(self):
        return self.solve_dp()

    def solve_lin_al(self):
        return self.solve_linalg()

    def get_nb_states(self):
        return self.nb_states
