"""Constrained planning with augmented-Lagrangian iLQR.

Twin of reference POS_ORN_SYS_AL_ILQR.ipynb (Panda, H=400, dt=0.01): first
an unconstrained recursive solve, then AL-iLQR with the per-step inequality
x[5] <= 2.0 (joint 6 position bound), lag_update_step=5, penalty=0.25,
scaling=1.1, 100 iterations.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, PATH_TO_URDF, Q0, TARGET1_ORN,
                     TARGET1_POS, TARGET2_ORN, TARGET2_POS, TIP_FRAME,
                     maybe_plot, report_keypoint_error)

from PyLQR.sim import KDLRobot
from PyLQR.system import PosOrnPlannerSys, PosOrnKeypoint
from PyLQR.solver import AL_ILQR, Constraint, ILQRRecursive
from PyLQR.utils import PythonCallbackMessage

horizon, dt = 400, 0.01
nb_state_var = nb_ctrl_var = DOF

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, Q0, DQ0)

Qt = np.diag([1, 1, 1, .1, .1, .1])
keypoints = [
    PosOrnKeypoint(TARGET1_POS, TARGET1_ORN, Qt, horizon // 2 - 1),
    PosOrnKeypoint(TARGET2_POS, TARGET2_ORN, Qt, horizon - 1),
]
qMax = np.array([np.pi] * DOF) * 10
cmd_penalties = [1e-5] * nb_ctrl_var
sys = PosOrnPlannerSys(rbt, keypoints, cmd_penalties, qMax, -qMax, horizon,
                       1, dt)

u0 = np.zeros(((horizon - 1), nb_ctrl_var))
cb = PythonCallbackMessage()

print("== unconstrained recursive iLQR ==")
X1, F_X1, U1, K1, k1, cost = ILQRRecursive(sys).solve(u0, 10, True, True, cb)
X1 = np.asarray(X1)
print(f"unconstrained: max x[5] over trajectory = {X1[:, 5].max():.3f} "
      f"(cost {cost:.3e})")

# Per-step inequality A [x;u] <= b with A[5,5]=1, b[5]=2.0 (notebook cell 12).
ns = nb_state_var + nb_ctrl_var
A = np.zeros((ns, ns))
b = np.zeros(ns)
A[5, 5] = 1.0
b[5] = 2.0
constraints, init_multipliers = [], []
for _ in range(horizon - 1):
    c = Constraint()
    c.A = A
    c.b = b
    constraints.append(c)
    init_multipliers.append(b)

print("== AL-iLQR with x[5] <= 2.0 ==")
X2, F_X2, U2 = AL_ILQR(sys, constraints, init_multipliers).solve(
    u0, 100, 5, .25, 1.1, True, True, cb)
X2 = np.asarray(X2)
print(f"constrained: max x[5] over trajectory = {X2[:, 5].max():.3f}")
assert X2[:, 5].max() <= 2.0 + 1e-2, "constraint violated"
report_keypoint_error("AL-iLQR", np.asarray(F_X2), horizon - 1, TARGET2_POS)

maybe_plot("pos_orn_sys_al_ilqr",
           [("x5 unconstrained", X1[:, 5]), ("x5 constrained", X2[:, 5])],
           [(0, 2.0), (horizon - 1, 2.0)])
