"""Hybrid joint-space + task-space planning, time-optimal.

Twin of reference HYBRID_SYS_TIME.ipynb (Panda, H=500): a
JointSpaceTimePlannerSys (joint target at 2.5 s, time untracked in Q) and a
PosOrnTimePlannerSys (task-space target at 5 s) composed in a
SequentialSystem with sqrt(dt) control.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, PANDA_QMAX, PANDA_QMIN,
                     PATH_TO_URDF, Q0, TARGET1_ORN, TARGET1_POS, TIP_FRAME,
                     maybe_plot, report_keypoint_error)

from PyLQR.sim import KDLRobot
from PyLQR.system import (PosOrnTimePlannerSys, JointSpaceTimePlannerSys,
                          SequentialSystem, SpacetimeKeypoint,
                          AngularTimeKeypoint)
from PyLQR.solver import BatchILQRCP, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon = 500
nb_ctrl_var = DOF + 1  # [dq, sqrt(dt)]

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, Q0, DQ0)

# Subsystem 1: timed joint-space via-point (time row untracked, cell 6).
rng = np.random.default_rng(7)
target_1 = rng.uniform(PANDA_QMIN, PANDA_QMAX)
Qt1 = np.identity(DOF + 1)
Qt1[-1, -1] = 0
kp1 = AngularTimeKeypoint(target_1, Qt1, 2.5, horizon // 2 - 1)
sys1 = JointSpaceTimePlannerSys(rbt, [kp1], [1e-5] * nb_ctrl_var,
                                PANDA_QMAX, PANDA_QMIN, horizon, 1)

# Subsystem 2: timed task-space target (cell 8).
Qt2 = np.diag([1, 1, 1, .1, .1, .1, 0])
kp2 = SpacetimeKeypoint(TARGET1_POS, TARGET1_ORN, Qt2, 5.0, horizon - 1)
sys2 = PosOrnTimePlannerSys(rbt, [kp2], [1e-5] * nb_ctrl_var, PANDA_QMAX,
                            PANDA_QMIN, horizon, 1)

cmd_penalties = [1e-5] * nb_ctrl_var
sys = SequentialSystem(rbt, [sys1, sys2], cmd_penalties, horizon, 1)

u0 = np.tile(np.array([0.0] * (nb_ctrl_var - 1) + [0.1]), horizon - 1)
K = 2
PSI = np.kron(primitives.build_psi_unitstep(horizon - 1, K),
              np.identity(nb_ctrl_var))
cb = PythonCallbackMessage()

print("== batch iLQR with control primitives ==")
U1 = BatchILQRCP(sys, PSI).solve(25, u0, False, cb).reshape(-1, nb_ctrl_var)

print("== recursive iLQR ==")
X2, F_X2, U2, K2, k2, cost = ILQRRecursive(sys).solve(
    u0.reshape(-1, nb_ctrl_var), 10, True, True, cb)

# Replay: per-step duration u[-1]^2 (notebook cell 16).
rbt.set_conf(Q0, DQ0, True)
X1 = np.zeros((horizon, DOF + 1))
F_X1 = np.zeros((horizon, 8))
t = 0.0
X1[0] = np.hstack((rbt.get_q(), t))
F_X1[0] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(), t))
for i in range(horizon - 1):
    step_dt = U1[i, -1] ** 2
    rbt.send_vel(step_dt, U1[i, :-1], True)
    t += step_dt
    X1[i + 1] = np.hstack((rbt.get_q(), t))
    F_X1[i + 1] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(), t))

print(f"recursive final cost: {cost:.3e}")
print(f"CP |q - joint target| at k={horizon // 2 - 1}: "
      f"{np.linalg.norm(X1[horizon // 2 - 1, :-1] - target_1):.2e} rad")
report_keypoint_error("CP task-space", F_X1, horizon - 1, TARGET1_POS)
print(f"CP total duration: {X1[-1, -1]:.2f} s "
      "(time rows untracked in Q, so duration is unconstrained)")

maybe_plot("hybrid_sys_time",
           [("continuous time", X1[:, -1])],
           [(horizon // 2 - 1, 2.5), (horizon - 1, 5.0)])
