"""Hybrid joint-space + task-space planning (SequentialSystem).

Twin of reference HYBRID_SYS.ipynb (Panda, H=500, dt=0.01): one subsystem
tracks a joint configuration at mid-horizon (JointSpacePlannerSys), the
other a task-space pos+quat target at the end (PosOrnPlannerSys); the
SequentialSystem plans one control sequence satisfying both.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, PANDA_QMAX, PANDA_QMIN,
                     PATH_TO_URDF, Q0, TARGET2_ORN, TARGET2_POS, TIP_FRAME,
                     maybe_plot, report_keypoint_error)

from PyLQR.sim import KDLRobot
from PyLQR.system import (PosOrnPlannerSys, JointSpacePlannerSys,
                          SequentialSystem, PosOrnKeypoint, AngularKeypoint)
from PyLQR.solver import BatchILQRCP, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon, dt = 500, 0.01
nb_ctrl_var = DOF

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, Q0, DQ0)

# Subsystem 1: joint-space via-point at mid-horizon.
rng = np.random.default_rng(7)
target_1 = rng.uniform(PANDA_QMIN, PANDA_QMAX)
kp1 = AngularKeypoint(target_1, np.identity(DOF), horizon // 2 - 1)
sys1 = JointSpacePlannerSys(rbt, [kp1], [1e-3] * nb_ctrl_var, PANDA_QMAX,
                            PANDA_QMIN, horizon, 1, dt)

# Subsystem 2: task-space pos+quat target at the end.
Qt2 = np.diag([1, 1, 1, .1, .1, .1])
kp2 = PosOrnKeypoint(TARGET2_POS, TARGET2_ORN, Qt2, horizon - 1)
sys2 = PosOrnPlannerSys(rbt, [kp2], [1e-3] * nb_ctrl_var, PANDA_QMAX,
                        PANDA_QMIN, horizon, 1, dt)

cmd_penalties = [1e-6] * nb_ctrl_var
sys = SequentialSystem(rbt, [sys1, sys2], cmd_penalties, horizon, 1)

u0 = np.zeros((horizon - 1) * nb_ctrl_var)
K = 2
PSI = np.kron(primitives.build_psi_unitstep(horizon - 1, K),
              np.identity(nb_ctrl_var))
cb = PythonCallbackMessage()

print("== batch iLQR with control primitives ==")
U1 = BatchILQRCP(sys, PSI).solve(25, u0, True, cb).reshape(-1, nb_ctrl_var)

print("== recursive iLQR ==")
X2, F_X2, U2, K2, k2, cost = ILQRRecursive(sys).solve(
    u0.reshape(-1, nb_ctrl_var), 10, True, True, cb)

# Replay the CP solution (notebook cell 16).
rbt.set_conf(Q0, DQ0, True)
X1 = np.zeros((horizon, DOF))
F_X1 = np.zeros((horizon, 7))
X1[0] = rbt.get_q()
F_X1[0] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn()))
for i in range(horizon - 1):
    rbt.send_vel(dt, U1[i], True)
    X1[i + 1] = rbt.get_q()
    F_X1[i + 1] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn()))

print(f"recursive final cost: {cost:.3e}")
print(f"CP |q - joint target| at k={horizon // 2 - 1}: "
      f"{np.linalg.norm(X1[horizon // 2 - 1] - target_1):.2e} rad")
report_keypoint_error("CP task-space", F_X1, horizon - 1, TARGET2_POS)

maybe_plot("hybrid_sys",
           [("x", F_X1[:, 0]), ("y", F_X1[:, 1]), ("z", F_X1[:, 2])],
           [(horizon - 1, TARGET2_POS[i]) for i in range(3)])
