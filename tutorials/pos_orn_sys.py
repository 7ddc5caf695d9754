"""Task-space position+orientation planning — all three solvers.

Twin of reference POS_ORN_SYS.ipynb (Panda, H=100, dt=0.1, two pos+quat
via-points): recursive iLQR, batch iLQR, and batch iLQR with control
primitives cross-checked on one workload through the PyLQR drop-in API.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, PATH_TO_URDF, Q0, TARGET1_ORN,
                     TARGET1_POS, TARGET2_ORN, TARGET2_POS, TIP_FRAME,
                     maybe_plot, report_keypoint_error)

from PyLQR.sim import KDLRobot
from PyLQR.system import PosOrnPlannerSys, PosOrnKeypoint
from PyLQR.solver import BatchILQRCP, BatchILQR, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon, dt = 100, 0.1
nb_ctrl_var = DOF

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

u0 = np.zeros((horizon - 1) * nb_ctrl_var)
K = 2
PSI = np.kron(primitives.build_psi_unitstep(horizon - 1, K),
              np.identity(nb_ctrl_var))
cb = PythonCallbackMessage()

print("== batch iLQR with control primitives ==")
U1 = BatchILQRCP(sys, PSI).solve(10, u0, True, cb).reshape(-1, nb_ctrl_var)

print("== recursive iLQR ==")
X2, F_X2, U2, K2, k2, cost = ILQRRecursive(sys).solve(
    u0.reshape(-1, nb_ctrl_var), 10, True, True, cb)

print("== batch iLQR ==")
U3 = BatchILQR(sys).solve(10, u0, True, cb).reshape(-1, nb_ctrl_var)

# Replay the CP solution through the simulator, like the notebook (cell 14).
rbt.set_conf(Q0, DQ0, True)
F_X1 = np.zeros((horizon, 7))
F_X1[0] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn()))
for i in range(horizon - 1):
    rbt.send_vel(dt, U1[i], True)
    F_X1[i + 1] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn()))

print(f"recursive iLQR final cost: {cost:.3e}")
for name, fx in (("CP", F_X1), ("recursive", np.asarray(F_X2))):
    report_keypoint_error(name, fx, horizon // 2 - 1, TARGET1_POS)
    report_keypoint_error(name, fx, horizon - 1, TARGET2_POS)

maybe_plot("pos_orn_sys",
           [("x", F_X1[:, 0]), ("y", F_X1[:, 1]), ("z", F_X1[:, 2])],
           [(horizon - 1, TARGET2_POS[i]) for i in range(3)])
