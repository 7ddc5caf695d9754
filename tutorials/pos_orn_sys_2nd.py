"""Task-space pos+orn planning with acceleration control (2nd order).

Twin of reference POS_ORN_SYS_2ND.ipynb (Panda, H=400, dt=0.01,
double-integrator dynamics, via-points with velocity targets): batch iLQR
with a sawtooth control-primitive basis vs recursive iLQR.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, PATH_TO_URDF, Q0, TARGET1_ORN,
                     TARGET1_POS, TARGET2_ORN, TARGET2_POS, TIP_FRAME,
                     maybe_plot, report_keypoint_error)

from PyLQR.sim import KDLRobot
from PyLQR.system import PosOrnPlannerSys, PosOrnKeypoint
from PyLQR.solver import BatchILQRCP, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon, dt, nb_deriv = 400, 0.01, 2
nb_ctrl_var = DOF

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, Q0, DQ0)

zero3, zero4 = np.zeros(3), np.zeros(4)
# Precision: track position + orientation + linear velocity (zero at the
# via-point), ignore angular-velocity-quaternion rows (notebook cell 6).
Qt = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, 0, 0, 0])
keypoints = [
    PosOrnKeypoint(TARGET1_POS, zero3, TARGET1_ORN, zero4, Qt,
                   horizon // 2 - 1),
    PosOrnKeypoint(TARGET2_POS, zero3, TARGET2_ORN, zero4, Qt, horizon - 1),
]
qMax = np.array([np.pi] * DOF) * 10
dqMax = np.array([10.0] * DOF)
cmd_penalties = [1e-5] * nb_ctrl_var
sys = PosOrnPlannerSys(rbt, keypoints, cmd_penalties, qMax, -qMax, dqMax,
                       -dqMax, horizon, nb_deriv, dt)

u0 = np.zeros((horizon - 1) * nb_ctrl_var)
K = 2
PSI = np.kron(primitives.build_psi_sawtooth(horizon - 1, K),
              np.identity(nb_ctrl_var))
cb = PythonCallbackMessage()

print("== batch iLQR with sawtooth control primitives ==")
U1 = BatchILQRCP(sys, PSI).solve(10, u0, True, cb).reshape(-1, nb_ctrl_var)

print("== recursive iLQR (acceleration control) ==")
X2, F_X2, U2, K2, k2, cost = ILQRRecursive(sys).solve(
    u0.reshape(-1, nb_ctrl_var), 15, True, True, cb)

# Replay the CP accelerations through the simulator (notebook cell 10).
rbt.set_conf(Q0, DQ0, True)
F_X1 = np.zeros((horizon, 14))
F_X1[0] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(), rbt.get_ee_vel(),
                     rbt.get_ee_ang_vel_quat()))
for i in range(horizon - 1):
    rbt.send_acc(dt, U1[i], True)
    F_X1[i + 1] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(),
                             rbt.get_ee_vel(), rbt.get_ee_ang_vel_quat()))

print(f"recursive iLQR final cost: {cost:.3e}")
report_keypoint_error("CP", F_X1, horizon - 1, TARGET2_POS)
report_keypoint_error("recursive", np.asarray(F_X2), horizon - 1, TARGET2_POS)
vel_end = np.linalg.norm(F_X1[horizon // 2 - 1, 7:10])
print(f"CP linear-velocity magnitude at via-point: {vel_end:.2e} m/s")

maybe_plot("pos_orn_sys_2nd",
           [("x", F_X1[:, 0]), ("y", F_X1[:, 1]), ("z", F_X1[:, 2])],
           [(horizon - 1, TARGET2_POS[i]) for i in range(3)])
