"""Planning with targets expressed in an object frame.

Twin of reference POS_ORN_SYS_OBJ_FRAME.ipynb (Panda, H=400, dt=0.01): a
TransformedSimulationInterface expresses the end-effector in an object
frame, so the two via-point targets are given in object coordinates.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, OBJ1_FRAME, PATH_TO_URDF, Q0,
                     TIP_FRAME, maybe_plot, report_keypoint_error)

from PyLQR.sim import KDLRobot, TransformedSimulationInterface
from PyLQR.system import PosOrnPlannerSys, PosOrnKeypoint
from PyLQR.solver import BatchILQRCP, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon, dt = 400, 0.01
nb_ctrl_var = DOF

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, Q0, DQ0)
transformed_robot = TransformedSimulationInterface(rbt, OBJ1_FRAME)

# Targets in the OBJECT frame (notebook cell 8/12).
target1_pos = np.array([-0.30, 0.10, -0.15])
target2_pos = np.array([0.0, 0.0, -0.15])
target_orn = np.array([1.0, 0, 0, 0])
Qt = np.diag([1, 1, 1, .1, .1, .1])
keypoints = [
    PosOrnKeypoint(target1_pos, target_orn, Qt, horizon // 2 - 1),
    PosOrnKeypoint(target2_pos, target_orn, Qt, horizon - 1),
]
qMax = np.array([np.pi] * DOF) * 10
dqMax = np.array([10.0] * DOF)
cmd_penalties = [1e-5] * nb_ctrl_var
sys = PosOrnPlannerSys(transformed_robot, keypoints, cmd_penalties, qMax,
                       -qMax, dqMax, -dqMax, horizon, 1, dt)

u0 = np.zeros((horizon - 1) * nb_ctrl_var)
K = 2
PSI = np.kron(primitives.build_psi_unitstep(horizon - 1, K),
              np.identity(nb_ctrl_var))
cb = PythonCallbackMessage()

print("== batch iLQR with control primitives (object frame) ==")
U1 = BatchILQRCP(sys, PSI).solve(25, u0, True, cb).reshape(-1, nb_ctrl_var)

print("== recursive iLQR (object frame) ==")
X2, F_X2, U2, K2, k2, cost = ILQRRecursive(sys).solve(
    u0.reshape(-1, nb_ctrl_var), 10, True, True, cb)

# Replay through the transformed simulator: f(x) stays in object coords.
transformed_robot.set_conf(Q0, DQ0, True)
F_X1 = np.zeros((horizon, 7))
F_X1[0] = np.hstack((transformed_robot.get_ee_pos(),
                     transformed_robot.get_ee_orn()))
for i in range(horizon - 1):
    transformed_robot.send_vel(dt, U1[i], True)
    F_X1[i + 1] = np.hstack((transformed_robot.get_ee_pos(),
                             transformed_robot.get_ee_orn()))

print(f"recursive final cost: {cost:.3e}")
report_keypoint_error("CP (object frame)", F_X1, horizon - 1, target2_pos)
report_keypoint_error("recursive (object frame)", np.asarray(F_X2),
                      horizon - 1, target2_pos)

# Back to the base frame for reporting (notebook cell 22).
F_X1_base = F_X1.copy()
F_X1_base[:, :3] = F_X1[:, :3] @ OBJ1_FRAME[:3, :3].T + OBJ1_FRAME[:3, 3]
target2_world = OBJ1_FRAME[:3, :3] @ target2_pos + OBJ1_FRAME[:3, 3]
print(f"final EE (base frame): {F_X1_base[-1, :3]} vs target {target2_world}")

maybe_plot("pos_orn_sys_obj_frame",
           [("x", F_X1[:, 0]), ("y", F_X1[:, 1]), ("z", F_X1[:, 2])],
           [(horizon - 1, target2_pos[i]) for i in range(3)])
