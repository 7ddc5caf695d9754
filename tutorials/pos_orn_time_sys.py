"""Time-optimal task-space planning (sqrt(dt) control).

Twin of reference POS_ORN_TIME_SYS.ipynb (Panda from zero configuration,
H=100, per-step duration dt = u[-1]^2 optimized jointly with the joint
velocities): batch CP, recursive, and plain batch solvers.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, PATH_TO_URDF, TARGET1_ORN, TARGET1_POS,
                     TARGET2_ORN, TARGET2_POS, TIP_FRAME, maybe_plot,
                     report_keypoint_error)

from PyLQR.sim import KDLRobot
from PyLQR.system import PosOrnTimePlannerSys, SpacetimeKeypoint
from PyLQR.solver import BatchILQRCP, BatchILQR, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon = 100
nb_ctrl_var = DOF + 1  # [dq, sqrt(dt)]
q0 = [0.0] * DOF
dq0 = [0.0] * DOF

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, q0, dq0)

# Keypoint 1 leaves the continuous time untracked (weight 0); keypoint 2
# tracks arrival at 5 s with weight 0.1 (notebook cell 6).
Qt1 = np.diag([1, 1, 1, .1, .1, .1, 0])
Qt2 = np.diag([1, 1, 1, .1, .1, .1, .1])
t1_ct, t2_ct = 2.0, 5.0
keypoints = [
    SpacetimeKeypoint(TARGET1_POS, TARGET1_ORN, Qt1, t1_ct, horizon // 2 - 1),
    SpacetimeKeypoint(TARGET2_POS, TARGET2_ORN, Qt2, t2_ct, horizon - 1),
]
qMax = np.array([np.pi] * DOF) * 10
dqMax = np.array([10.0] * DOF)
cmd_penalties = [1e-5] * nb_ctrl_var
sys = PosOrnTimePlannerSys(rbt, keypoints, cmd_penalties, qMax, -qMax, dqMax,
                           -dqMax, horizon, 1)

u0_t = np.array([0.0] * (nb_ctrl_var - 1) + [0.01])  # initial sqrt(dt)
u0 = np.tile(u0_t, horizon - 1)
K = 2
PSI = np.kron(primitives.build_psi_unitstep(horizon - 1, K),
              np.identity(nb_ctrl_var))
cb = PythonCallbackMessage()

print("== batch iLQR with control primitives ==")
U1 = BatchILQRCP(sys, PSI).solve(20, u0, True, cb).reshape(-1, nb_ctrl_var)

print("== recursive iLQR ==")
X2, F_X2, U2, K2, k2, cost = ILQRRecursive(sys).solve(
    u0.reshape(-1, nb_ctrl_var), 20, True, True, cb)

print("== batch iLQR ==")
U3 = BatchILQR(sys).solve(40, u0, True, cb).reshape(-1, nb_ctrl_var)

# Replay: integrate dt = u[-1]^2 per step (notebook cell 10).
rbt.set_conf(q0, dq0, True)
F_X1 = np.zeros((horizon, 8))
F_X1[0] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(), 0.0))
t = 0.0
for i in range(horizon - 1):
    step_dt = U1[i, -1] ** 2
    rbt.send_vel(step_dt, U1[i, :-1], True)
    t += step_dt
    F_X1[i + 1] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(), t))

print(f"recursive iLQR final cost: {cost:.3e}")
report_keypoint_error("CP", F_X1, horizon - 1, TARGET2_POS)
report_keypoint_error("recursive", np.asarray(F_X2), horizon - 1, TARGET2_POS)
print(f"CP total trajectory duration: {F_X1[-1, -1]:.3f} s")

maybe_plot("pos_orn_time_sys",
           [("x", F_X1[:, 0]), ("y", F_X1[:, 1]), ("z", F_X1[:, 2]),
            ("t", F_X1[:, -1])],
           [(horizon - 1, TARGET2_POS[i]) for i in range(3)])
