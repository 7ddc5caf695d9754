"""Time-optimal joint-space planning with timed angular via-points.

Twin of reference JOINT_SPACE_SYS_TIME.ipynb (Panda, H=100, state [q, t],
control [dq, sqrt(dt)], two random joint targets with continuous arrival
times 2.5 s and 5 s tracked with weight 0.1).
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, PANDA_QMAX, PANDA_QMIN,
                     PATH_TO_URDF, Q0, TIP_FRAME, maybe_plot)

from PyLQR.sim import KDLRobot
from PyLQR.system import JointSpaceTimePlannerSys, AngularTimeKeypoint
from PyLQR.solver import BatchILQRCP, BatchILQR, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon = 100
nb_ctrl_var = DOF + 1  # [dq, sqrt(dt)]

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, Q0, DQ0)

rng = np.random.default_rng(7)
target_1 = rng.uniform(PANDA_QMIN, PANDA_QMAX)
target_2 = rng.uniform(PANDA_QMIN, PANDA_QMAX)
Qt = np.identity(DOF + 1)
Qt[-1, -1] = .1  # weight on the continuous-time residual
keypoints = [
    AngularTimeKeypoint(target_1, Qt, 2.5, horizon // 2 - 1),
    AngularTimeKeypoint(target_2, Qt, 5.0, horizon - 1),
]
cmd_penalties = [1e-5] * nb_ctrl_var
sys = JointSpaceTimePlannerSys(rbt, keypoints, cmd_penalties, PANDA_QMAX,
                               PANDA_QMIN, horizon, 1)

u0 = np.tile(np.array([0.0] * (nb_ctrl_var - 1) + [0.1]), horizon - 1)
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

# Replay: integrate dt = u[-1]^2 (notebook cell 14).
rbt.set_conf(Q0, DQ0, True)
X1 = np.zeros((horizon, DOF + 1))
t = 0.0
X1[0] = np.hstack((rbt.get_q(), t))
for i in range(horizon - 1):
    step_dt = U1[i, -1] ** 2
    rbt.send_vel(step_dt, U1[i, :-1], True)
    t += step_dt
    X1[i + 1] = np.hstack((rbt.get_q(), t))

X2 = np.asarray(X2)
print(f"recursive final cost: {cost:.3e}")
print(f"CP |q - target2| at end: "
      f"{np.linalg.norm(X1[-1, :-1] - target_2):.2e} rad; "
      f"arrival t={X1[-1, -1]:.2f} s (target 5.0 s)")
print(f"recursive arrival t={X2[-1, -1]:.2f} s (target 5.0 s)")

maybe_plot("joint_space_sys_time",
           [("continuous time", X1[:, -1])],
           [(horizon // 2 - 1, 2.5), (horizon - 1, 5.0)])
