"""Joint-space planning with angular via-points — all three solvers.

Twin of reference JOINT_SPACE_SYS.ipynb (Panda, H=100, dt=0.1, two random
joint-configuration targets inside the physical limits).
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, PANDA_QMAX, PANDA_QMIN,
                     PATH_TO_URDF, Q0, TIP_FRAME, maybe_plot)

from PyLQR.sim import KDLRobot
from PyLQR.system import JointSpacePlannerSys, AngularKeypoint
from PyLQR.solver import BatchILQRCP, BatchILQR, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon, dt = 100, 0.1
nb_ctrl_var = DOF

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, Q0, DQ0)

rng = np.random.default_rng(7)  # deterministic stand-in for the notebook's
target_1 = rng.uniform(PANDA_QMIN, PANDA_QMAX)  # np.random.uniform targets
target_2 = rng.uniform(PANDA_QMIN, PANDA_QMAX)
keypoints = [
    AngularKeypoint(target_1, np.identity(DOF), horizon // 2 - 1),
    AngularKeypoint(target_2, np.identity(DOF), horizon - 1),
]
cmd_penalties = [1e-5] * nb_ctrl_var
sys = JointSpacePlannerSys(rbt, keypoints, cmd_penalties, PANDA_QMAX,
                           PANDA_QMIN, horizon, 1, dt)

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

# Replay the CP solution (notebook cell 14).
rbt.set_conf(Q0, DQ0, True)
X1 = np.zeros((horizon, DOF))
X1[0] = rbt.get_q()
for i in range(horizon - 1):
    rbt.send_vel(dt, U1[i], True)
    X1[i + 1] = rbt.get_q()

X2 = np.asarray(X2)
print(f"recursive final cost: {cost:.3e}")
print(f"CP |q - target1| at k={horizon // 2 - 1}: "
      f"{np.linalg.norm(X1[horizon // 2 - 1] - target_1):.2e} rad")
print(f"CP |q - target2| at k={horizon - 1}: "
      f"{np.linalg.norm(X1[-1] - target_2):.2e} rad")
print(f"recursive |q - target2| at end: "
      f"{np.linalg.norm(X2[-1] - target_2):.2e} rad")

maybe_plot("joint_space_sys",
           [(f"joint {i}", X1[:, i]) for i in range(DOF)],
           [(horizon - 1, target_2[i]) for i in range(DOF)])
