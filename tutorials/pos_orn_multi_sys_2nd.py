"""Two object frames, acceleration control (2nd order SequentialSystem).

Twin of reference POS_ORN_MULTI_SYS_2ND.ipynb (Panda, H=600, dt=0.01,
double-integrator): each subsystem tracks a position + zero linear velocity
in its own object frame; batch CP uses a sawtooth basis.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, OBJ1_FRAME, OBJ2_FRAME,
                     PATH_TO_URDF, Q0, TIP_FRAME, maybe_plot)

from PyLQR.sim import KDLRobot, TransformedSimulationInterface
from PyLQR.system import PosOrnPlannerSys, SequentialSystem, PosOrnKeypoint
from PyLQR.solver import BatchILQRCP, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon, dt, nb_deriv = 600, 0.01, 2
nb_ctrl_var = DOF

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, Q0, DQ0)
transformed_robot1 = TransformedSimulationInterface(rbt, OBJ1_FRAME)
transformed_robot2 = TransformedSimulationInterface(rbt, OBJ2_FRAME)

qMax = np.array([np.pi] * DOF) * 10
dqMax = np.array([10.0] * DOF)
cmd_penalties = (np.ones(nb_ctrl_var) * 1e-5).tolist()
zero3, zero4 = np.zeros(3), np.zeros(4)
orn = np.array([1.0, 0, 0, 0])
# Track position + zero linear velocity; orientation rows off (cell 12).
Qt = np.diag([1, 1, 1, 0, 0, 0, 1, 1, 1, 0, 0, 0])

target1 = np.array([0.0, 0.0, -0.15])
kp1 = PosOrnKeypoint(target1, zero3, orn, zero4, Qt, horizon // 2)
sys1 = PosOrnPlannerSys(transformed_robot1, [kp1], cmd_penalties, qMax,
                        -qMax, dqMax, -dqMax, horizon, nb_deriv, dt)

target2 = np.array([0.1, 0.1, -0.1])
kp2 = PosOrnKeypoint(target2, zero3, orn, zero4, Qt, horizon - 1)
sys2 = PosOrnPlannerSys(transformed_robot2, [kp2], cmd_penalties, qMax,
                        -qMax, dqMax, -dqMax, horizon, nb_deriv, dt)

sys = SequentialSystem(rbt, [sys1, sys2], cmd_penalties, horizon, nb_deriv)

u0 = np.zeros((horizon - 1) * nb_ctrl_var)
K = 2
PSI = np.kron(primitives.build_psi_sawtooth(horizon - 1, K),
              np.identity(nb_ctrl_var))
cb = PythonCallbackMessage()

print("== batch iLQR with sawtooth control primitives ==")
U1 = BatchILQRCP(sys, PSI).solve(25, u0, True, cb).reshape(-1, nb_ctrl_var)

print("== recursive iLQR (acceleration control) ==")
X2, F_X2, U2, K2, k2, cost = ILQRRecursive(sys).solve(
    u0.reshape(-1, nb_ctrl_var), 10, True, True, cb)

# Replay with acceleration commands.
rbt.set_conf(Q0, DQ0, True)
F_X1_world = np.zeros((horizon, 14))
F_X1_world[0] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(),
                           rbt.get_ee_vel(), rbt.get_ee_ang_vel_quat()))
for i in range(horizon - 1):
    rbt.send_acc(dt, U1[i], True)
    F_X1_world[i + 1] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(),
                                   rbt.get_ee_vel(),
                                   rbt.get_ee_ang_vel_quat()))

t1_world = OBJ1_FRAME[:3, :3] @ target1 + OBJ1_FRAME[:3, 3]
t2_world = OBJ2_FRAME[:3, :3] @ target2 + OBJ2_FRAME[:3, 3]
e1 = np.linalg.norm(F_X1_world[horizon // 2, :3] - t1_world)
e2 = np.linalg.norm(F_X1_world[horizon - 1, :3] - t2_world)
print(f"recursive final cost: {cost:.3e}")
print(f"CP |ee - obj1 target| at k={horizon // 2}: {e1:.2e} m")
print(f"CP |ee - obj2 target| at k={horizon - 1}: {e2:.2e} m")

maybe_plot("pos_orn_multi_sys_2nd",
           [("x", F_X1_world[:, 0]), ("y", F_X1_world[:, 1]),
            ("z", F_X1_world[:, 2])],
           [(horizon - 1, t2_world[i]) for i in range(3)])
