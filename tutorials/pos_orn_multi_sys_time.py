"""Two object frames, time-optimal (SequentialSystem of time planners).

Twin of reference POS_ORN_MULTI_SYS_TIME.ipynb (Panda, H=600): two
PosOrnTimePlannerSys subsystems over transformed frames, each tracking a
position and a continuous arrival time (2.5 s and 5 s), with dt = u[-1]^2
optimized jointly.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, DQ0, OBJ1_FRAME, OBJ2_FRAME,
                     PATH_TO_URDF, Q0, TIP_FRAME, maybe_plot)

from PyLQR.sim import KDLRobot, TransformedSimulationInterface
from PyLQR.system import (PosOrnTimePlannerSys, SequentialSystem,
                          SpacetimeKeypoint)
from PyLQR.solver import BatchILQRCP, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon = 600
nb_ctrl_var = DOF + 1  # [dq, sqrt(dt)]

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, Q0, DQ0)
transformed_robot1 = TransformedSimulationInterface(rbt, OBJ1_FRAME)
transformed_robot2 = TransformedSimulationInterface(rbt, OBJ2_FRAME)

qMax = np.array([np.pi] * DOF) * 10
dqMax = np.array([10.0] * DOF)
cmd_penalties = (np.ones(nb_ctrl_var) * 1e-5).tolist()
orn = np.array([1.0, 0, 0, 0])
Qt = np.diag([1, 1, 1, 0, 0, 0, .1])  # position + continuous time

target1 = np.array([0.0, 0.0, -0.15])
kp1 = SpacetimeKeypoint(target1, orn, Qt, 2.5, horizon // 2)
sys1 = PosOrnTimePlannerSys(transformed_robot1, [kp1], cmd_penalties, qMax,
                            -qMax, dqMax, -dqMax, horizon, 1)

target2 = np.array([0.1, 0.1, -0.1])
kp2 = SpacetimeKeypoint(target2, orn, Qt, 5.0, horizon - 1)
sys2 = PosOrnTimePlannerSys(transformed_robot2, [kp2], cmd_penalties, qMax,
                            -qMax, dqMax, -dqMax, horizon, 1)

sys = SequentialSystem(rbt, [sys1, sys2], cmd_penalties, horizon, 1)

u0 = np.tile(np.full(nb_ctrl_var, 0.1), horizon - 1)  # notebook cell 18
K = 2
PSI = np.kron(primitives.build_psi_unitstep(horizon - 1, K),
              np.identity(nb_ctrl_var))
cb = PythonCallbackMessage()

print("== batch iLQR with control primitives ==")
U1 = BatchILQRCP(sys, PSI).solve(25, u0, True, cb).reshape(-1, nb_ctrl_var)

print("== recursive iLQR ==")
X2, F_X2, U2, K2, k2, cost = ILQRRecursive(sys).solve(
    u0.reshape(-1, nb_ctrl_var), 10, True, True, cb)

# Replay: per-step duration = u[-1]^2.
rbt.set_conf(Q0, DQ0, True)
F_X1_world = np.zeros((horizon, 8))
F_X1_world[0] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(), 0.0))
t = 0.0
for i in range(horizon - 1):
    step_dt = U1[i, -1] ** 2
    rbt.send_vel(step_dt, U1[i, :-1], True)
    t += step_dt
    F_X1_world[i + 1] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(), t))

t1_world = OBJ1_FRAME[:3, :3] @ target1 + OBJ1_FRAME[:3, 3]
t2_world = OBJ2_FRAME[:3, :3] @ target2 + OBJ2_FRAME[:3, 3]
e1 = np.linalg.norm(F_X1_world[horizon // 2, :3] - t1_world)
e2 = np.linalg.norm(F_X1_world[horizon - 1, :3] - t2_world)
print(f"recursive final cost: {cost:.3e}")
print(f"CP |ee - obj1 target| at k={horizon // 2}: {e1:.2e} m "
      f"(t={F_X1_world[horizon // 2, -1]:.2f} s, target 2.5 s)")
print(f"CP |ee - obj2 target| at k={horizon - 1}: {e2:.2e} m "
      f"(t={F_X1_world[-1, -1]:.2f} s, target 5.0 s)")

maybe_plot("pos_orn_multi_sys_time",
           [("x", F_X1_world[:, 0]), ("y", F_X1_world[:, 1]),
            ("z", F_X1_world[:, 2]), ("t", F_X1_world[:, -1])],
           [(horizon // 2, 2.5), (horizon - 1, 5.0)])
