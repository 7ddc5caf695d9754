"""Time-optimal task-space planning with acceleration control (2nd order).

Twin of reference POS_ORN_TIME_SYS_2ND.ipynb (Panda from zero configuration,
H=50, state [q, dq, t], control [ddq, sqrt(dt)], mixed sawtooth/unitstep
primitive basis). The reference notebook records a NaN-cost divergence on
this workload (its stored cell 11 output) — the sqrt(dt) parameterization is
fragile under acceleration control; the line search here backtracks through
the NaN trials the same way (floor alpha=1e-3), so the run completes either
way. Expect possible non-monotone costs.
"""

import numpy as np

from _common import (BASE_FRAME, DOF, PATH_TO_URDF, TARGET1_ORN, TARGET1_POS,
                     TARGET2_ORN, TARGET2_POS, TIP_FRAME, maybe_plot,
                     report_keypoint_error)

from PyLQR.sim import KDLRobot
from PyLQR.system import PosOrnTimePlannerSys, SpacetimeKeypoint
from PyLQR.solver import BatchILQRCP, ILQRRecursive
from PyLQR.utils import primitives, PythonCallbackMessage

horizon, nb_deriv = 50, 2
nb_ctrl_var = DOF + 1  # [ddq, sqrt(dt)]
q0 = [0.0] * DOF
dq0 = [0.0] * DOF

rbt = KDLRobot(PATH_TO_URDF, BASE_FRAME, TIP_FRAME, q0, dq0)

zero3, zero4 = np.zeros(3), np.zeros(4)
# Keypoint 1: pos + orn + linear velocity + arrival time (2.5 s); keypoint 2
# additionally tracks the angular-velocity rows at 0.1 (notebook cell 6).
Qt1 = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, 0, 0, 0, .1])
Qt2 = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, .1, .1, .1, .1])
t1_ct, t2_ct = 2.5, 5.0
keypoints = [
    SpacetimeKeypoint(TARGET1_POS, zero3, TARGET1_ORN, zero4, Qt1, t1_ct,
                      horizon // 2 - 1),
    SpacetimeKeypoint(TARGET2_POS, zero3, TARGET2_ORN, zero4, Qt2, t2_ct,
                      horizon - 1),
]
qMax = np.array([np.pi] * DOF) * 10
dqMax = np.array([10.0] * DOF)
cmd_penalties = [1e-5] * nb_ctrl_var
sys = PosOrnTimePlannerSys(rbt, keypoints, cmd_penalties, qMax, -qMax, dqMax,
                           -dqMax, horizon, nb_deriv)

u0_t = np.array([0.0] * (nb_ctrl_var - 1) + [0.01])
u0 = np.tile(u0_t, horizon - 1)
# Mixed basis: sawtooth ramps for the accelerations, piecewise-constant
# steps for sqrt(dt) (notebook cell 8).
K = 2
psi = primitives.build_psi_sawtooth(horizon - 1, K)
psi_dt = primitives.build_psi_unitstep(horizon - 1, K)
PSI = (np.kron(psi, np.diag([1] * (nb_ctrl_var - 1) + [0]))
       + np.kron(psi_dt, np.diag([0] * (nb_ctrl_var - 1) + [1])))
cb = PythonCallbackMessage()

print("== batch iLQR with mixed control primitives ==")
U1 = BatchILQRCP(sys, PSI).solve(10, u0, True, cb).reshape(-1, nb_ctrl_var)

print("== recursive iLQR (known-fragile workload) ==")
X2, F_X2, U2, K2, k2, cost = ILQRRecursive(sys).solve(
    u0.reshape(-1, nb_ctrl_var), 10, True, True, cb)

# Replay the CP solution: dt = u[-1]^2 per step, acceleration commands.
rbt.set_conf(q0, dq0, True)
F_X1 = np.zeros((horizon, 15))
F_X1[0] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(), rbt.get_ee_vel(),
                     rbt.get_ee_ang_vel_quat(), 0.0))
t = 0.0
for i in range(horizon - 1):
    step_dt = U1[i, -1] ** 2
    rbt.send_acc(step_dt, U1[i, :-1], True)
    t += step_dt
    F_X1[i + 1] = np.hstack((rbt.get_ee_pos(), rbt.get_ee_orn(),
                             rbt.get_ee_vel(), rbt.get_ee_ang_vel_quat(), t))

print(f"recursive final cost: {cost:.3e} "
      f"({'diverged (NaN), matching the reference notebook' if np.isnan(cost) else 'finite'})")
report_keypoint_error("CP", F_X1, horizon - 1, TARGET2_POS)
print(f"CP total trajectory duration: {F_X1[-1, -1]:.3f} s")

maybe_plot("pos_orn_time_sys_2nd",
           [("x", F_X1[:, 0]), ("y", F_X1[:, 1]), ("z", F_X1[:, 2])],
           [(horizon - 1, TARGET2_POS[i]) for i in range(3)])
