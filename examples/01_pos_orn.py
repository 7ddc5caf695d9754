"""Panda position+orientation planning with all three solvers.

Port of the reference tutorial POS_ORN_SYS.ipynb: H=100, dt=0.1, two
via-points, recursive iLQR / batch iLQR / batch iLQR with control
primitives, cross-checked on one workload.
"""

import numpy as np

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.ops import primitives
from ilqr_planner_tpu.solvers import batch, ilqr
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec
from ilqr_planner_tpu.utils import MetricsCallback

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
HORIZON, DT, DOF = 100, 0.1, 7

robot = Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip"))
q0 = [0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
      1.50592777, 0.71771416]
keypoints = [
    PosOrnKeypoint([0.554121212377707, -0.01575049935289518, 0.38295604872511507],
                   [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
                    0.022333898196169735],
                   np.diag([1, 1, 1, .1, .1, .1]), HORIZON // 2 - 1),
    PosOrnKeypoint([0.254121212377707, -0.07575049935289518, 0.13170744424127526],
                   [0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
                    0.00011933313484481926],
                   np.diag([1, 1, 1, .1, .1, .1]), HORIZON - 1),
]
qmax = np.ones(DOF) * np.pi * 10
spec = make_spec("posorn", robot, keypoints, np.ones(DOF) * 1e-5, HORIZON, 1,
                 dt=DT, q0=q0, q_max=qmax, q_min=-qmax)

print("== recursive iLQR ==")
cb = MetricsCallback(verbose=True)
res = ilqr.solve(spec, np.zeros((HORIZON - 1, DOF)), 10, callback=cb)
print(f"final cost {float(res.cost):.3e} in {int(res.iterations)} iterations")

print("== batch iLQR ==")
rb = batch.solve(spec, (49, 99), 10, np.zeros((HORIZON - 1) * DOF),
                 callback=MetricsCallback(verbose=True))

print("== batch iLQR + control primitives (K=2 unitstep) ==")
psi = np.kron(primitives.build_psi_unitstep(HORIZON - 1, 2), np.eye(DOF))
rcp = batch.solve_cp(spec, psi, (49, 99), 10, np.zeros((HORIZON - 1) * DOF),
                     callback=MetricsCallback(verbose=True))

fX = np.asarray(res.fX)
print("\nEE at via-point 1:", fX[HORIZON // 2 - 1, :3])
print("EE at via-point 2:", fX[HORIZON - 1, :3])
