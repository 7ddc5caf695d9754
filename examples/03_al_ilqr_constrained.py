"""Constrained planning with AL-iLQR: bound state variable 5 below 2.0.

Port of POS_ORN_SYS_AL_ILQR.ipynb: the unconstrained solution drives joint 5
above 2.0; the augmented-Lagrangian solver enforces A [x; u] <= b with a
penalty ramp (rho = 0.25, x1.1 every 5 iterations).
"""

import numpy as np

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.solvers import al_ilqr, ilqr
from ilqr_planner_tpu.solvers.al_ilqr import Constraints
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
HORIZON, DT, DOF = 400, 0.01, 7

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

free = ilqr.solve(spec, np.zeros((HORIZON - 1, DOF)), 10)
print(f"unconstrained: cost {float(free.cost):.3e}, "
      f"max x5 = {np.asarray(free.X)[:, 5].max():.3f} (violates 2.0)")

A = np.zeros((14, 14))
A[5, 5] = 1.0
b = np.zeros(14)
b[5] = 2.0
cons = Constraints.uniform(A, b, HORIZON)
res = al_ilqr.solve(spec, cons, b, np.zeros((HORIZON - 1, DOF)),
                    100, 5, 0.25, 1.1)
print(f"AL-iLQR:       cost {float(res.cost):.3e}, "
      f"max x5 = {np.asarray(res.X)[:, 5].max():.3f} (bound 2.0)")
