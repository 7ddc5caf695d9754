"""Time-optimal planning: sqrt(dt) control with continuous-time via-points.

Port of POS_ORN_TIME_SYS.ipynb: the last control component is s = sqrt(dt),
so the solver chooses the timing of the trajectory; keypoints carry both a
discrete index and a continuous-time target (2 s and 5 s).
"""

import numpy as np

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.solvers import ilqr
from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint
from ilqr_planner_tpu.systems.spec import make_spec
from ilqr_planner_tpu.utils import MetricsCallback

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
HORIZON, DOF = 100, 7

robot = Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip"))
keypoints = [
    SpacetimeKeypoint([0.554121212377707, -0.01575049935289518, 0.38295604872511507],
                      [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
                       0.022333898196169735],
                      np.diag([1, 1, 1, .1, .1, .1, 0]), HORIZON // 2 - 1, 2.0),
    SpacetimeKeypoint([0.254121212377707, -0.07575049935289518, 0.13170744424127526],
                      [0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
                       0.00011933313484481926],
                      np.diag([1, 1, 1, .1, .1, .1, .1]), HORIZON - 1, 5.0),
]
qmax = np.ones(DOF) * np.pi * 10
spec = make_spec("posorn_time", robot, keypoints, np.ones(DOF + 1) * 1e-5,
                 HORIZON, 1, q0=np.zeros(DOF), q_max=qmax, q_min=-qmax)

U0 = np.tile(np.array([0.0] * DOF + [0.01]), (HORIZON - 1, 1))  # s0 = 0.01
res = ilqr.solve(spec, U0, 20, callback=MetricsCallback(verbose=True))

X = np.asarray(res.X)
print(f"\nfinal cost {float(res.cost):.3e}")
print(f"continuous time at via-point 1: {X[HORIZON // 2 - 1, -1]:.3f} s (target 2)")
print(f"continuous time at the end:     {X[-1, -1]:.3f} s (target 5)")
