"""Joint-space planning and a hybrid joint+task sequential system.

Ports of JOINT_SPACE_SYS.ipynb and HYBRID_SYS.ipynb: a joint-space system
tracks configurations directly (f(x) = x); the hybrid system sums a
joint-space sub-task (mid-horizon posture) with a task-space pos+quat
sub-task (final EE pose) over one shared robot and control.
"""

import numpy as np

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.solvers import ilqr
from ilqr_planner_tpu.systems.keypoints import AngularKeypoint, PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec, sequential_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
DOF = 7
robot = Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip"))
q0 = np.array([0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
               1.50592777, 0.71771416])
QMAX = np.array([2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973])
QMIN = np.array([-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973])

# --- joint space ----------------------------------------------------------
H, dt = 100, 0.1
rng = np.random.default_rng(0)
t1 = rng.uniform(QMIN, QMAX)
t2 = rng.uniform(QMIN, QMAX)
spec = make_spec("joint", robot,
                 [AngularKeypoint(t1, np.eye(DOF), H // 2 - 1),
                  AngularKeypoint(t2, np.eye(DOF), H - 1)],
                 np.ones(DOF) * 1e-5, H, 1, dt=dt, q0=q0,
                 q_max=QMAX, q_min=QMIN)
res = ilqr.solve(spec, np.zeros((H - 1, DOF)), 10)
X = np.asarray(res.X)
print(f"joint space: cost {float(res.cost):.3e}; "
      f"|q(49) - t1| = {np.abs(X[49] - t1).max():.2e}, "
      f"|q(99) - t2| = {np.abs(X[99] - t2).max():.2e}")

# --- hybrid joint + task space (HYBRID_SYS.ipynb) -------------------------
H, dt = 500, 0.01
posture = rng.uniform(QMIN, QMAX)
sub_joint = make_spec("joint", robot,
                      [AngularKeypoint(posture, np.eye(DOF), H // 2 - 1)],
                      np.ones(DOF) * 1e-3, H, 1, dt=dt, q0=q0,
                      q_max=QMAX, q_min=QMIN)
sub_task = make_spec("posorn", robot,
                     [PosOrnKeypoint([0.254121212377707, -0.07575049935289518,
                                      0.13170744424127526],
                                     [0.029927010072216945, 0.9121514607332729,
                                      0.4087591864532181, 0.00011933313484481926],
                                     np.diag([1, 1, 1, .1, .1, .1]), H - 1)],
                     np.ones(DOF) * 1e-3, H, 1, dt=dt, q0=q0,
                     q_max=QMAX, q_min=QMIN)
spec = sequential_spec((sub_joint, sub_task), np.ones(DOF) * 1e-6)
res = ilqr.solve(spec, np.zeros((H - 1, DOF)), 10)
X = np.asarray(res.X)
fX = np.asarray(res.fX)
print(f"hybrid: cost {float(res.cost):.3e} in {int(res.iterations)} iterations")
print(f"  posture error at k=249: {np.abs(X[H // 2 - 1] - posture).max():.2e}")
print(f"  EE position at k=499:   {fX[-1, DOF:DOF + 3]} "
      "(target [0.254, -0.0758, 0.132])")
