"""Sequential system over two object frames.

Port of POS_ORN_MULTI_SYS.ipynb: one robot, two tasks expressed in two
different object frames (frame transforms are function composition over the
kin state, not decorator objects), solved jointly.
"""

import numpy as np

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.ops import so3
from ilqr_planner_tpu.solvers import ilqr
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec, sequential_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
HORIZON, DT, DOF = 600, 0.01, 7

base = Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip"))
q0 = [0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
      1.50592777, 0.71771416]

obj1 = np.eye(4)
obj1[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
    [0.63758403393523, 0.2994657314658187, 0.6042309402208079, -0.37244039285286973])))
obj1[:3, 3] = [0.62, 0.05, 0.34]
obj2 = np.eye(4)
obj2[:3, :3] = np.asarray(so3.quat_to_mat(np.array(
    [-0.03647984, 0.94060485, 0.33742794, 0.00860923])))
obj2[:3, 3] = [0.32, 0.05, 0.54]

qmax = np.ones(DOF) * np.pi * 10
cmd = np.ones(DOF) * 1e-5
qd = np.diag([1, 1, 1, 0, 0, 0])  # position-only precision
sub1 = make_spec("posorn", base.with_frame(obj1),
                 [PosOrnKeypoint([0, 0, -0.15], [1, 0, 0, 0], qd, HORIZON // 2)],
                 cmd, HORIZON, 1, dt=DT, q0=q0, q_max=qmax, q_min=-qmax)
sub2 = make_spec("posorn", base.with_frame(obj2),
                 [PosOrnKeypoint([0.1, 0.1, -0.1], [1, 0, 0, 0], qd, HORIZON - 1)],
                 cmd, HORIZON, 1, dt=DT, q0=q0, q_max=qmax, q_min=-qmax)
spec = sequential_spec((sub1, sub2), cmd)

res = ilqr.solve(spec, np.zeros((HORIZON - 1, DOF)), 10)
fX = np.asarray(res.fX)
print(f"cost {float(res.cost):.3e} in {int(res.iterations)} iterations")
print("EE in obj1 frame at k=300:", fX[HORIZON // 2, :3], "(target [0, 0, -0.15])")
print("EE in obj2 frame at k=599:", fX[HORIZON - 1, 7:10], "(target [0.1, 0.1, -0.1])")
