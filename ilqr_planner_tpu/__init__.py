"""ilqr_planner_tpu — a TPU-native iLQR trajectory-optimization framework.

A ground-up JAX/XLA re-design of the capability surface of idiap/ilqr_planner
(C++17/Eigen/KDL, see /root/reference): iterative-LQR trajectory optimization
for robot manipulators, rebuilt as pure functions over pytrees so that
thousands of scenarios batch, shard, and compile onto TPU meshes.

Layer map (mirrors the reference's L0-L4 layering, re-architected functionally):

  ops/      S^3 manifold math, SO(3) utils, control-primitive bases, LQR scans
  models/   kinematics: URDF -> chain pytree, FK + geometric Jacobians, planar
  systems/  OCP definition: dense keypoint specs, residuals, costs, dynamics
  solvers/  recursive iLQR, AL-iLQR, batch iLQR (+ control primitives), LQT
  parallel/ device meshes, sharded batch solves, multi-host runtime
  utils/    callbacks, serialization

Design principle: a problem is data (a `Spec` pytree), not an object graph.
The reference's stateful `SimulationInterface`/`System` mutation pattern
(System.cpp:163-179 teleports the robot to evaluate FK) becomes plain function
application: `fx_jac(spec, x)`.
"""

__version__ = "0.1.0"

from ilqr_planner_tpu import models, ops, parallel, solvers, systems, utils

__all__ = ["models", "ops", "parallel", "solvers", "systems", "utils", "__version__"]
