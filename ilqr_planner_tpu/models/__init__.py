"""Robot models: kinematic chains (URDF), planar arms, frame transforms.

Functional replacement of the reference's L1 "sim" layer
(SimulationInterface/KDLRobot/Robot2D/TransformedSimulationInterface).
A robot is a pytree of static geometry; forward kinematics and Jacobians are
pure functions of the joint configuration, so they vmap over scenario batches
and differentiate/jit cleanly — there is no mutable robot object on the
compute path.
"""

from ilqr_planner_tpu.models.chain import KinematicChain, chain_fk, chain_kin
from ilqr_planner_tpu.models.kinstate import KinState, transform_kin
from ilqr_planner_tpu.models.planar import PlanarRobot, planar_fk, planar_kin
from ilqr_planner_tpu.models.robot import Robot, robot_kin
from ilqr_planner_tpu.models.urdf import chain_from_urdf, parse_urdf

__all__ = [
    "KinematicChain",
    "KinState",
    "PlanarRobot",
    "Robot",
    "chain_fk",
    "chain_kin",
    "chain_from_urdf",
    "parse_urdf",
    "planar_fk",
    "planar_kin",
    "robot_kin",
    "transform_kin",
]
