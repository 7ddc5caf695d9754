"""Robot: tagged union over kinematic model kinds + optional object frame.

The solver/system layers see one entry point, `robot_kin(robot, q, dq)`,
which dispatches statically (the kind is trace-time constant) and applies an
optional object-frame transform — replacing the reference's virtual-dispatch
`SimulationInterface` hierarchy plus `TransformedSimulationInterface`
decorator with data + pure functions.
"""

from typing import Optional

import jax.numpy as jnp
from flax import struct

from ilqr_planner_tpu.models.chain import KinematicChain, chain_kin
from ilqr_planner_tpu.models.kinstate import KinState, transform_kin
from ilqr_planner_tpu.models.planar import PlanarRobot, planar_kin

__all__ = ["Robot", "robot_kin"]


@struct.dataclass
class Robot:
    """kind: 'chain' | 'planar' (static). frame: optional 4x4 object frame T;
    when set, all EE quantities are expressed in that frame (the reference's
    TransformedSimulationInterface wrapping, cpp:31-103)."""

    kind: str = struct.field(pytree_node=False)
    chain: Optional[KinematicChain] = None
    planar: Optional[PlanarRobot] = None
    frame: Optional[jnp.ndarray] = None

    @property
    def dof(self) -> int:
        return self.chain.dof if self.kind == "chain" else self.planar.dof

    @property
    def nb_car_dim(self) -> int:
        """3 for spatial chains (KDLRobot.cpp:26), 2 planar (2DRobot.cpp:16)."""
        return 3 if self.kind == "chain" else 2

    def with_frame(self, T) -> "Robot":
        if self.kind == "planar":
            # The reference's TransformedSimulationInterface is likewise
            # 3-D-only in practice: its 6x6 blockdiag(R, R) J' transform
            # (cpp:53-58) cannot multiply Robot2D's 4 x dof Jacobian, so
            # wrapping a planar sim dimension-fails there too. Fail early
            # with a real message instead of a shape error at solve time.
            raise ValueError(
                "object frames require a 3-D (chain) robot; planar robots "
                "have 2-D positions and 4 x dof Jacobians that a 4x4 "
                "spatial frame cannot transform")
        return self.replace(frame=jnp.asarray(T))

    @staticmethod
    def from_chain(chain: KinematicChain) -> "Robot":
        return Robot(kind="chain", chain=chain)

    @staticmethod
    def from_planar(planar: PlanarRobot) -> "Robot":
        return Robot(kind="planar", planar=planar)


def robot_kin(robot: Robot, q, dq) -> KinState:
    """Kinematic state of `robot` at (q, dq); pure, vmap/jit-safe."""
    if robot.kind == "chain":
        ks = chain_kin(robot.chain, q, dq)
    elif robot.kind == "planar":
        ks = planar_kin(robot.planar, q, dq)
    else:
        raise ValueError(f"unknown robot kind {robot.kind!r}")
    if robot.frame is not None:
        ks = transform_kin(robot.frame, ks)
    return ks
