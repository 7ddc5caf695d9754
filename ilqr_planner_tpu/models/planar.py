"""Planar n-link robot, the functional twin of the reference's Robot2D.

Reference: src/sim/2DRobot.cpp:13-70. Notable reproduced details:
  * fkine uses absolute joint angles, x = sum_i l_i [cos q_i, sin q_i]
    (2DRobot.cpp:28-38) — not cumulative angles.
  * The Jacobian is computed by forward finite differences with step
    pi*1e-3 (2DRobot.cpp:49-61), reproduced bit-for-bit for parity rather
    than replaced by the analytic derivative.
  * J is stacked 4 x dof with a zero rotational block (2DRobot.cpp:63-67);
    the orientation quaternion is pinned to identity (2DRobot.cpp:22-23).
"""

import jax.numpy as jnp
from flax import struct

from ilqr_planner_tpu.models.kinstate import KinState

__all__ = ["PlanarRobot", "planar_fk", "planar_kin"]

_FD_STEP = jnp.pi * 1e-3  # 2DRobot.cpp:50


@struct.dataclass
class PlanarRobot:
    """lengths: (dof,) link lengths."""

    lengths: jnp.ndarray

    @property
    def dof(self) -> int:
        return self.lengths.shape[-1]


def planar_fk(robot: PlanarRobot, q):
    """x = sum_i l_i [cos q_i, sin q_i]  (2DRobot.cpp:28-38)."""
    x = jnp.sum(robot.lengths * jnp.cos(q), axis=-1)
    y = jnp.sum(robot.lengths * jnp.sin(q), axis=-1)
    return jnp.stack([x, y], axis=-1)


def planar_jacobian(robot: PlanarRobot, q):
    """Finite-difference 2 x dof position Jacobian, step pi*1e-3
    (2DRobot.cpp:49-61)."""
    base = planar_fk(robot, q)
    dof = robot.dof
    eye = jnp.eye(dof, dtype=q.dtype)
    cols = [(planar_fk(robot, q + _FD_STEP * eye[i]) - base) / _FD_STEP for i in range(dof)]
    return jnp.stack(cols, axis=-1)


def planar_kin(robot: PlanarRobot, q, dq) -> KinState:
    """Kinematic state; identity quaternion, zero rotational rows
    (2DRobot.cpp:22-23, 63-67)."""
    x = planar_fk(robot, q)
    Jt = planar_jacobian(robot, q)
    zeros = jnp.zeros_like(Jt)
    J = jnp.concatenate([Jt, zeros], axis=-2)
    quat = jnp.zeros(q.shape[:-1] + (4,), dtype=q.dtype).at[..., 0].set(1.0)
    dx = jnp.einsum("...ij,...j->...i", Jt, dq)
    w = jnp.zeros_like(dx)
    return KinState(x=x, dx=dx, quat=quat, w=w, J=J, dJ=jnp.zeros_like(J))
