"""Kinematic state pytree and object-frame transforms.

`KinState` is the functional analogue of the mutable fields of the reference's
`SimulationInterface` (SimulationInterface.h:117-123: x, dx, ornQuat, w, Jac,
dJac) — produced fresh by pure FK instead of being updated in place.

`transform_kin` replaces `TransformedSimulationInterface`
(TransformedSimulationInterface.cpp:31-103): expressing end-effector
quantities in an object frame T is function composition over the kin state,
not a decorator object.
"""

import jax.numpy as jnp
from flax import struct

from ilqr_planner_tpu.ops import so3


@struct.dataclass
class KinState:
    """End-effector kinematic quantities at one configuration.

    x:    (..., c)    EE position (c = nb_cartesian_dims, 3 for chains, 2 planar)
    dx:   (..., c)    EE linear velocity, Jt @ dq
    quat: (..., 4)    EE orientation quaternion, w-first
    w:    (..., c)    EE angular velocity, Jr @ dq
    J:    (..., 2c, dof) geometric Jacobian [Jt; Jr]
    dJ:   (..., 2c, dof) time derivative of J (utils.h:70-113)
    """

    x: jnp.ndarray
    dx: jnp.ndarray
    quat: jnp.ndarray
    w: jnp.ndarray
    J: jnp.ndarray
    dJ: jnp.ndarray


def transform_kin(T, ks: KinState) -> KinState:
    """Express a 3-D kin state in object frame T (4x4 homogeneous transform).

    Mirrors TransformedSimulationInterface exactly:
      J'  = blockdiag(R, R)^T J          (cpp:53-58)
      dJ' likewise                       (cpp:60-65)
      x'  = R^T (x - p)                  (cpp:67-69)
      dx' = R^T dx, w' = R^T w           (cpp:71-77)
      q'  : R_dest = R^T R(q)            (cpp:94-103)
    """
    R = T[:3, :3]
    p = T[:3, 3]
    x = (ks.x - p) @ R  # R^T @ v written as v @ R for batch friendliness
    dx = ks.dx @ R
    w = ks.w @ R
    Rq = so3.quat_to_mat(ks.quat)
    quat = so3.mat_to_quat(jnp.swapaxes(R, -1, -2) @ Rq)
    Rt = jnp.swapaxes(R, -1, -2)
    top = Rt @ ks.J[..., :3, :]
    bot = Rt @ ks.J[..., 3:, :]
    J = jnp.concatenate([top, bot], axis=-2)
    dtop = Rt @ ks.dJ[..., :3, :]
    dbot = Rt @ ks.dJ[..., 3:, :]
    dJ = jnp.concatenate([dtop, dbot], axis=-2)
    return KinState(x=x, dx=dx, quat=quat, w=w, J=J, dJ=dJ)
