"""Serial kinematic chains: FK, geometric Jacobian, Jacobian time-derivative.

TPU-native replacement for the reference's KDL stack (KDLRobot.cpp:83-115:
ChainJntToJacSolver + ChainFkSolverPos_recursive + getJacobianDerivative<7>).
The chain is a pytree of static geometry (per-actuated-joint origin transforms
with fixed joints folded in, joint axes, prismatic mask, tip transform) and
everything below is a pure function of q/dq: vmap-able over scenario batches,
jit-compiled to straight-line code (the joint loop unrolls at trace time —
dof is static).

Conventions: quaternions are w-first (KDLRobot.cpp:102-103 extracts w into
index 0); the geometric Jacobian is 6 x dof with linear rows on top, expressed
in the base frame with the reference point at the chain tip (KDL convention).
"""

import jax.numpy as jnp
from flax import struct

from ilqr_planner_tpu.models.kinstate import KinState
from ilqr_planner_tpu.ops import so3

__all__ = ["KinematicChain", "chain_fk", "chain_kin", "jacobian_derivative"]


@struct.dataclass
class KinematicChain:
    """Static geometry of an n-joint serial chain (pytree of arrays).

    origin_rot: (nj, 3, 3)  rotation of joint i's frame in its parent frame
                            (fixed joints between actuated ones are folded in)
    origin_pos: (nj, 3)     translation of joint i's frame in its parent frame
    axis:       (nj, 3)     joint axis in the joint's own frame
    prismatic:  (nj,)       1.0 where the joint is prismatic, 0.0 revolute
    tip_rot:    (3, 3)      fixed transform from the last joint frame to the
                            tip, including the reference's appended virtual
                            frame (KDLRobot.cpp:61-66)
    tip_pos:    (3,)
    """

    origin_rot: jnp.ndarray
    origin_pos: jnp.ndarray
    axis: jnp.ndarray
    prismatic: jnp.ndarray
    tip_rot: jnp.ndarray
    tip_pos: jnp.ndarray

    @property
    def dof(self) -> int:
        return self.origin_pos.shape[-2]


def _frames(chain: KinematicChain, q):
    """Walk the chain, returning per-joint world axes/origins and the EE frame.

    Returns (p_ee[3], R_ee[3,3], z[nj,3] world joint axes, o[nj,3] world joint
    origins). The loop over joints is a static Python unroll.
    """
    nj = chain.dof
    R = jnp.eye(3, dtype=q.dtype)
    p = jnp.zeros(3, dtype=q.dtype)
    zs, os_ = [], []
    for i in range(nj):
        p = p + R @ chain.origin_pos[i]
        R = R @ chain.origin_rot[i]
        z = R @ chain.axis[i]
        prism = chain.prismatic[i]
        # Branchless revolute/prismatic: rotate by q*(1-prism), translate by q*prism.
        R = R @ so3.axis_angle(chain.axis[i], q[i] * (1.0 - prism))
        p = p + z * (q[i] * prism)
        zs.append(z)
        os_.append(p)
    p_ee = p + R @ chain.tip_pos
    R_ee = R @ chain.tip_rot
    return p_ee, R_ee, jnp.stack(zs), jnp.stack(os_)


def chain_fk(chain: KinematicChain, q):
    """Forward kinematics: (EE position [3], EE quaternion [4] w-first)."""
    p_ee, R_ee, _, _ = _frames(chain, q)
    return p_ee, so3.mat_to_quat(R_ee)


def chain_jacobian(chain: KinematicChain, q):
    """Geometric Jacobian 6 x dof ([Jt; Jr]) plus FK, one chain walk.

    Revolute column i: Jv = z_i x (p_ee - o_i), Jw = z_i.
    Prismatic column i: Jv = z_i, Jw = 0.
    Matches KDL's ChainJntToJacSolver output consumed at KDLRobot.cpp:91.
    """
    p_ee, R_ee, z, o = _frames(chain, q)
    prism = chain.prismatic[:, None]
    Jv = jnp.where(prism > 0, z, jnp.cross(z, p_ee[None, :] - o))
    Jw = jnp.where(prism > 0, jnp.zeros_like(z), z)
    J = jnp.concatenate([Jv.T, Jw.T], axis=0)
    return p_ee, R_ee, J


def jacobian_derivative(J, dq):
    """Analytic dJ/dt from the cross-product structure of the geometric
    Jacobian, contracted with dq (reference: utils.h:70-113, any dof).

    For columns i and differentiation joints j:
      j <  i : dJv_i/dq_j = Jw_j x Jv_i ; dJw_i/dq_j = Jw_j x Jw_i
      j == i : dJv_i/dq_i = Jw_i x Jv_i ; dJw_i/dq_i = 0
      j >  i : dJv_i/dq_j = Jw_i x Jv_j ; dJw_i/dq_j = 0
    (These are exactly the index formulas at utils.h:85-100, where the
    reference hardcodes dof=7.)

    The formulas hold for prismatic joints too, automatically: a prismatic
    column has Jw = 0, which zeroes exactly the terms that must vanish —
    translating joint j rotates nothing (Jw_j = 0 kills the j < i terms),
    a prismatic column's axis is unaffected by its own or later joints
    (Jw_i = 0 kills the j >= i terms), while a later prismatic joint still
    translates the EE point for a revolute column (the Jw_i x Jv_j term
    with Jv_j = z_j remains). FD-validated on a mixed revolute/prismatic
    chain in tests/test_kinematics.py.
    """
    dof = J.shape[-1]
    Jv = J[:3].T  # (dof, 3) columns
    Jw = J[3:].T
    # Pairwise cross products, [j, i, 3]
    lin_le = jnp.cross(Jw[:, None, :], Jv[None, :, :])  # j <= i: Jw_j x Jv_i
    ang_lt = jnp.cross(Jw[:, None, :], Jw[None, :, :])  # j <  i: Jw_j x Jw_i
    lin_gt = jnp.cross(Jw[None, :, :], Jv[:, None, :])  # j >  i: Jw_i x Jv_j
    jj = jnp.arange(dof)[:, None]
    ii = jnp.arange(dof)[None, :]
    lin = jnp.where((jj <= ii)[..., None], lin_le, lin_gt)
    ang = jnp.where((jj < ii)[..., None], ang_lt, jnp.zeros_like(ang_lt))
    dJv = jnp.einsum("jic,j->ci", lin, dq)
    dJw = jnp.einsum("jic,j->ci", ang, dq)
    return jnp.concatenate([dJv, dJw], axis=0)


def chain_kin(chain: KinematicChain, q, dq) -> KinState:
    """Full kinematic state at (q, dq): the pure-function analogue of
    KDLRobot::updateKinematics (KDLRobot.cpp:83-115)."""
    p_ee, R_ee, J = chain_jacobian(chain, q)
    quat = so3.mat_to_quat(R_ee)
    dJ = jacobian_derivative(J, dq)
    dx = J[:3] @ dq
    w = J[3:] @ dq
    return KinState(x=p_ee, dx=dx, quat=quat, w=w, J=J, dJ=dJ)
