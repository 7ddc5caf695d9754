"""SO(3) utilities: rotation constructors and robust quaternion extraction.

These replace the reference's reliance on KDL rotations (KDLRobot.cpp:61-66,
102-103) and Eigen quaternions (TransformedSimulationInterface.cpp:94-103)
with branchless JAX. Quaternions are w-first: [w, x, y, z].
"""

import jax.numpy as jnp

__all__ = [
    "rot_x",
    "rot_y",
    "rot_z",
    "rpy_matrix",
    "euler_zyx",
    "axis_angle",
    "mat_to_quat",
    "quat_to_mat",
    "cross",
]


def rot_x(a):
    """Rotation matrix about the x axis by angle a (radians)."""
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def rot_y(a):
    """Rotation matrix about the y axis by angle a (radians)."""
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])


def rot_z(a):
    """Rotation matrix about the z axis by angle a (radians)."""
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def rpy_matrix(r, p, y):
    """URDF fixed-axis roll/pitch/yaw: R = Rz(y) @ Ry(p) @ Rx(r)."""
    return rot_z(y) @ rot_y(p) @ rot_x(r)


def euler_zyx(alpha, beta, gamma):
    """KDL Rotation::EulerZYX(a, b, g) = Rz(a) @ Ry(b) @ Rx(g).

    Used for the virtual-tip frame appended to the kinematic chain
    (KDLRobot.cpp:61-66, called with the rpy vector in order [0], [1], [2]).
    """
    return rot_z(alpha) @ rot_y(beta) @ rot_x(gamma)


def cross(a, b):
    """Cross product over the trailing axis (broadcasting)."""
    return jnp.cross(a, b)


def axis_angle(axis, theta):
    """Rodrigues rotation about unit `axis` (..., 3) by angle `theta` (...).

    Returns (..., 3, 3). Branchless so it traces under jit/vmap/scan.
    """
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=K.dtype)
    s = jnp.sin(theta)[..., None, None]
    c = jnp.cos(theta)[..., None, None]
    return eye + s * K + (1.0 - c) * (K @ K)


def quat_to_mat(q):
    """Quaternion [w,x,y,z] (...,4) to rotation matrix (...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R):
    """Rotation matrix (...,3,3) to quaternion [w,x,y,z], branchless Shepperd.

    Computes all four candidate extractions (by trace and by each dominant
    diagonal element) and selects the numerically stable one, mirroring the
    branch structure of KDL's GetQuaternion (KDLRobot.cpp:102-103 consumer).
    The sign convention (w >= 0 not enforced) is irrelevant downstream: the
    S^3 log-map residual is invariant to the quaternion double cover.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-30))

    # Candidate 0: trace-dominant
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    # Candidate 1: m00-dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    # Candidate 2: m11-dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    # Candidate 3: m22-dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    # Pick the extraction with the largest radicand — the numerically most
    # stable of the four (strictly better than the plain trace>0 branch).
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
