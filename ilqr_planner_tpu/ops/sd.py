"""S^d unit-sphere (S^3 quaternion) manifold operations, branchless for jit/vmap.

Functional equivalents of the reference header-only `Sd` namespace
(reference: ilqr_planner/include/ilqr_planner/utils/sd.h:14-100). All the
reference's guard branches (zero inputs, coincident bases, dot-product clamp,
hemisphere flip) are reproduced as masked `where` selects so every function is
jit-, vmap-, and scan-compatible. Operations broadcast over leading batch axes;
the manifold dimension is the trailing axis.

Numerics intentionally preserved:
  * `distance` clamps the dot product to [-1, 1] and subtracts pi when the dot
    is negative (hemisphere flip, sd.h:48-62) — this makes the quaternion
    log-map sign-invariant (q and -q give identical residuals).
  * `log_map` returns zero when either input is exactly zero or when the
    projected tangent has zero norm (sd.h:67-82).
  * `transport` returns `v` unchanged when either base is zero or the geodesic
    distance squared underflows to zero (sd.h:87-99).
"""

import jax.numpy as jnp

__all__ = [
    "to_unit_norm",
    "dquat_to_dx_jac",
    "exp_map",
    "distance",
    "log_map",
    "transport",
    "quat_rate",
]


def _norm(x):
    return jnp.sqrt(jnp.sum(x * x, axis=-1))


def _is_zero(x):
    """Exact all-zero test, matching Eigen's isZero() guard (sd.h:68, 88)."""
    return jnp.all(x == 0, axis=-1)


def to_unit_norm(x):
    """Normalize to unit norm (sd.h:19-21), guarded against zero input."""
    n = _norm(x)
    return x / jnp.where(n > 0, n, 1.0)[..., None]


def dquat_to_dx_jac(q):
    """The 3x4 map E(q) from quaternion rate to angular velocity (sd.h:23-27).

    Quaternion layout is w-first: q = [w, x, y, z]. Broadcasts over leading
    axes, returning shape (..., 3, 4).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([-x, w, -z, y], axis=-1)
    row1 = jnp.stack([-y, z, w, -x], axis=-1)
    row2 = jnp.stack([-z, -y, x, w], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def exp_map(base, u):
    """Map tangent vector `u` at `base` onto the sphere (sd.h:32-43)."""
    b = to_unit_norm(base)
    nu = _norm(u)
    safe = jnp.where(nu > 0, nu, 1.0)[..., None]
    mapped = to_unit_norm(b * jnp.cos(nu)[..., None] + u * jnp.sin(nu)[..., None] / safe)
    return jnp.where((nu == 0)[..., None], b, mapped)


def distance(x, y):
    """Signed geodesic distance with hemisphere flip (sd.h:48-62).

    The raw dot product is used (no normalization), clamped to [-1, 1]; when
    it is negative the arccos is shifted by -pi, which makes downstream
    log-map residuals invariant to the quaternion double cover.
    """
    d = jnp.clip(jnp.sum(x * y, axis=-1), -1.0, 1.0)
    ac = jnp.arccos(d)
    return jnp.where(d < 0, ac - jnp.pi, ac)


def log_map(base, y):
    """Project sphere point `y` into the tangent space of `base` (sd.h:67-82)."""
    degenerate = _is_zero(base) | _is_zero(y)
    b = to_unit_norm(base)
    yn = to_unit_norm(y)
    temp = yn - jnp.sum(b * yn, axis=-1, keepdims=True) * b
    tn = _norm(temp)
    out = distance(b, yn)[..., None] * temp / jnp.where(tn > 0, tn, 1.0)[..., None]
    out = jnp.where((tn == 0)[..., None], jnp.zeros_like(out), out)
    return jnp.where(degenerate[..., None], jnp.zeros_like(out), out)


def transport(v, base1, base2):
    """Parallel-transport tangent `v` from `base1`'s to `base2`'s tangent space
    (sd.h:87-99), with the reference's degenerate-case passthroughs."""
    degenerate = _is_zero(base1) | _is_zero(base2)
    d2 = distance(base1, base2) ** 2
    l12 = log_map(base1, base2)
    l21 = log_map(base2, base1)
    coef = jnp.sum(l12 * v, axis=-1) / jnp.where(d2 > 0, d2, 1.0)
    out = v - coef[..., None] * (l12 + l21)
    out = jnp.where((d2 == 0)[..., None], v, out)
    return jnp.where(degenerate[..., None], v, out)


def quat_rate(quat, w):
    """Quaternion rate 0.5 * E(q)^T * omega (SimulationInterface.cpp:69-73)."""
    E = dquat_to_dx_jac(quat)
    return 0.5 * jnp.einsum("...ij,...i->...j", E, w)
