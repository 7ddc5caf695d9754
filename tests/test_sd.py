"""Unit tests for S^3 manifold ops against an independent NumPy oracle.

The oracle below re-derives the reference formulas (sd.h:14-100) directly in
NumPy with explicit Python branching; the JAX implementation must agree while
remaining branchless.
"""

import numpy as np
import pytest

from ilqr_planner_tpu.ops import sd

rng = np.random.default_rng(0)


def np_unit(x):
    return x / np.linalg.norm(x)


def np_distance(x, y):
    d = float(np.clip(np.dot(x, y), -1.0, 1.0))
    ac = np.arccos(d)
    return ac - np.pi if d < 0 else ac


def np_logmap(base, y):
    if not np.any(base) or not np.any(y):
        return np.zeros_like(base)
    b, yn = np_unit(base), np_unit(y)
    temp = yn - np.dot(b, yn) * b
    tn = np.linalg.norm(temp)
    if tn == 0:
        return np.zeros_like(base)
    return np_distance(b, yn) * temp / tn


def np_transport(v, b1, b2):
    if not np.any(b1) or not np.any(b2):
        return v
    d2 = np_distance(b1, b2) ** 2
    if d2 == 0:
        return v
    l12, l21 = np_logmap(b1, b2), np_logmap(b2, b1)
    return v - (np.dot(l12, v) / d2) * (l12 + l21)


def rand_quat():
    return np_unit(rng.normal(size=4))


@pytest.mark.parametrize("trial", range(20))
def test_log_map_matches_oracle(trial):
    b, y = rand_quat(), rand_quat()
    np.testing.assert_allclose(sd.log_map(b, y), np_logmap(b, y), atol=1e-12)


def test_log_map_zero_guards():
    q = rand_quat()
    assert np.allclose(sd.log_map(np.zeros(4), q), 0)
    assert np.allclose(sd.log_map(q, np.zeros(4)), 0)
    assert np.allclose(sd.log_map(q, q), 0)  # coincident -> zero tangent


def test_log_map_hemisphere_invariance():
    """logMap(base, -y) == logMap(base, y): the double-cover flip (sd.h:57-60)."""
    b, y = rand_quat(), rand_quat()
    np.testing.assert_allclose(sd.log_map(b, -y), sd.log_map(b, y), atol=1e-12)


def test_distance_clamp_and_flip():
    q = rand_quat()
    # acos near 1 has sqrt(eps) conditioning: ~1.5e-8 is exact-arith zero
    assert float(sd.distance(q, q)) == pytest.approx(0.0, abs=1e-7)
    assert float(sd.distance(q, -q)) == pytest.approx(0.0, abs=1e-7)
    b, y = rand_quat(), rand_quat()
    assert float(sd.distance(b, y)) == pytest.approx(np_distance(b, y), abs=1e-12)


@pytest.mark.parametrize("trial", range(10))
def test_transport_matches_oracle(trial):
    b1, b2 = rand_quat(), rand_quat()
    v = rng.normal(size=4)
    np.testing.assert_allclose(sd.transport(v, b1, b2), np_transport(v, b1, b2), atol=1e-10)


def test_transport_degenerate_passthrough():
    v, q = rng.normal(size=4), rand_quat()
    np.testing.assert_allclose(sd.transport(v, np.zeros(4), q), v)
    np.testing.assert_allclose(sd.transport(v, q, q), v)


def test_exp_log_roundtrip():
    b = rand_quat()
    u = rng.normal(size=4) * 0.3
    u = u - np.dot(u, b) * b  # tangent at b
    y = np.asarray(sd.exp_map(b, u))
    np.testing.assert_allclose(sd.log_map(b, y), u, atol=1e-9)


def test_exp_map_zero_tangent():
    b = rand_quat()
    np.testing.assert_allclose(sd.exp_map(b, np.zeros(4)), b, atol=1e-15)


def test_dquat_jac_shape_and_rows():
    q = rand_quat()
    E = np.asarray(sd.dquat_to_dx_jac(q))
    w, x, y, z = q
    np.testing.assert_allclose(E[0], [-x, w, -z, y])
    np.testing.assert_allclose(E[1], [-y, z, w, -x])
    np.testing.assert_allclose(E[2], [-z, -y, x, w])
    # E(q) q = 0: quaternion rate orthogonal to q maps to angular velocity
    np.testing.assert_allclose(E @ q, np.zeros(3), atol=1e-12)


def test_batched_broadcasting():
    B = 7
    bs = np.stack([rand_quat() for _ in range(B)])
    ys = np.stack([rand_quat() for _ in range(B)])
    out = np.asarray(sd.log_map(bs, ys))
    for i in range(B):
        np.testing.assert_allclose(out[i], np_logmap(bs[i], ys[i]), atol=1e-12)
