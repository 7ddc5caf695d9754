"""Tests for control-primitive basis builders (primitives.cpp:13-97)."""

import numpy as np

from ilqr_planner_tpu.ops import primitives


def test_unitstep_partition():
    psi = primitives.build_psi_unitstep(99, 2)
    assert psi.shape == (99, 2)
    # bw = round(99/2) = 50: first column covers rows [0,50) at height 1/50
    assert np.allclose(psi[:50, 0], 1.0 / 50)
    assert np.allclose(psi[50:, 0], 0.0)
    assert np.allclose(psi[50:99, 1], 1.0 / 50)  # second window truncated at dim


def test_unitstep_columns_sum():
    psi = primitives.build_psi_unitstep(100, 4)
    # each column integrates to 1 when windows fit exactly
    np.testing.assert_allclose(psi.sum(axis=0), np.ones(4))


def test_rbf_shape_and_peak_positions():
    dim, K = 100, 5
    psi = primitives.build_psi_rbf(dim, K)
    assert psi.shape == (dim, K)
    bw = dim / K
    for i in range(K):
        expected_center = bw / 2 + i * bw
        assert abs(np.argmax(psi[:, i]) - expected_center) <= 1
    # amplitude formula 1/(2 pi sig) at the center (primitives.cpp:28)
    assert psi[:, 2].max() <= 1.0 / (2 * np.pi * bw) + 1e-12


def test_bernstein_partition_of_unity():
    psi = primitives.build_psi_bernstein(50, 4)
    np.testing.assert_allclose(psi.sum(axis=1), np.ones(50), atol=1e-12)
    # endpoint interpolation
    assert psi[0, 0] == 1.0 and psi[-1, -1] == 1.0


def test_sawtooth_ramp():
    dim, K = 12, 3
    psi = primitives.build_psi_sawtooth(dim, K)
    bw = 4  # ceil(12/3)
    expected = (np.arange(bw)) / (bw - 1) - 0.5
    np.testing.assert_allclose(psi[:bw, 0], expected)
    assert np.allclose(psi[bw:, 0], 0)


def test_linear_is_hstack():
    dim, K = 30, 3
    psi = primitives.build_psi_linear(dim, K)
    assert psi.shape == (dim, 2 * K)
    np.testing.assert_allclose(psi[:, :K], primitives.build_psi_unitstep(dim, K))
    np.testing.assert_allclose(psi[:, K:], primitives.build_psi_sawtooth(dim, K))
