"""Fused Riccati kernel tests.

1. The structured plain-JAX implementation must match the solver's generic
   backward pass on a real Panda spec (validates the A = I, B = dt I
   specialization).
2. The Pallas kernel (interpret mode on CPU) must match the structured
   implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.ops.pallas_kernels.riccati import (
    riccati_backward_reference,
    riccati_backward_structured,
)
from ilqr_planner_tpu.solvers import ilqr
from ilqr_planner_tpu.systems import funcs
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
Q0 = np.array([0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
               1.50592777, 0.71771416])


def _spec(H=12):
    robot = Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip"))
    kps = [PosOrnKeypoint(
        [0.554121212377707, -0.01575049935289518, 0.38295604872511507],
        [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
         0.022333898196169735], np.diag([1, 1, 1, .1, .1, .1]), H - 1)]
    qmax = np.ones(7) * np.pi * 10
    return make_spec("posorn", robot, kps, np.ones(7) * 1e-5, H, 1, dt=0.1,
                     q0=Q0, q_max=qmax, q_min=-qmax)


def _inputs(spec, B, seed=0):
    """Roll out B random control sequences and assemble kernel inputs."""
    H, n, nq = spec.horizon, spec.nu, spec.nq_var
    rng = np.random.default_rng(seed)
    U = rng.normal(size=(B, H - 1, n)) * 0.1

    def one(U_i):
        zK = jnp.zeros((H - 1, n, spec.nx), U_i.dtype)
        zd = jnp.zeros((H - 1, n), U_i.dtype)
        X, fX, U_, As, Bs, Js, c, dn = ilqr.rollout(
            spec, 0.0, zK, zd, jnp.zeros((H, spec.nx), U_i.dtype), U_i)
        ks = jnp.arange(H)
        e = jax.vmap(lambda fx, k: funcs.residual(spec, fx, k))(fX, ks)
        lim = jax.vmap(lambda x: funcs.limit_terms(spec, x))(X)
        return X, fX, U_, As, Bs, Js, e, lim[0], lim[1]

    X, fX, U_, As, Bs, Js, e, ld, lq = jax.vmap(one)(jnp.asarray(U))
    return X, fX, U_, As, Bs, Js, e, ld, lq


def test_structured_matches_generic_backward():
    spec = _spec()
    B = 3
    X, fX, U, As, Bs, Js, e, ld, lq = _inputs(spec, B)
    K_ref, d_ref = jax.vmap(
        lambda x, fx, u, a, b, j: ilqr._backward(spec, x, fx, u, a, b, j)
    )(X, fX, U, As, Bs, Js)
    K_st, d_st = riccati_backward_reference(
        Js, e, ld, lq, U, spec.prec, spec.Rt, float(spec.dt))
    np.testing.assert_allclose(np.asarray(K_st), np.asarray(K_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(d_st), np.asarray(d_ref), atol=1e-9)


def test_pallas_kernel_interpret_matches_reference():
    spec = _spec(H=6)
    B = 128  # one (1, 128) lane tile
    X, fX, U, As, Bs, Js, e, ld, lq = _inputs(spec, B, seed=1)
    args = (Js.astype(jnp.float32), e.astype(jnp.float32),
            ld.astype(jnp.float32), lq.astype(jnp.float32),
            U.astype(jnp.float32), spec.prec.astype(jnp.float32),
            np.asarray(spec.Rt, np.float32), float(spec.dt))
    K_ref, d_ref = riccati_backward_reference(*args)
    K_pl, d_pl = riccati_backward_structured(*args, lane_sublanes=1,
                                             interpret=True)
    # f32 Gauss-Jordan (kernel) vs f32 LU (reference): ~1e-4 relative on
    # O(1) entries, with absolute noise ~1e-3 on near-zero gain entries
    np.testing.assert_allclose(np.asarray(K_pl), np.asarray(K_ref),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               atol=2e-3, rtol=1e-3)


def test_lane_padding_validation():
    spec = _spec(H=4)
    with pytest.raises(ValueError, match="multiple"):
        riccati_backward_structured(
            jnp.zeros((100, 4, 6, 7)), jnp.zeros((100, 4, 6)),
            jnp.zeros((100, 4, 7)), jnp.zeros((100, 4, 7)),
            jnp.zeros((100, 3, 7)), spec.prec, spec.Rt, 0.1, interpret=True)
