"""Regression tests for the scoped zero-state residual guard.

The reference's zero-residual guard exists ONLY in PosOrnKeypoint::diff
(src/system/PosOrnKeypoint.cpp:29); AngularKeypoint::diff is an unguarded
`getState() - state` (src/system/AngularKeypoint.cpp:24-27), and
SpacetimeKeypoint::diff appends the time residual unguarded
(src/system/SpacetimeKeypoint.cpp:19-23). Round-3 over-applied the guard to
every kind, so a joint-space solve from q0 = 0 with U0 = 0 silently no-oped
(cost 0.0, U = 0). These tests pin the fixed scoping on the generic path,
the fleet path, and the raw residual function.
"""

import jax.numpy as jnp
import numpy as np

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.solvers import ilqr
from ilqr_planner_tpu.solvers.fleet import fleet_supported, make_fleet_solver
from ilqr_planner_tpu.systems import funcs
from ilqr_planner_tpu.systems.keypoints import AngularKeypoint, PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
H = 60


def _panda(dtype=np.float64):
    return Robot.from_chain(
        chain_from_urdf(URDF, "panda_link0", "panda_tip",
                        dtype=np.dtype(dtype))
    )


def _joint_spec_from_zero(robot, dtype=np.float64):
    target = np.linspace(0.3, 0.9, 7)
    kps = [AngularKeypoint(target, np.eye(7), H - 1)]
    qmax = np.ones(7) * np.pi * 10
    return make_spec("joint", robot, kps, np.ones(7) * 1e-5, H, 1, dt=0.1,
                     q0=np.zeros(7), q_max=qmax, q_min=-qmax,
                     dtype=dtype), target


def test_joint_residual_unguarded_at_zero_state():
    spec, target = _joint_spec_from_zero(_panda())
    fx = jnp.zeros(7, dtype=jnp.float64)
    e = funcs.residual(spec, fx, H - 1)
    np.testing.assert_allclose(np.asarray(e), target, atol=1e-12)


def test_joint_solve_from_zero_state_tracks_target():
    spec, target = _joint_spec_from_zero(_panda())
    res = ilqr.solve(spec, np.zeros((H - 1, 7)), 20)
    # Before the fix: cost 0.0, iterations 1, U == 0 (silent no-op).
    assert int(res.iterations) > 1
    assert np.abs(np.asarray(res.U)).max() > 1e-3
    np.testing.assert_allclose(np.asarray(res.X[-1]), target, atol=1e-3)


def test_joint_fleet_from_zero_state_tracks_target():
    spec, target = _joint_spec_from_zero(_panda(np.float32), dtype=np.float32)
    assert fleet_supported(spec)
    B = 3
    q0s = np.zeros((B, 7), np.float32)
    U0s = np.zeros((B, H - 1, 7), np.float32)
    out = make_fleet_solver(spec, 20)(q0s, U0s)
    assert np.abs(np.asarray(out.U)).max() > 1e-3
    np.testing.assert_allclose(np.asarray(out.X)[:, -1, :],
                               np.tile(target, (B, 1)), atol=1e-3)


def test_posorn_residual_guard_retained_at_zero_state():
    # PosOrnKeypoint.cpp:29: an exactly-zero forward state still zeroes the
    # pos/orn residual.
    robot = _panda()
    kps = [PosOrnKeypoint([0.5, 0.1, 0.4], [0.0, 1.0, 0.0, 0.0],
                          np.eye(6), H - 1)]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn", robot, kps, np.ones(7) * 1e-5, H, 1, dt=0.1,
                     q0=np.zeros(7), q_max=qmax, q_min=-qmax,
                     dtype=np.float64)
    e = funcs.residual(spec, jnp.zeros(7, dtype=jnp.float64), H - 1)
    np.testing.assert_array_equal(np.asarray(e), np.zeros(6))
