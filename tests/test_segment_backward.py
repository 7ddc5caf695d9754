"""Pallas whole-sweep backward (interpret mode) vs the XLA fleet backward.

The kernel must reproduce the segmented-scan backward's gains exactly (same
recursion, same elimination order) and the full solve must agree lane-by-
lane on the flagship workload.
"""

import numpy as np
import pytest

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.solvers.fleet import make_fleet_solver
from ilqr_planner_tpu.systems.keypoints import AngularKeypoint, PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
Q0 = np.array([0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
               1.50592777, 0.71771416])
T1 = ([0.554121212377707, -0.01575049935289518, 0.38295604872511507],
      [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
       0.022333898196169735])
T2 = ([0.254121212377707, -0.07575049935289518, 0.13170744424127526],
      [0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
       0.00011933313484481926])
H = 40
B = 128  # one (1, 128) lane tile — interpret mode is slow


@pytest.fixture(scope="module")
def panda64():
    return Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip",
                                            dtype=np.dtype(np.float64)))


def _spec_posorn(robot):
    kps = [PosOrnKeypoint(*T1, np.diag([1, 1, 1, .1, .1, .1]), H // 2 - 1),
           PosOrnKeypoint(*T2, np.diag([1, 1, 1, .1, .1, .1]), H - 1)]
    qmax = Q0 + 0.4  # tight enough that limit penalties go live
    return make_spec("posorn", robot, kps, np.ones(7) * 1e-5, H, 1, dt=0.1,
                     q0=Q0, q_max=qmax, q_min=Q0 - 0.4, dtype=np.float64)


def _batch(B, seed=0):
    rng = np.random.default_rng(seed)
    q0s = Q0[None] + 0.05 * rng.normal(size=(B, 7))
    U0s = np.zeros((B, H - 1, 7))
    return q0s, U0s


def test_pallas_backward_single_sweep_exact(panda64):
    """One backward sweep, kernel vs XLA scan, on a limit-active trajectory:
    agreement to f64 reordering noise (~1e-11). (The full SOLVE below can't
    pin Ks this tightly: the limit penalty's active-set indicator x > q_max
    is discontinuous, so ulp differences flip activation on boundary lanes
    across iterations and the final-iteration gains jump ~1e-6 while cost/U
    stay at 1e-10 — inherent to the problem, not the kernel.)"""
    import jax.numpy as jnp

    from ilqr_planner_tpu.solvers import fleet

    spec = _spec_posorn(panda64)
    cc = fleet._Consts(spec)
    rng = np.random.default_rng(0)
    q0s = Q0[None] + 0.05 * rng.normal(size=(B, 7))
    steps = np.concatenate([q0s[None], 0.01 * rng.normal(size=(H - 1, B, 7))])
    X = jnp.asarray(np.cumsum(steps, axis=0).transpose(0, 2, 1))  # [H, n, B]
    U = jnp.asarray(0.05 * rng.normal(size=(H - 1, 7, B)))
    cc.backward_impl = "xla"
    K1, d1 = fleet._backward(cc, X, U)
    cc.backward_impl = "pallas_interpret"
    K2, d2 = fleet._backward(cc, X, U)
    assert float(jnp.abs(K1 - K2).max()) < 1e-10
    assert float(jnp.abs(d1 - d2).max()) < 1e-10


def _forced_cfg(monkeypatch, cfg):
    from ilqr_planner_tpu.ops.pallas_kernels import segment_backward as sb
    monkeypatch.setattr(sb, "_pick_nt_ls", lambda B: cfg)


def test_pallas_backward_matches_xla_flagship(panda64):
    spec = _spec_posorn(panda64)
    q0s, U0s = _batch(B)
    ref = make_fleet_solver(spec, 6, backward="xla")(q0s, U0s)
    pal = make_fleet_solver(spec, 6, backward="pallas_interpret")(q0s, U0s)
    np.testing.assert_allclose(np.asarray(pal.cost), np.asarray(ref.cost),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(pal.U), np.asarray(ref.U),
                               atol=1e-10)
    np.testing.assert_array_equal(np.asarray(pal.iterations),
                                  np.asarray(ref.iterations))


def test_pallas_backward_matches_xla_joint_no_inner_kp(panda64):
    """Joint kind, single terminal keypoint: the no-inner-keypoint path
    (empty gxx stack, one unbroken segment)."""
    kps = [AngularKeypoint(Q0 + 0.3, np.eye(7), H - 1)]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("joint", panda64, kps, np.ones(7) * 1e-5, H, 1, dt=0.1,
                     q0=Q0, q_max=qmax, q_min=-qmax, dtype=np.float64)
    q0s, U0s = _batch(B, seed=2)
    ref = make_fleet_solver(spec, 5, backward="xla")(q0s, U0s)
    pal = make_fleet_solver(spec, 5, backward="pallas_interpret")(q0s, U0s)
    np.testing.assert_allclose(np.asarray(pal.cost), np.asarray(ref.cost),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(pal.U), np.asarray(ref.U),
                               atol=1e-10)


def test_pallas_backward_multi_inner_keypoints(panda64):
    """Three inner keypoints incl. adjacent ones: exercises empty segments
    between static keypoint steps."""
    kps = [PosOrnKeypoint(*T1, np.diag([1, 1, 1, .1, .1, .1]), 10),
           PosOrnKeypoint(*T1, np.diag([1, 1, 1, .1, .1, .1]), 11),
           PosOrnKeypoint(*T2, np.diag([1, 1, 1, .1, .1, .1]), 25),
           PosOrnKeypoint(*T2, np.diag([1, 1, 1, .1, .1, .1]), H - 1)]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn", panda64, kps, np.ones(7) * 1e-5, H, 1, dt=0.1,
                     q0=Q0, q_max=qmax, q_min=-qmax, dtype=np.float64)
    q0s, U0s = _batch(B, seed=3)
    ref = make_fleet_solver(spec, 4, backward="xla")(q0s, U0s)
    pal = make_fleet_solver(spec, 4, backward="pallas_interpret")(q0s, U0s)
    np.testing.assert_allclose(np.asarray(pal.cost), np.asarray(ref.cost),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(pal.U), np.asarray(ref.U),
                               atol=1e-10)


def test_pallas_backward_multi_tile_fori_path(panda64, monkeypatch):
    """The G>1 lane-tile fori_loop path (minor-axis dynamic slices) must
    match the single-group path exactly. B=256 with the (NT, LS) config
    forced to (1, 1) gives two 128-lane groups without interpret-mode
    cost."""
    import jax.numpy as jnp

    from ilqr_planner_tpu.ops.pallas_kernels import segment_backward as sb
    from ilqr_planner_tpu.solvers import fleet

    spec = _spec_posorn(panda64)
    cc = fleet._Consts(spec)
    B2 = 256
    rng = np.random.default_rng(1)
    q0s = Q0[None] + 0.05 * rng.normal(size=(B2, 7))
    steps = np.concatenate([q0s[None], 0.01 * rng.normal(size=(H - 1, B2, 7))])
    X = jnp.asarray(np.cumsum(steps, axis=0).transpose(0, 2, 1))
    U = jnp.asarray(0.05 * rng.normal(size=(H - 1, 7, B2)))
    cc.backward_impl = "pallas_interpret"
    K1, d1 = fleet._backward(cc, X, U)          # G=1 (NT=2, LS=1)
    monkeypatch.setattr(sb, "_pick_nt_ls", lambda B: (1, 1))
    K2, d2 = fleet._backward(cc, X, U)          # G=2 fori path
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)


def test_pallas_backward_ls16_tile_exact(panda64):
    """The round-5 tile configs — (16, 128) blocks and the NT=2
    tile-interleaved kernel body — run the identical recursion: one
    short-horizon sweep at B=2048 (picked config NT=2, LS=8) against the
    XLA path, and a forced (1, 16) single-tile config."""
    import jax.numpy as jnp

    from ilqr_planner_tpu.ops.pallas_kernels import segment_backward as sb
    from ilqr_planner_tpu.solvers import fleet
    from ilqr_planner_tpu.systems.spec import make_spec

    Hs = 8
    kps = [PosOrnKeypoint(*T1, np.diag([1, 1, 1, .1, .1, .1]), Hs - 1)]
    spec = make_spec("posorn", panda64, kps, np.ones(7) * 1e-5, Hs, 1,
                     dt=0.1, q0=Q0, dtype=np.float64)
    Bt = 2048
    assert sb._pick_nt_ls(Bt) == (2, 8)
    cc = fleet._Consts(spec)
    rng = np.random.default_rng(3)
    q0s = Q0[None] + 0.05 * rng.normal(size=(Bt, 7))
    steps = np.concatenate([q0s[None],
                            0.01 * rng.normal(size=(Hs - 1, Bt, 7))])
    X = jnp.asarray(np.cumsum(steps, axis=0).transpose(0, 2, 1))
    U = jnp.asarray(0.05 * rng.normal(size=(Hs - 1, 7, Bt)))
    cc.backward_impl = "xla"
    K1, d1 = fleet._backward(cc, X, U)
    cc.backward_impl = "pallas_interpret"
    K2, d2 = fleet._backward(cc, X, U)
    assert float(jnp.abs(K1 - K2).max()) < 1e-10
    assert float(jnp.abs(d1 - d2).max()) < 1e-10


def test_pallas_backward_forced_ls16_single_tile(panda64, monkeypatch):
    """Forced (NT=1, LS=16) config at B=2048: same values as the picked
    (NT=2, LS=8) config — the NT interleave is layout, not math."""
    import jax.numpy as jnp

    from ilqr_planner_tpu.solvers import fleet
    from ilqr_planner_tpu.systems.spec import make_spec

    Hs = 6
    kps = [PosOrnKeypoint(*T1, np.diag([1, 1, 1, .1, .1, .1]), Hs - 1)]
    spec = make_spec("posorn", panda64, kps, np.ones(7) * 1e-5, Hs, 1,
                     dt=0.1, q0=Q0, dtype=np.float64)
    Bt = 2048
    cc = fleet._Consts(spec)
    rng = np.random.default_rng(4)
    q0s = Q0[None] + 0.05 * rng.normal(size=(Bt, 7))
    steps = np.concatenate([q0s[None],
                            0.01 * rng.normal(size=(Hs - 1, Bt, 7))])
    X = jnp.asarray(np.cumsum(steps, axis=0).transpose(0, 2, 1))
    U = jnp.asarray(0.05 * rng.normal(size=(Hs - 1, 7, Bt)))
    cc.backward_impl = "pallas_interpret"
    K1, d1 = fleet._backward(cc, X, U)          # picked (2, 8)
    _forced_cfg(monkeypatch, (1, 16))
    K2, d2 = fleet._backward(cc, X, U)
    np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)


def test_pallas_backward_2nd_order_interpret_exact(panda64):
    """The round-5 2nd-order whole-sweep kernel reuses the fleet's own
    _q_terms/_gains_value list algebra inside the kernel body, so kernel
    and XLA path run identical math; interpret-mode f64 parity on a
    short double-integrator sweep with an inner keypoint."""
    import jax.numpy as jnp

    from ilqr_planner_tpu.solvers import fleet
    from ilqr_planner_tpu.systems.spec import make_spec

    Hs = 10
    qd = np.diag([1, 1, 1, .1, .1, .1, 1, 1, 1, 0, 0, 0])
    kps = [PosOrnKeypoint(*T1, qd, Hs // 2,
                          dposition=[0, 0, 0], dorientation=[0, 0, 0, 0]),
           PosOrnKeypoint(*T2, qd, Hs - 1,
                          dposition=[0, 0, 0], dorientation=[0, 0, 0, 0])]
    qmax = np.ones(7) * np.pi * 10
    spec = make_spec("posorn", panda64, kps, np.ones(7) * 1e-5, Hs, 2,
                     dt=0.01, q0=Q0, q_max=qmax, q_min=-qmax,
                     dq_max=np.ones(7) * 10, dq_min=-np.ones(7) * 10,
                     dtype=np.float64)
    Bt = 128
    cc = fleet._Consts(spec)
    n = cc.n
    rng = np.random.default_rng(5)
    q0s = Q0[None] + 0.05 * rng.normal(size=(Bt, 7))
    x0 = np.concatenate([q0s, 0.1 * rng.normal(size=(Bt, 7))], axis=-1)
    steps = np.concatenate([x0[None],
                            0.01 * rng.normal(size=(Hs - 1, Bt, n))])
    X = jnp.asarray(np.cumsum(steps, axis=0).transpose(0, 2, 1))
    U = jnp.asarray(0.05 * rng.normal(size=(Hs - 1, 7, Bt)))
    cc.backward_impl = "xla"
    K1, d1 = fleet._backward(cc, X, U)
    cc.backward_impl = "pallas_interpret"
    K2, d2 = fleet._backward(cc, X, U)
    assert K2.shape == (Hs - 1, 7, n, Bt)
    assert float(jnp.abs(K1 - K2).max()) < 1e-10
    assert float(jnp.abs(d1 - d2).max()) < 1e-10


def test_pallas_backward_time1_interpret_exact(panda64):
    """The time-optimal 1st-order whole-sweep kernel (round-5 extension of
    the 2nd-order kernel: kind='time1') also reuses the fleet's own
    _q_terms/_gains_value algebra in the kernel body — interpret-mode f64
    parity on a short sqrt-dt sweep with an inner Spacetime keypoint."""
    import jax.numpy as jnp

    from ilqr_planner_tpu.solvers import fleet
    from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint
    from ilqr_planner_tpu.systems.spec import make_spec

    Hs = 12
    kps = [SpacetimeKeypoint(*T1, np.diag([1, 1, 1, .1, .1, .1, 0]),
                             Hs // 2, 2.0),
           SpacetimeKeypoint(*T2, np.diag([1, 1, 1, .1, .1, .1, 0.1]),
                             Hs - 1, 5.0)]
    qmax = Q0 + 0.4  # tight enough that limit penalties go live
    spec = make_spec("posorn_time", panda64, kps, np.ones(8) * 1e-5, Hs, 1,
                     dt=None, q0=Q0, q_max=qmax, q_min=Q0 - 0.4,
                     dtype=np.float64)
    Bt = 128
    cc = fleet._Consts(spec)
    n = cc.n
    assert n == cc.m == 8
    rng = np.random.default_rng(7)
    q0s = Q0[None] + 0.05 * rng.normal(size=(Bt, 7))
    x0 = np.concatenate([q0s, np.zeros((Bt, 1))], axis=-1)
    steps = np.concatenate([x0[None],
                            0.02 * rng.normal(size=(Hs - 1, Bt, n))])
    X = jnp.asarray(np.cumsum(steps, axis=0).transpose(0, 2, 1))
    # controls [dq_cmd, s]: keep s away from zero so the chain-rule column
    # (PosOrnTimePlannerSys.cpp:161-162) is well exercised
    U_np = 0.05 * rng.normal(size=(Hs - 1, 8, Bt))
    U_np[:, -1] = 0.1 + 0.05 * np.abs(U_np[:, -1])
    U = jnp.asarray(U_np)
    cc.backward_impl = "xla"
    K1, d1 = fleet._backward(cc, X, U)
    cc.backward_impl = "pallas_interpret"
    K2, d2 = fleet._backward(cc, X, U)
    assert K2.shape == (Hs - 1, 8, n, Bt)
    assert float(jnp.abs(K1 - K2).max()) < 1e-10
    assert float(jnp.abs(d1 - d2).max()) < 1e-10


def test_rollout_time1_kernel_interpret_exact(panda64):
    """The time-optimal rollout kernel must reproduce fleet._rollout's
    X/U/per-step ||du||^2 bit-close (identical per-step FLOP sequence) in
    f64 interpret mode, and the full fleet solve with rollout=
    'pallas_interpret' must match the default scan line search to
    reduction-order rounding (the limit/keypoint cost reductions move
    outside the scan — the affine-LS contract)."""
    import jax.numpy as jnp

    from ilqr_planner_tpu.ops.pallas_kernels import rollout_time1 as rt1
    from ilqr_planner_tpu.solvers import fleet
    from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint
    from ilqr_planner_tpu.systems.spec import make_spec

    Hs = 12
    kps = [SpacetimeKeypoint(*T1, np.diag([1, 1, 1, .1, .1, .1, 0]),
                             Hs // 2, 2.0),
           SpacetimeKeypoint(*T2, np.diag([1, 1, 1, .1, .1, .1, 0.1]),
                             Hs - 1, 5.0)]
    qmax = Q0 + 0.4
    spec = make_spec("posorn_time", panda64, kps, np.ones(8) * 1e-5, Hs, 1,
                     dt=None, q0=Q0, q_max=qmax, q_min=Q0 - 0.4,
                     dtype=np.float64)
    Bt = 128
    cc = fleet._Consts(spec)
    cc.unroll = 1
    n = cc.n
    rng = np.random.default_rng(9)
    q0s = Q0[None] + 0.05 * rng.normal(size=(Bt, 7))
    x0 = jnp.asarray(np.concatenate([q0s, np.zeros((Bt, 1))],
                                    axis=-1).T)                  # [n, B]
    steps = np.concatenate([np.asarray(x0.T)[None],
                            0.02 * rng.normal(size=(Hs - 1, Bt, n))])
    Xref = jnp.asarray(np.cumsum(steps, axis=0).transpose(0, 2, 1))
    U_np = 0.05 * rng.normal(size=(Hs - 1, 8, Bt))
    U_np[:, -1] = 0.1 + 0.05 * np.abs(U_np[:, -1])
    Uref = jnp.asarray(U_np)
    Ks = jnp.asarray(0.1 * rng.normal(size=(Hs - 1, 8, n, Bt)))
    ds = jnp.asarray(0.05 * rng.normal(size=(Hs - 1, 8, Bt)))

    # (a) raw kernel vs the scan rollout: X/U bit-close, du consistent
    Xs, Us, cs, dus = fleet._rollout(cc, 0.5, Ks, ds, Xref, Uref, x0)
    Xk, Uk, du2 = rt1.rollout_time1_pallas(jnp.float64(0.5), Ks, ds, Xref,
                                           Uref, x0, interpret=True)
    assert float(jnp.abs(Xk - Xs).max()) < 1e-12
    assert float(jnp.abs(Uk - Us).max()) < 1e-12
    duk = jnp.sum(jnp.sqrt(du2), axis=0)
    np.testing.assert_allclose(np.asarray(duk), np.asarray(dus), rtol=1e-12)
    # cost recomposed outside the kernel: reduction order differs from the
    # scan's sequential accumulation, values agree to rounding
    ck = fleet._static_step_costs(cc, Xk, Uk, None,
                                  fleet._limit_cost_full(cc, Xk))
    np.testing.assert_allclose(np.asarray(ck), np.asarray(cs), rtol=1e-12)

    # (b) full solve equivalence: forced kernel rollout vs default scan
    q0b = (Q0[None] + 0.05 * rng.normal(size=(Bt, 7)))
    x0s = np.concatenate([q0b, np.zeros((Bt, 1))], axis=-1)
    U0 = np.tile(np.array([0.0] * 7 + [0.01]), (Hs - 1, 1))
    U0s = np.tile(U0[None], (Bt, 1, 1))
    ref = fleet.make_fleet_solver(spec, 6)(x0s, U0s)
    got = fleet.make_fleet_solver(spec, 6,
                                  rollout="pallas_interpret")(x0s, U0s)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(ref.U),
                               atol=1e-9)
    assert np.array_equal(np.asarray(got.iterations),
                          np.asarray(ref.iterations))


def test_rollout_kernel_forced_out_of_scope_raises(panda64):
    """rollout='pallas' on a non-time-optimal kind fails loudly (matching
    the backward knob's behavior)."""
    kps = [PosOrnKeypoint(*T1, np.diag([1, 1, 1, .1, .1, .1]), H - 1)]
    spec = make_spec("posorn", panda64, kps, np.ones(7) * 1e-5, H, 1,
                     dt=0.1, q0=Q0, dtype=np.float64)
    with pytest.raises(ValueError, match="rollout kernel's scope"):
        from ilqr_planner_tpu.solvers.fleet import make_fleet_solver as mk
        mk(spec, 2, rollout="pallas")
