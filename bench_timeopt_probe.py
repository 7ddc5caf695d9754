"""Round-5 probe: phase split of the time-optimal fleet solve (the slowest
vs-baseline iLQR row, 756x).

Times, with x20 in-jit repetition (the tunnel's ~30-50 ms per-call floor
swamps single-call timings — see docs/round5_notes.md item 4):
  * the backward sweep alone (_backward on a fixed trajectory),
  * the trial loop alone (_run_trials with fixed gains),
  * one rollout pass alone (_rollout at alpha=0.5),
against the full 20-iteration solve. Usage: python bench_timeopt_probe.py [B]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("device:", jax.devices()[0], file=sys.stderr)

    import bench_table as bt
    from ilqr_planner_tpu.parallel.mesh import _fleet_dispatch, _fleet_x0s
    from ilqr_planner_tpu.solvers import fleet as F

    from ilqr_planner_tpu.utils.calibprobe import calibration_probe
    print(f"calib_s: {calibration_probe():.4f}", file=sys.stderr)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    H = 100
    from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint
    kps = [SpacetimeKeypoint(bt.T1_POS, bt.T1_ORN,
                             np.diag(bt.QD6 + [0]), 49, 2.0),
           SpacetimeKeypoint(bt.T2_POS, bt.T2_ORN,
                             np.diag(bt.QD6 + [0.1]), 99, 5.0)]
    spec = bt._build_spec("posorn_time", kps, H, 1, rt_dim=8, dt=None,
                          q0=np.zeros(7))
    rng = np.random.default_rng(1)
    q0s = (0.05 * rng.normal(size=(B, 7))).astype(np.float32)
    x0s = np.concatenate([q0s, np.zeros((B, 1), np.float32)], axis=-1)
    ov = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(x0s)}
    U0 = np.tile(np.array([0.0] * 7 + [0.01], np.float32), (H - 1, 1))
    U0s = jnp.asarray(np.tile(U0[None], (B, 1, 1)))

    use, ov_names = _fleet_dispatch(spec, ov)
    assert use, "timeopt row must be on the fleet path"
    print("ov_names:", ov_names, file=sys.stderr)

    solver = F.make_fleet_solver(spec, 20, overrides=ov_names)
    fx0s = _fleet_x0s(spec, ov, U0s)
    ovd = {k: jnp.asarray(ov[k]) for k in ov_names}

    def timed(tag, fn, *args):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"{tag}: first {time.time()-t0:.1f}s", file=sys.stderr)
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        return best, out

    best, res = timed("full", solver, fx0s, jnp.asarray(U0s), ovd)
    it = float(np.median(np.asarray(res.iterations)))
    print(f"full solve: {best*1e3:.1f} ms -> {B/best:,.0f} solves/s, "
          f"median it {it}, per-iter {best/it*1e3:.2f} ms")

    # --- phase pieces on the post-solve trajectory (representative point) --
    cc = F._Consts(spec, ov_names)
    cc.unroll = 1
    cc.backward_impl = "auto"
    ovb = F._bind_ov(cc, ov_names, ovd)
    a_sched = F._alpha_schedule(cc, True)
    X = jnp.moveaxis(res.X, 0, -1)           # [H, n, B]
    U = jnp.moveaxis(res.U, 0, -1)           # [H-1, m, B]
    x0 = jnp.moveaxis(jnp.asarray(fx0s), 0, -1)
    _, _, cost0, _ = F._rollout(cc, 0.0, jnp.zeros((H - 1, cc.m, cc.n, B),
                                                   jnp.float32),
                                jnp.zeros((H - 1, cc.m, B), jnp.float32),
                                jnp.zeros((H, cc.n, B), jnp.float32),
                                U, x0, ovb)
    Ks, ds = F._backward(cc, X, U, ovb)
    Ks, ds = jax.block_until_ready((Ks, ds))

    REP = 20

    def make_bwd_rep(impl):
        @jax.jit
        def bwd_rep(X, U):
            def body(i, acc):
                cc.backward_impl = impl
                K2, d2 = F._backward(cc, X + acc * 1e-30, U, ovb)
                return acc + d2[0, 0, 0] * 1e-30
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0.0))
        return bwd_rep

    bwd_rep = make_bwd_rep("xla")
    bwd_rep_pl = make_bwd_rep("pallas")

    @jax.jit
    def trials_rep(X, U, cost0, Ks, ds):
        inactive = jnp.zeros((B,), bool)
        def body(i, acc):
            picked = F._run_trials(cc, a_sched, X + acc * 1e-30, U, cost0,
                                   Ks, ds, x0, ovb, inactive)
            return acc + picked[2][0] * 1e-30
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0.0))

    @jax.jit
    def rollout_rep(X, U, Ks, ds):
        def body(i, acc):
            _, _, ct, _ = F._rollout(cc, 0.5 + acc * 1e-30, Ks, ds, X, U,
                                     x0, ovb)
            return acc + ct[0] * 1e-30
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0.0))

    for tag, fn, args in (("backward-xla x20", bwd_rep, (X, U)),
                          ("backward-pallas x20", bwd_rep_pl, (X, U)),
                          ("trials   x20", trials_rep, (X, U, cost0, Ks, ds)),
                          ("rollout  x20", rollout_rep, (X, U, Ks, ds))):
        best, _ = timed(tag, fn, *args)
        print(f"{tag}: {best*1e3:.1f} ms total -> {best/REP*1e3:.2f} ms each")


if __name__ == "__main__":
    main()
