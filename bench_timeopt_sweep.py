"""Round-5 sweep: time-optimal fleet solve vs batch size and scan unroll.

The phase probe (bench_timeopt_probe.py) shows the timeopt iteration is
~half backward, ~half trial rollouts, each op-issue-latency-bound (1.5 ms
per 100-step rollout pass at B=2048). Both should amortize with more lanes
and with scan unrolling. Usage: python bench_timeopt_sweep.py [B ...]
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
    from ilqr_planner_tpu.solvers import fleet as F
    from ilqr_planner_tpu.systems.keypoints import SpacetimeKeypoint
    from ilqr_planner_tpu.utils.calibprobe import calibration_probe

    print(f"calib_s: {calibration_probe():.4f}", file=sys.stderr)

    H = 100
    kps = [SpacetimeKeypoint(bt.T1_POS, bt.T1_ORN,
                             np.diag(bt.QD6 + [0]), 49, 2.0),
           SpacetimeKeypoint(bt.T2_POS, bt.T2_ORN,
                             np.diag(bt.QD6 + [0.1]), 99, 5.0)]
    spec = bt._build_spec("posorn_time", kps, H, 1, rt_dim=8, dt=None,
                          q0=np.zeros(7))

    Bs = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192]
    for B in Bs:
        rng = np.random.default_rng(1)
        q0s = (0.05 * rng.normal(size=(B, 7))).astype(np.float32)
        x0s = np.concatenate([q0s, np.zeros((B, 1), np.float32)], axis=-1)
        U0 = np.tile(np.array([0.0] * 7 + [0.01], np.float32), (H - 1, 1))
        U0s = jnp.asarray(np.tile(U0[None], (B, 1, 1)))
        for unroll in (1, 2, 4):
            solver = F.make_fleet_solver(spec, 20, unroll=unroll)
            t0 = time.time()
            res = solver(jnp.asarray(x0s), U0s)
            jax.block_until_ready(res.cost)
            first = time.time() - t0
            best = float("inf")
            for _ in range(4):
                t0 = time.time()
                res = solver(jnp.asarray(x0s), U0s)
                jax.block_until_ready(res.cost)
                best = min(best, time.time() - t0)
            c = np.asarray(res.cost)
            print(f"B={B} unroll={unroll}: {best*1e3:.1f} ms -> "
                  f"{B/best:,.0f} solves/s (first {first:.1f}s, median cost "
                  f"{np.median(c):.2e}, median it "
                  f"{np.median(np.asarray(res.iterations))})")


if __name__ == "__main__":
    main()
