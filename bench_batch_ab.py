"""Round-5 same-run A/B: affine trial evaluation in the batch (GN/CP)
solvers.

The fast batch path's line search evaluated each alpha on full control-
sized [(H-1) nu] arrays (u + alpha du -> closed-form states -> cost); for
the LTI kinds the keypoint-row states are linear in u, so trials now
evaluate on keypoint-row-sized arrays (base + alpha * direction) with the
control penalty as a quadratic in alpha — see batch._solve_body_fast.
This script measures the same-run throughput of both paths by toggling the
git-committed code change via the module-level flag below is NOT possible;
instead it measures the NEW path and prints the committed round-5 table
numbers for reference (batch_gn 8,210.8/s, batch_cp 12,537.3/s at B=4096
— same workload, same chip, earlier in the round).

Usage: python bench_batch_ab.py [B]
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
    from ilqr_planner_tpu.utils.calibprobe import calibration_probe

    print(f"calib_s: {calibration_probe():.4f}", file=sys.stderr)

    for row in ("batch_gn_h100_10it", "batch_cp_h100_10it"):
        maker = bt.ROWS[row]
        run, B, ref = maker(jnp)
        t0 = time.time()
        res = run()
        jax.block_until_ready(res.cost)
        first = time.time() - t0
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            res = run()
            jax.block_until_ready(res.cost)
            best = min(best, time.time() - t0)
        c = np.asarray(res.cost)
        print(f"{row}: B={B} {best*1e3:.1f} ms -> {B/best:,.0f} solves/s "
              f"(vs baseline {ref/(best/B):,.0f}x; first {first:.1f}s, "
              f"median cost {np.median(c):.2e}, median it "
              f"{np.median(np.asarray(res.iterations))})")


if __name__ == "__main__":
    main()
