"""One-off probe: lane-major fleet solver throughput on the TPU chip."""
import sys
import time

import numpy as np

from __graft_entry__ import Q0, _panda_spec

NB_ITER = 10


def main():
    import jax
    import jax.numpy as jnp

    from ilqr_planner_tpu.solvers.fleet import make_fleet_solver

    print("device:", jax.devices()[0], file=sys.stderr)
    spec = _panda_spec(100, 49, 99, jnp.float32)
    solver = make_fleet_solver(spec, NB_ITER)

    for B in (int(a) for a in sys.argv[1:] or ["2048", "8192", "16384", "32768"]):
        rng = np.random.default_rng(0)
        q0s = (Q0[None] + 0.05 * rng.normal(size=(B, 7))).astype(np.float32)
        U0s = np.zeros((B, 99, 7), np.float32)
        t0 = time.time()
        res = solver(q0s, U0s)
        np.asarray(res.cost)
        print(f"B={B}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        times = []
        for _ in range(5):
            t0 = time.time()
            res = solver(q0s, U0s)
            c = np.asarray(res.cost)
            times.append(time.time() - t0)
        best = min(times)
        conv = float(np.mean(c < 1e-4)) * 100
        print(f"B={B}: {best*1e3:.1f} ms -> {B/best:,.0f} solves/s "
              f"(median cost {np.median(c):.2e}, {conv:.1f}% conv)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
