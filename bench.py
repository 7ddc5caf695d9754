"""Benchmark: concurrent 7-DoF Panda pos+quaternion iLQR solves per second
on one TPU chip (the BASELINE.json north-star workload).

Workload: H=100, dt=0.1, two via-points, recursive iLQR, 10 iterations with
line search + early stopping — the exact POS_ORN_SYS.ipynb configuration the
reference solves in 19.2 ms on one CPU core (~52 solves/s/core). Here a
batch of perturbed scenarios (random initial configurations) solves
concurrently via vmap on one chip.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

REFERENCE_SOLVES_PER_S = 1.0 / 0.0192  # 19.2 ms/solve, 1 CPU core

# Lane-count cliff: an XLA TPU pathology with lane-varying while_loop
# conditions (early stop / line search) collapses throughput ~2500x above a
# batch-size threshold, measured precisely between 1216 (961k solves/s) and
# 1280 (333 solves/s) lanes on v5e. Run at the measured sweet spot with a
# collapse guard that falls back to smaller batches if the threshold ever
# moves with a compiler update.
BATCH_CANDIDATES = (1216, 1152, 768)
COLLAPSE_US_PER_SOLVE = 50.0  # healthy is ~1-3 us/solve; collapsed is ~3000
NB_ITER = 10
REPEATS = 5


def _run_batch(solve_batch, spec, Q0, batch, jnp):
    rng = np.random.default_rng(0)
    q0s = (Q0[None, :] + 0.05 * rng.normal(size=(batch, 7))).astype(np.float32)
    overrides = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(q0s)}
    U0s = jnp.zeros((batch, 99, 7), jnp.float32)

    import jax

    t0 = time.time()
    res = solve_batch(spec, overrides, U0s, NB_ITER)
    jax.block_until_ready(res.cost)
    print(f"B={batch}: compile+first solve {time.time() - t0:.1f}s",
          file=sys.stderr)

    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        res = solve_batch(spec, overrides, U0s, NB_ITER)
        jax.block_until_ready(res.cost)
        times.append(time.time() - t0)
    return min(times), res


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import Q0, _panda_spec
    from ilqr_planner_tpu.parallel import solve_batch

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    spec = _panda_spec(100, 49, 99, jnp.float32)
    for BATCH in BATCH_CANDIDATES:
        best, res = _run_batch(solve_batch, spec, Q0, BATCH, jnp)
        if best / BATCH * 1e6 < COLLAPSE_US_PER_SOLVE:
            break
        print(f"B={BATCH}: collapsed ({best / BATCH * 1e6:.0f} us/solve), "
              f"retrying smaller", file=sys.stderr)

    costs = np.asarray(res.cost)
    median_cost = float(np.median(costs))
    converged = float(np.mean(costs < 1e-4))
    print(f"best {best*1000:.2f} ms for {BATCH} solves; "
          f"median cost {median_cost:.2e}; {converged:.1%} converged < 1e-4",
          file=sys.stderr)
    if converged < 0.95:
        print("WARNING: convergence below 95% — throughput number suspect",
              file=sys.stderr)

    solves_per_s = BATCH / best
    print(json.dumps({
        "metric": "panda_posorn_H100_ilqr10_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / REFERENCE_SOLVES_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
