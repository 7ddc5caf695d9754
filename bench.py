"""Benchmark: concurrent 7-DoF Panda pos+quaternion iLQR solves per second
on one TPU chip (the BASELINE.json north-star workload).

Workload: H=100, dt=0.1, two via-points, recursive iLQR, 10 iterations with
line search + early stopping — the exact POS_ORN_SYS.ipynb configuration the
reference solves in 19.2 ms on one CPU core (~52 solves/s/core). A batch of
perturbed scenarios (random initial configurations) solves concurrently via
vmap on one chip.

Prints ONE JSON line on stdout; diagnostics go to stderr. The JSON carries
every repeat's wall time and the min/median spread so environment noise
(the TPU is reached through a shared tunnel whose latency varies by hours)
is visible in the recorded artifact, not just the headline number.

A persistent XLA compilation cache (.jax_cache/) makes reruns immune to the
tunnel's multi-minute compile stalls: the first successful run stores the
compiled executable, later runs load it in seconds.

The wider BASELINE.md workload table lives in bench_table.py (committed
results: BENCH_TABLE.json).
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_SOLVES_PER_S = 1.0 / 0.0192  # 19.2 ms/solve, 1 CPU core

# Round-5 sweep (affine line search + NT kernel): B=9216 -> 79.3k solves/s,
# B=18432 -> 81.5k, B=36864 ~= 18432 (throughput saturates; all programs
# are in the persistent compile cache). Override with BENCH_BATCHES=a,b.
BATCH_CANDIDATES = tuple(
    int(b) for b in os.environ.get("BENCH_BATCHES",
                                   "36864,18432,9216").split(","))
NB_ITER = 10
REPEATS = 5


def _run_batch(solve_batch, spec, Q0, batch, jnp):
    rng = np.random.default_rng(0)
    q0s = (Q0[None, :] + 0.05 * rng.normal(size=(batch, 7))).astype(np.float32)
    overrides = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(q0s)}
    U0s = jnp.zeros((batch, 99, 7), jnp.float32)

    from ilqr_planner_tpu.utils.compilemeter import CompileMeter

    t0 = time.time()
    with CompileMeter() as cm:
        res = solve_batch(spec, overrides, U0s, NB_ITER)
        np.asarray(res.cost)
    compile_s = time.time() - t0
    compile_split = cm.report(wall_s=compile_s)
    print(f"B={batch}: compile+first solve {compile_s:.1f}s "
          f"(xla {compile_split['xla_compile_s']}s, trace "
          f"{compile_split['trace_s']}s, lower {compile_split['lower_s']}s, "
          f"other/tunnel {compile_split['other_s']}s)", file=sys.stderr)

    # Time to materialized-result: fetch the per-scenario costs to host each
    # repeat. jax.block_until_ready does not reliably wait on the remote
    # (axon tunnel) backend, so a value fetch is the only honest sync point.
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        res = solve_batch(spec, overrides, U0s, NB_ITER)
        np.asarray(res.cost)
        times.append(time.time() - t0)
    return times, compile_s, compile_split, res


# v5e single-chip ceilings (public spec / jax-ml.github.io/scaling-book):
# MXU 197 TFLOP/s bf16 (f32 accumulate ~1/2), HBM 819 GB/s. VPU: 8x128
# lanes x 4 ALUs; at the ~0.94-1.7 GHz clock range that is ~3.9-6.9
# TFLOP/s f32 elementwise — we use the conservative 3.9.
V5E_HBM_GBPS = 819.0
V5E_VPU_TFLOPS = 3.9
V5E_MXU_BF16_TFLOPS = 197.0


def _roofline(spec, batch, best_time_s, median_iters, jnp):
    """Sustained FLOP/s and HBM GB/s vs the v5e ceilings.

    Two accountings, both emitted:
    - `xla_static_*`: compiled.cost_analysis() — the compiler's own op
      counts, but each while/scan BODY is counted ONCE (trip counts are
      dynamic), so these UNDERCOUNT by roughly iters x horizon.
    - `model_*`: analytic per-step op model x the measured trip counts
      (median executed iterations, H-1 steps per sweep, the measured ~2.5
      average early-exit line-search passes). This is the honest sustained
      number; details in docs/roofline.md.
    The fleet program is VPU code by design (every op a [B]-lane elementwise
    FMA; nothing enters the MXU), so the ceilings are VPU FLOP rate and HBM.
    """
    import jax

    from ilqr_planner_tpu.solvers.fleet import make_fleet_solver
    solver = make_fleet_solver(spec, NB_ITER)
    x0s = jnp.zeros((batch, 7), jnp.float32)
    U0s = jnp.zeros((batch, 99, 7), jnp.float32)
    out = {}
    try:
        ca = jax.jit(solver.inner).lower(x0s, U0s).compile().cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        out["xla_static_flops_per_solve"] = round(float(ca.get("flops", 0.0))
                                                  / batch)
        out["xla_static_hbm_bytes_per_solve"] = round(
            float(ca.get("bytes accessed", 0.0)) / batch)
    except Exception as e:  # pragma: no cover - backend-dependent API
        print(f"roofline: cost_analysis unavailable ({e})", file=sys.stderr)

    # Analytic per-lane op model (flagship: n = m = 7, H = 100, 2 keypoints).
    # REFERENCE-ALGORITHM work (the long-form recursion's count, kept as the
    # round-over-round comparable "useful work" metric): backward step
    # Quu/Qux/Qxx ~3x49 FMA, Qu/Qx 21, stacked Gauss-Jordan ~450, value
    # recursion ~1500 -> ~5 kFLOP/step, plus the 2.5-average-trial
    # sequential line-search re-rollouts (~240 FLOP/step each) of the
    # reference's backtracking. The EXECUTED program since round 5:
    # collapsed LTI backward (fleet._gains_value_lti1 / Pallas kernel,
    # ~1.7 kFLOP/step) + ONE affine-family scan per iteration (~480
    # FLOP/step: base + direction) + ~1.3 scan-free trial passes (limit
    # penalty + du quadratic, ~90 FLOP/step-equivalent) — reported
    # separately below; the sustained/peak fractions use the reference-work
    # count so they measure speedup-normalized utilization, not reward
    # algorithmic shrinkage. Keypoint FK + GN terms ~4 kFLOP per evaluation.
    H = spec.horizon
    trials_avg = 2.5  # reference backtracking average (kept for the
    #                   reference-work accounting)
    flops_model = median_iters * ((H - 1) * 5000.0
                                  + trials_avg * (H - 1) * 240.0
                                  + 4 * 4000.0)
    flops_executed = median_iters * ((H - 1) * 1700.0
                                     + (H - 1) * 480.0
                                     + 1.3 * (H - 1) * 90.0
                                     + 4 * 4000.0)
    # HBM model: per iteration the backward writes K,d ([H-1, 56] f32), the
    # affine scan re-reads them once, and the trial passes + finalize read
    # the [H, n] base/direction trajectories.
    bytes_model = median_iters * (H - 1) * 56 * 4 * (1 + 1 + 1.5)
    tflops = flops_model * batch / best_time_s / 1e12
    gbps = bytes_model * batch / best_time_s / 1e9
    out.update({
        "model_flops_per_solve": round(flops_model),
        "model_executed_flops_per_solve": round(flops_executed),
        "model_hbm_bytes_per_solve": round(bytes_model),
        "model_sustained_tflops": round(tflops, 4),
        "model_sustained_hbm_gbps": round(gbps, 1),
        "vpu_peak_frac": round(tflops / V5E_VPU_TFLOPS, 4),
        "hbm_peak_frac": round(gbps / V5E_HBM_GBPS, 4),
        "mxu_bf16_peak_frac": round(tflops / V5E_MXU_BF16_TFLOPS, 6),
    })
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from __graft_entry__ import Q0, _panda_spec
    from ilqr_planner_tpu.parallel import solve_batch

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # Fixed calibration probe (utils/calibprobe.py): records this run's
    # chip/tunnel speed so cross-round solves/s are normalizable
    # (environment speed swings ~2x by hour; see docs/roofline.md).
    from ilqr_planner_tpu.utils.calibprobe import (CALIB_NOMINAL_S,
                                                   calibration_probe)
    calib_s = calibration_probe()
    print(f"calibration probe: {calib_s*1e3:.1f} ms "
          f"(nominal {CALIB_NOMINAL_S*1e3:.1f} ms, speed factor "
          f"{CALIB_NOMINAL_S/calib_s:.2f}x)", file=sys.stderr)

    spec = _panda_spec(100, 49, 99, jnp.float32)
    results = []
    for batch in BATCH_CANDIDATES:
        times, compile_s, csplit, r = _run_batch(solve_batch, spec, Q0, batch, jnp)
        t = min(times)
        print(f"B={batch}: repeats {[f'{x*1e3:.0f}ms' for x in times]} "
              f"-> best {batch / t:,.0f} solves/s", file=sys.stderr)
        results.append((batch / t, batch, times, compile_s, csplit, r))
    best_rate, BATCH, times, compile_s, csplit, res = max(results)

    costs = np.asarray(res.cost)
    median_cost = float(np.median(costs))
    converged = float(np.mean(costs < 1e-4))
    print(f"best {min(times)*1000:.2f} ms for {BATCH} solves; "
          f"median cost {median_cost:.2e}; {converged:.1%} converged < 1e-4",
          file=sys.stderr)
    if converged < 0.95:
        print("WARNING: convergence below 95% — throughput number suspect",
              file=sys.stderr)

    solves_per_s = BATCH / min(times)
    med_iters = float(np.median(np.asarray(res.iterations)))
    roofline = _roofline(spec, BATCH, min(times), med_iters, jnp)
    print(json.dumps({
        "metric": "panda_posorn_H100_ilqr10_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / REFERENCE_SOLVES_PER_S, 1),
        "batch": BATCH,
        "repeat_times_s": [round(t, 4) for t in times],
        "spread_max_over_min": round(max(times) / min(times), 2),
        "compile_s": round(compile_s, 1),
        "compile_split": csplit,
        "median_cost": median_cost,
        "converged_frac": converged,
        "calib_s": round(calib_s, 4),
        "calib_nominal_s": CALIB_NOMINAL_S,
        **roofline,
    }))


if __name__ == "__main__":
    main()
