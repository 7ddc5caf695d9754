"""A/B the Pallas whole-sweep backward vs the XLA segmented scan, on chip.

Measures (1) the isolated backward sweep and (2) the full flagship fleet
solve with each backward implementation, at the bench batch size. Prints
one JSON line; diagnostics on stderr. Run with a single tunnel client.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from __graft_entry__ import Q0, _panda_spec
    from ilqr_planner_tpu.solvers import fleet

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 9216
    spec = _panda_spec(100, 49, 99, jnp.float32)
    H, n = spec.horizon, spec.nx

    rng = np.random.default_rng(0)
    q0s = (np.asarray(Q0)[None] + 0.05 * rng.normal(size=(B, 7))).astype(np.float32)
    U0s = np.zeros((B, H - 1, 7), np.float32)

    # --- isolated backward sweep ---
    X = jnp.asarray(np.cumsum(
        np.concatenate([q0s[None], 0.002 * rng.normal(size=(H - 1, B, 7))]),
        axis=0).transpose(0, 2, 1).astype(np.float32))       # [H, n, B]
    U = jnp.asarray(0.01 * rng.normal(size=(H - 1, 7, B)).astype(np.float32))

    sweep = {}
    out = {}
    for mode in ("xla", "pallas"):
        cc = fleet._Consts(spec)
        cc.backward_impl = mode
        f = jax.jit(lambda X, U, cc=cc: fleet._backward(cc, X, U))
        t0 = time.time()
        K, d = f(X, U)
        np.asarray(d[0, 0, :8])
        print(f"sweep[{mode}]: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(5):
            t0 = time.time()
            K, d = f(X, U)
            np.asarray(d[0, 0, :8])
            ts.append(time.time() - t0)
        sweep[mode] = min(ts)
        out[f"sweep_{mode}_ms"] = round(min(ts) * 1e3, 2)
        if mode == "pallas":
            out["sweep_K_maxdiff"] = float(np.abs(
                np.asarray(K) - np.asarray(K_ref)).max())
        else:
            K_ref = K
        print(f"sweep[{mode}]: {[f'{t*1e3:.1f}ms' for t in ts]}",
              file=sys.stderr)

    # --- full solve ---
    for mode in ("xla", "pallas"):
        solver = fleet.make_fleet_solver(spec, 10, backward=mode)
        t0 = time.time()
        res = solver(q0s, U0s)
        np.asarray(res.cost)
        print(f"solve[{mode}]: compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        ts = []
        for _ in range(5):
            t0 = time.time()
            res = solver(q0s, U0s)
            np.asarray(res.cost)
            ts.append(time.time() - t0)
        costs = np.asarray(res.cost)
        out[f"solve_{mode}_ms"] = round(min(ts) * 1e3, 2)
        out[f"solve_{mode}_solves_per_s"] = round(B / min(ts), 1)
        out[f"solve_{mode}_converged"] = float(np.mean(costs < 1e-4))
        print(f"solve[{mode}]: {[f'{t*1e3:.1f}ms' for t in ts]} "
              f"-> {B/min(ts):,.0f} solves/s, "
              f"{np.mean(costs<1e-4):.1%} converged", file=sys.stderr)

    out["batch"] = B
    out["sweep_speedup"] = round(sweep["xla"] / sweep["pallas"], 2)
    out["solve_speedup"] = round(out["solve_xla_ms"] / out["solve_pallas_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
