"""Probe: Pallas fused Riccati kernel vs plain-XLA structured backward on
the real TPU at bench shapes (VERDICT r1 item 4: prove on hardware or cut).

Usage: python bench_pallas_probe.py [B] [H] [LS]
Prints correctness deltas vs the f32 XLA reference and per-call timings.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.ops.pallas_kernels.riccati import (
    riccati_backward_reference,
    riccati_backward_structured,
)

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
H = int(sys.argv[2]) if len(sys.argv) > 2 else 100
LS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
n, nq = 7, 6
dt = 0.1

print(f"device={jax.devices()[0]}  B={B} H={H} n={n} nq={nq} LS={LS}",
      file=sys.stderr)

rng = np.random.default_rng(0)
J = jnp.asarray(rng.normal(size=(B, H, nq, n)) * 0.3, jnp.float32)
e = jnp.asarray(rng.normal(size=(B, H, nq)) * 0.05, jnp.float32)
ld = jnp.zeros((B, H, n), jnp.float32)
lq = jnp.zeros((B, H, n), jnp.float32)
u = jnp.asarray(rng.normal(size=(B, H - 1, n)) * 0.1, jnp.float32)
# keypoint-sparse precisions: only the final step carries weight
prec = np.zeros((H, nq, nq), np.float32)
prec[-1] = np.diag([1, 1, 1, .1, .1, .1])
prec[H // 2] = np.diag([1, 1, 1, .1, .1, .1])
prec = jnp.asarray(prec)
Rt = np.ones(n, np.float32) * 1e-5

with jax.default_matmul_precision("float32"):
    ref_fn = jax.jit(lambda *a: riccati_backward_reference(*a, Rt, dt))
    pl_fn = jax.jit(lambda *a: riccati_backward_structured(
        *a, Rt, dt, lane_sublanes=LS))

    t0 = time.perf_counter()
    K_r, d_r = jax.block_until_ready(ref_fn(J, e, ld, lq, u, prec))
    print(f"xla compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    K_p, d_p = jax.block_until_ready(pl_fn(J, e, ld, lq, u, prec))
    print(f"pallas compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    dK = float(jnp.max(jnp.abs(K_p - K_r)))
    dd = float(jnp.max(jnp.abs(d_p - d_r)))
    print(f"max|dK|={dK:.3e}  max|dd|={dd:.3e}", file=sys.stderr)

    def timeit(fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(J, e, ld, lq, u, prec))
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    t_ref, ts_ref = timeit(ref_fn)
    t_pl, ts_pl = timeit(pl_fn)

print(f"xla   best {t_ref*1e3:8.2f} ms  all {[f'{t*1e3:.1f}' for t in ts_ref]}")
print(f"pallas best {t_pl*1e3:8.2f} ms  all {[f'{t*1e3:.1f}' for t in ts_pl]}")
print(f"speedup xla/pallas = {t_ref/t_pl:.2f}x   dK={dK:.2e} dd={dd:.2e}")
