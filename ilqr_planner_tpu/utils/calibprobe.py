"""Fixed chip-speed calibration probe for the bench harnesses.

The tunnel chip's effective speed varies ~2x BY HOUR for identical
committed programs (docs/round4_notes.md, docs/roofline.md), so absolute
solves/s numbers are not comparable across rounds/runs. This probe is a
COMMITTED, NEVER-CHANGED microbenchmark in the same execution regime as the
fleet solver (a lax.scan of lane-wide elementwise FMAs over a [8, 65536]
f32 batch — VPU work with per-step scan overhead, no MXU): its wall time
`calib_s`, recorded in every bench JSON, normalizes cross-run comparisons:

    normalized_rate = solves_per_s * (calib_s / CALIB_NOMINAL_S)

CALIB_NOMINAL_S is the probe's time recorded on the round-5 bench chip; a
run with calib_s == 2x nominal means the environment ran 2x slow that day
and its raw solves/s should be doubled before comparing to nominal-speed
rounds.

DO NOT EDIT the probe program: any change invalidates cross-round
comparability (bump a version suffix instead if it must evolve).
"""

import time

import numpy as np

__all__ = ["calibration_probe", "CALIB_NOMINAL_S"]

# Probe wall time measured on the round-5 bench run's chip (v5e via the
# tunnel); recorded here once so later rounds can normalize against it.
CALIB_NOMINAL_S = 0.0308  # measured 2026-08-21, the round-5 bench.py artifact run

_STEPS = 400
_SHAPE = (8, 65536)


def calibration_probe(repeats: int = 3) -> float:
    """Best-of-`repeats` wall seconds of the fixed probe program.

    Jits on first call (cached); each timing fetches a tiny slice to sync
    (full-array fetches would time the ~50 MB/s tunnel, not the chip).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def probe(x):
        def step(c, _):
            c = c * 1.0000001 + 0.3 * jnp.sin(c) - 0.1 * c * c * 0.001
            return c, jnp.sum(c[:1, :8])
        c, out = jax.lax.scan(step, x, None, length=_STEPS)
        return c.ravel()[:4], out[-1]

    x = jnp.asarray(np.full(_SHAPE, 0.5, np.float32))
    np.asarray(probe(x)[0])  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        np.asarray(probe(x)[0])
        best = min(best, time.time() - t0)
    return best
