"""Structured solver metrics and profiling helpers.

The reference's observability is one formatted string per iteration
("Iteration i, Cost: c, alpha= a, time= t", ILQRRecursive.cpp:167-168).
`MetricsCallback` keeps that channel but also accumulates structured
records; `trace` wraps jax.profiler for TPU timeline captures.
"""

import contextlib
import time
from typing import List, Optional

from ilqr_planner_tpu.utils.callbacks import CallBackMessage

__all__ = ["MetricsCallback", "trace"]


class MetricsCallback(CallBackMessage):
    """Parses solver progress messages into structured records.

    records: list of dicts {iteration, cost, alpha, wall_time} where
    wall_time is measured host-side between notifications.
    """

    def __init__(self, verbose: bool = False):
        self.records: List[dict] = []
        self.verbose = verbose
        self._t_last = time.time()

    def notify(self, msg: str) -> None:
        now = time.time()
        rec = {"wall_time": now - self._t_last}
        self._t_last = now
        try:
            rec["iteration"] = int(msg.split("Iteration ")[1].split(",")[0])
            rec["cost"] = float(msg.split("Cost: ")[1].split(",")[0])
            rec["alpha"] = float(msg.split("alpha= ")[1].split(",")[0])
        except (IndexError, ValueError):
            rec["raw"] = msg
        self.records.append(rec)
        if self.verbose:
            print(msg)

    @property
    def costs(self):
        return [r["cost"] for r in self.records if "cost" in r]

    @property
    def alphas(self):
        return [r["alpha"] for r in self.records if "alpha" in r]


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Profile a solve: `with trace('/tmp/tb'): solve(...)` captures a TPU
    timeline viewable in TensorBoard/XProf; with logdir=None it is a no-op
    timer printing elapsed wall time."""
    if logdir is None:
        t0 = time.time()
        yield
        print(f"[trace] {time.time() - t0:.3f}s")
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
