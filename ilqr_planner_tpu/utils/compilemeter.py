"""First-call phase attribution: XLA compile time vs everything else.

The round-3 bench artifacts recorded first-call times from 6 s to 337 s for
the SAME programs across runs, with "tunnel stall, not XLA" asserted but
never instrumented. This meter pins the split: it listens to JAX's internal
compile-phase events (trace, MLIR lowering, backend compile) during a block
and reports their sums, so a bench row can state how much of its first-call
wall time was actually spent compiling versus waiting on the remote-device
transport (or loading the persistent cache: a cache hit reports a near-zero
backend_compile sum).

Usage:
    with CompileMeter() as cm:
        result = first_call()
    cm.report()  # {'trace_s': ..., 'lower_s': ..., 'xla_compile_s': ...}
"""

from collections import defaultdict

# jax._src.monitoring is a private API: a JAX upgrade may move or rename it
# (or the event keys below). Degrade to zero-reporting instead of breaking
# bench.py/bench_table.py at import time.
try:
    from jax._src import monitoring
except ImportError:  # pragma: no cover - depends on the installed jax
    monitoring = None

__all__ = ["CompileMeter"]

_KEYS = {
    "/jax/core/compile/jaxpr_trace_duration": "trace_s",
    "/jax/core/compile/jaxpr_to_mlir_module_duration": "lower_s",
    "/jax/core/compile/backend_compile_duration": "xla_compile_s",
}


class CompileMeter:
    """Collects JAX compile-phase durations inside a `with` block."""

    def __init__(self):
        self._sums = defaultdict(float)
        self._counts = defaultdict(int)
        self._listener = None

    def _on_event(self, key, value, **kw):
        name = _KEYS.get(key)
        if name is not None:
            self._sums[name] += float(value)
            self._counts[name] += 1

    def __enter__(self):
        if monitoring is None:
            return self
        self._listener = self._on_event
        try:
            monitoring.register_event_duration_secs_listener(self._listener)
        except Exception:  # pragma: no cover - renamed private API
            self._listener = None
        return self

    def __exit__(self, *exc):
        if self._listener is not None:
            try:
                monitoring.unregister_event_duration_listener(self._listener)
            except Exception:  # pragma: no cover - already removed/renamed
                pass
            self._listener = None
        return False

    def report(self, wall_s=None):
        """Phase sums (seconds, rounded); with `wall_s`, adds `other_s` =
        wall minus all attributed phases (device transfer, tunnel latency,
        cache (de)serialization, Python)."""
        out = {k: round(self._sums.get(k, 0.0), 2)
               for k in ("trace_s", "lower_s", "xla_compile_s")}
        out["compiles"] = self._counts.get("xla_compile_s", 0)
        if monitoring is None:  # pragma: no cover - depends on installed jax
            out["meter_unavailable"] = True
        if wall_s is not None:
            attributed = sum(self._sums.values())
            out["other_s"] = round(max(0.0, wall_s - attributed), 2)
        return out
