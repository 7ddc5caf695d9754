"""PyLQR-compatible API: the reference's Python binding surface, re-hosted.

The reference ships a pybind11 module `PyLQR` with submodules sim / system /
solver / utils (bindings.cpp:48-908). This package reproduces that surface —
same class names, constructor signatures, and snake_case methods — as thin
stateful wrappers over the functional TPU core, so reference users (and the
13 tutorial notebooks) can switch with an import change; a top-level `PyLQR`
alias package makes even the import line identical.

The wrappers are host-side conveniences: robot objects carry mutable
(q, dq, t) state like the reference's SimulationInterface, while solve()
calls delegate to the fully-jitted functional solvers.
"""

from ilqr_planner_tpu.compat import sim, solver, system, utils

__all__ = ["sim", "system", "solver", "utils"]
