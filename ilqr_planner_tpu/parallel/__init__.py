"""Device meshes, sharded batch solves, multi-host runtime."""

from ilqr_planner_tpu.parallel import distributed
from ilqr_planner_tpu.parallel.mesh import (
    batch_specs,
    make_mesh,
    solve_batch,
    solve_batch_al,
    solve_batch_al_staged,
    solve_batch_staged,
    solve_batch_chunked,
    solve_batch_gn,
    solve_batch_sharded,
)

__all__ = [
    "batch_specs",
    "distributed",
    "make_mesh",
    "solve_batch",
    "solve_batch_al",
    "solve_batch_al_staged",
    "solve_batch_staged",
    "solve_batch_chunked",
    "solve_batch_gn",
    "solve_batch_sharded",
]
