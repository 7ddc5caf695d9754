"""Multi-host runtime: one process per host, SPMD over the global mesh.

The reference is single-process (SURVEY §2: no MPI/NCCL/threads anywhere);
scaling beyond one host here uses jax.distributed + GSPMD. Scenario batches
shard over hosts on the 'dp' axis (DCN between hosts, ICI within a slice);
only metric reductions and convergence votes cross the interconnect.

Typical multi-host launch (same script on every host):

    from ilqr_planner_tpu.parallel import distributed, make_mesh
    distributed.initialize()            # reads cluster env or explicit args
    mesh = make_mesh()                  # global mesh over all devices
    ... solve_batch_sharded(..., mesh=mesh)
"""

from typing import Optional

import jax

__all__ = ["initialize", "is_initialized", "process_summary"]

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with idempotence; on single-process
    environments (no coordinator configured) this is a no-op so the same
    entry script runs everywhere."""
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and num_processes is None:
        import os

        if "JAX_COORDINATOR_ADDRESS" not in os.environ and \
           "COORDINATOR_ADDRESS" not in os.environ:
            _initialized = True  # single-process mode
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_initialized() -> bool:
    """True after init_distributed() has run in this process."""
    return _initialized


def process_summary() -> dict:
    """Host/device topology for logging."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
