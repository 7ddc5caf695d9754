"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Oracle/parity tests run in float64 on CPU (the reference is double-precision
Eigen); multi-device sharding tests use the 8 virtual CPU devices. Env vars
must be set before jax is imported anywhere.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel), which would route every eager test op through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# This environment's XLA CPU build heap-corrupts ("free(): invalid pointer",
# "corrupted size vs. prev_size") while OPTIMIZING some float64 scan+linalg
# programs — reproducible with pure jax (no project code), values/shape
# dependent, f32-clean. Optimization level 0 sidesteps the buggy pass; the
# oracle tests trade some runtime for correct, crash-free compilation.
# Residual risk: the corruption is cumulative and nondeterministic — a
# single process compiling the whole suite (hundreds of programs) can still
# abort ("Fatal Python error: Aborted" inside backend_compile) even at opt
# level 0, on a program that compiles fine in isolation. Mitigation:
# pyproject addopts runs the suite under 4 pytest-xdist workers, bounding
# per-process compile counts (observed: 2 aborts in 2 single-process full
# runs; 0 across xdist runs).
if "xla_backend_optimization_level" not in _flags:
    _flags = (_flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# The session's jax build pins jax_platforms to "axon,cpu" (remote TPU tunnel
# first) regardless of JAX_PLATFORMS, so force the config directly — tests
# must run on the local CPU backend (f64 oracle parity + virtual 8-dev mesh).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def panda_chain():
    """The tutorial Panda chain: panda_link0 -> panda_tip incl. fixed joints."""
    from ilqr_planner_tpu.models import chain_from_urdf

    return chain_from_urdf(
        "/root/reference/pylqr_planner/Tutorials/model.urdf", "panda_link0", "panda_tip"
    )


@pytest.fixture(scope="session")
def panda_q0():
    """Initial configuration from POS_ORN_SYS.ipynb cell 4."""
    return np.array(
        [0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303, 1.50592777, 0.71771416]
    )
