"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Usage: python _multihost_worker.py <process_id> <num_processes> <port>

Each process federates 4 virtual CPU devices into a global 8-device 'dp'
mesh via jax.distributed, builds globally-sharded scenario arrays, runs
solve_batch_sharded across both processes, and reduces the mean cost with a
cross-process collective. Process 0 prints a MULTIHOST_OK line with the
topology and the globally reduced metric.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    "--xla_backend_optimization_level=0"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ilqr_planner_tpu.models import Robot, chain_from_urdf  # noqa: E402
from ilqr_planner_tpu.parallel import (  # noqa: E402
    distributed, make_mesh, solve_batch_sharded,
)
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint  # noqa: E402
from ilqr_planner_tpu.systems.spec import make_spec  # noqa: E402

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
Q0 = np.array([0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
               1.50592777, 0.71771416])
T1 = ([0.554121212377707, -0.01575049935289518, 0.38295604872511507],
      [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
       0.022333898196169735])
T2 = ([0.254121212377707, -0.07575049935289518, 0.13170744424127526],
      [0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
       0.00011933313484481926])


def main():
    distributed.initialize(f"127.0.0.1:{port}", nproc, pid)
    info = distributed.process_summary()
    assert info["process_count"] == nproc, info
    assert info["global_devices"] == 4 * nproc, info

    robot = Robot.from_chain(
        chain_from_urdf(URDF, "panda_link0", "panda_tip",
                        dtype=np.dtype(np.float32))
    )
    kps = [PosOrnKeypoint(*T1, np.diag([1, 1, 1, .1, .1, .1]), 9),
           PosOrnKeypoint(*T2, np.diag([1, 1, 1, .1, .1, .1]), 19)]
    spec = make_spec("posorn", robot, kps, np.ones(7) * 1e-5, 20, 1, dt=0.1,
                     q0=Q0, dtype=np.float32)

    mesh = make_mesh()  # 1-D 'dp' mesh over all 8 global devices
    B = 16
    rng = np.random.default_rng(0)  # same seed everywhere: same global data
    q0s = (Q0[None, :] + 0.02 * rng.normal(size=(B, 7))).astype(np.float32)
    U0s_np = np.zeros((B, 19, 7), np.float32)

    sh = NamedSharding(mesh, P("dp"))

    def gshard(a):
        """Globally-sharded array from identical per-process host data."""
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    overrides = {"q0": gshard(q0s), "x0": gshard(q0s)}
    U0s = gshard(U0s_np)

    res = solve_batch_sharded(spec, overrides, U0s, 10, mesh=mesh)

    # Cross-process collective: global mean of the dp-sharded costs (the
    # jit-inserted reduction crosses the process boundary).
    mean_cost = jax.jit(jnp.mean)(res.cost)
    local = [np.asarray(s.data) for s in res.cost.addressable_shards]
    local_costs = np.concatenate(local)
    assert local_costs.shape[0] == B // nproc, local_costs.shape
    assert np.all(np.isfinite(local_costs))
    assert float(np.max(local_costs)) < 1e-3, local_costs

    print(f"MULTIHOST_OK pid={pid}/{nproc} global_devices="
          f"{info['global_devices']} local_devices={info['local_devices']} "
          f"mean_cost={float(mean_cost):.3e} "
          f"local_max_cost={float(np.max(local_costs)):.3e}", flush=True)


if __name__ == "__main__":
    main()
