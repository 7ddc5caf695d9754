"""TPU-native scenario fleet: hundreds of concurrent solves on one chip,
sharded across a device mesh when more chips are available.

This is the capability the reference cannot express (one problem per
process): perturbed initial configurations solve concurrently via vmap, and
`solve_batch_sharded` spreads the fleet over a `Mesh` with shard_map.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.parallel import make_mesh, solve_batch, solve_batch_sharded
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
B, HORIZON, DOF = 768, 100, 7

dtype = jnp.float32
robot = Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip",
                                         dtype=np.float32))
q0 = np.array([0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
               1.50592777, 0.71771416])
keypoints = [
    PosOrnKeypoint([0.554121212377707, -0.01575049935289518, 0.38295604872511507],
                   [0.014042440828406944, 0.915047647731553, 0.4024820607528928,
                    0.022333898196169735],
                   np.diag([1, 1, 1, .1, .1, .1]), HORIZON // 2 - 1),
    PosOrnKeypoint([0.254121212377707, -0.07575049935289518, 0.13170744424127526],
                   [0.029927010072216945, 0.9121514607332729, 0.4087591864532181,
                    0.00011933313484481926],
                   np.diag([1, 1, 1, .1, .1, .1]), HORIZON - 1),
]
spec = make_spec("posorn", robot, keypoints, np.ones(DOF) * 1e-5, HORIZON, 1,
                 dt=0.1, q0=q0, dtype=dtype)

rng = np.random.default_rng(0)
q0s = (q0[None, :] + 0.05 * rng.normal(size=(B, DOF))).astype(np.float32)
overrides = {"q0": jnp.asarray(q0s), "x0": jnp.asarray(q0s)}
U0s = jnp.zeros((B, HORIZON - 1, DOF), dtype)

print(f"devices: {jax.devices()}")
res = solve_batch(spec, overrides, U0s, 10)  # compile
jax.block_until_ready(res.cost)
t0 = time.time()
res = solve_batch(spec, overrides, U0s, 10)
jax.block_until_ready(res.cost)
dt_s = time.time() - t0
costs = np.asarray(res.cost)
print(f"{B} concurrent solves in {dt_s * 1e3:.2f} ms "
      f"({B / dt_s:,.0f} solves/s on one chip)")
print(f"median cost {np.median(costs):.2e}, "
      f"{np.mean(costs < 1e-4):.0%} converged below 1e-4")

if jax.device_count() > 1:
    mesh = make_mesh()
    res = solve_batch_sharded(spec, overrides, U0s, 10, mesh=mesh)
    print(f"sharded over {jax.device_count()} devices: "
          f"median {np.median(np.asarray(res.cost)):.2e}")

# Tunnel-safe per-iteration progress (round 5): host callbacks hang over
# remote-device transports, so record=True returns the callback channel's
# information — per-lane (cost, alpha) per executed iteration — as device
# buffers with the result.
res = solve_batch(spec, overrides, U0s, 10, record=True)
pc = np.asarray(res.progress["cost"])          # [B, nb_iter], NaN past stop
it0 = int(res.iterations[0])
print(f"lane 0 converged in {it0} iterations; per-iteration costs "
      f"{np.array2string(pc[0, :it0], precision=2)}")
