"""A/B on real TPU: the fleet solver's keypoint-sparse lane-major XLA
backward sweep vs the dense Pallas fused kernel, identical problem shapes.

The Pallas kernel quadratizes at EVERY step (dense J/e arrays); the fleet
backward runs diagonal-only value updates between the (2) keypoint steps.
This probe decides which backward the production batch path uses
(VERDICT r1 item 4).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ilqr_planner_tpu.models import Robot, chain_from_urdf
from ilqr_planner_tpu.ops.pallas_kernels.riccati import riccati_backward_structured
from ilqr_planner_tpu.solvers import fleet
from ilqr_planner_tpu.systems import funcs
from ilqr_planner_tpu.systems.keypoints import PosOrnKeypoint
from ilqr_planner_tpu.systems.spec import make_spec

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
Q0 = np.array([0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
               1.50592777, 0.71771416], np.float32)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
H = 100
n = 7

robot = Robot.from_chain(chain_from_urdf(URDF, "panda_link0", "panda_tip"))
kps = [
    PosOrnKeypoint([0.554, -0.016, 0.383],
                   [0.014, 0.915, 0.402, 0.022],
                   np.diag([1, 1, 1, .1, .1, .1]), 49),
    PosOrnKeypoint([0.554, -0.016, 0.383],
                   [0.014, 0.915, 0.402, 0.022],
                   np.diag([1, 1, 1, .1, .1, .1]), H - 1),
]
qmax = np.ones(7) * np.pi * 10
spec = make_spec("posorn", robot, kps, np.ones(7) * 1e-5, H, 1, dt=0.1,
                 q0=Q0, q_max=qmax, q_min=-qmax)

cc = fleet._Consts(spec)
rng = np.random.default_rng(0)
X = jnp.asarray(rng.normal(size=(H, n, B)).astype(np.float32) * 0.3
                + Q0[None, :, None])
U = jnp.asarray(rng.normal(size=(H - 1, n, B)).astype(np.float32) * 0.1)

print(f"device={jax.devices()[0]} B={B} H={H}", file=sys.stderr)

with jax.default_matmul_precision("float32"):
    fleet_bwd = jax.jit(lambda X, U: fleet._backward(cc, X, U))
    t0 = time.perf_counter()
    Kf, df = jax.block_until_ready(fleet_bwd(X, U))
    print(f"fleet compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # Dense inputs for the Pallas kernel: FK + Jacobian + residual at every
    # step (the work its dense formulation requires).
    def dense_inputs(X, U):
        Xb = jnp.moveaxis(X, -1, 0)                      # [B, H, n]
        flat = Xb.reshape(B * H, n)
        fxs, Js = jax.vmap(lambda x: funcs.fx_jac(spec, x))(flat)
        ks = jnp.tile(jnp.arange(H), B)
        es = jax.vmap(lambda fx, k: funcs.residual(spec, fx, k))(fxs, ks)
        lds, lqs = jax.vmap(lambda x: funcs.limit_terms(spec, x))(flat)
        nq = Js.shape[-2]
        return (Js.reshape(B, H, nq, n), es.reshape(B, H, nq),
                lds.reshape(B, H, n), lqs.reshape(B, H, n),
                jnp.moveaxis(U, -1, 0))

    Rt = np.asarray(spec.Rt, np.float32)
    pl_full = jax.jit(lambda X, U: riccati_backward_structured(
        *dense_inputs(X, U), spec.prec.astype(jnp.float32), Rt,
        float(spec.dt), lane_sublanes=8))
    pl_only = jax.jit(lambda ins: riccati_backward_structured(
        *ins, spec.prec.astype(jnp.float32), Rt, float(spec.dt),
        lane_sublanes=8))

    ins = jax.block_until_ready(jax.jit(dense_inputs)(X, U))
    t0 = time.perf_counter()
    Kp, dp = jax.block_until_ready(pl_full(X, U))
    print(f"pallas(full) compile+run {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    Kfb = jnp.moveaxis(Kf, -1, 0)
    dfb = jnp.moveaxis(df, -1, 0)
    dK = float(jnp.max(jnp.abs(Kp - Kfb)))
    dd = float(jnp.max(jnp.abs(dp - dfb)))

    def timeit(fn, *a, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_fleet = timeit(fleet_bwd, X, U)
    t_pl_full = timeit(pl_full, X, U)
    t_pl_only = timeit(pl_only, ins)

print(f"fleet lane-major XLA backward (kp-sparse): {t_fleet*1e3:8.2f} ms")
print(f"pallas dense kernel + input assembly:      {t_pl_full*1e3:8.2f} ms")
print(f"pallas dense kernel alone:                 {t_pl_only*1e3:8.2f} ms")
print(f"agreement: max|dK|={dK:.2e} max|dd|={dd:.2e}")
print(f"fleet/pallas_full = {t_fleet/t_pl_full:.2f}x "
      f"(>1 means pallas wins end-to-end)")
