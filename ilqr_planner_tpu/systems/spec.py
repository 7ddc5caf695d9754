"""Problem specification: the OCP as a dense pytree of arrays.

The reference's `System` object graph (System.h:28-194 + five concrete
systems) becomes one `Spec` dataclass: keypoints are scattered into dense
per-timestep arrays (targets `mu[H, nt]`, precisions `prec[H, nQ, nQ]`,
presence mask `kp_mask[H]`) at build time on the host, so every solver step
is uniform, branchless, and batchable — the sparse keypoint structure costs
nothing because absent steps carry zero precision and a zero mask.

System kinds (static dispatch string -> reference class):
  'posorn'       PosOrnPlannerSys         (PosOrnPlannerSys.cpp:18-143)
  'posorn_time'  PosOrnTimePlannerSys     (PosOrnTimePlannerSys.cpp:17-189)
  'joint'        JointSpacePlannerSys     (JointSpacePlannerSys.cpp:18-121)
  'joint_time'   JointSpaceTimePlannerSys (JointSpaceTimePlannerSys.cpp:17-158)
  'point'        position-only extension (planar / cartesian tracking)
  'sequential'   SequentialSystem         (SequentialSystem.cpp:13-278)

State layout x = [q] or [q, dq], with a trailing continuous-time component t
for *_time kinds; control u = dq or ddq, with a trailing sqrt(dt) component
for *_time kinds (PosOrnTimePlannerSys.cpp:154-155).
"""

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from ilqr_planner_tpu.models.robot import Robot

__all__ = ["Spec", "make_spec", "sequential_spec"]


@struct.dataclass
class Spec:
    """Dense OCP description. Static (non-pytree) fields fix the trace shape;
    array fields may be batched by vmap.

    mu rows use the *forward-map* layout of each kind (e.g. [p, quat, dp,
    dquat, (t)] for posorn) — the layout `diff()` consumes, not the
    reference's getState() storage order (see keypoints.py docstring).
    """

    kind: str = struct.field(pytree_node=False)
    nb_deriv: int = struct.field(pytree_node=False)
    horizon: int = struct.field(pytree_node=False)
    limits_set: bool = struct.field(pytree_node=False)

    robot: Optional[Robot] = None
    subs: Tuple["Spec", ...] = ()

    dt: Optional[jnp.ndarray] = None          # fixed step (non-time kinds)
    mu: Optional[jnp.ndarray] = None          # [H, nt]
    prec: Optional[jnp.ndarray] = None        # [H, nQ, nQ]
    kp_mask: Optional[jnp.ndarray] = None     # [H] 0/1
    pos_radius: Optional[jnp.ndarray] = None  # [H] dead-zone radius (posorn)
    orn_thresh: Optional[jnp.ndarray] = None  # [H, 3] per-axis dead zones
    Rt: Optional[jnp.ndarray] = None          # [nu] control penalty diagonal
    state_min: Optional[jnp.ndarray] = None   # [nx]
    state_max: Optional[jnp.ndarray] = None   # [nx]
    limit_weight: Optional[jnp.ndarray] = None  # [nx] 0/1 mask (System.cpp:49-60)
    penalty: Optional[jnp.ndarray] = None     # scalar, 1 when limits set (System.cpp:40)
    x0: Optional[jnp.ndarray] = None          # [nx]
    q0: Optional[jnp.ndarray] = None          # [dof]
    dq0: Optional[jnp.ndarray] = None         # [dof]

    # ---- static dims -------------------------------------------------------
    @property
    def dof(self) -> int:
        return (self.subs[0] if self.kind == "sequential" else self).q0.shape[-1]

    @property
    def time_optimal(self) -> bool:
        k = self.subs[0].kind if self.kind == "sequential" else self.kind
        return k.endswith("_time")

    @property
    def nx(self) -> int:
        if self.kind == "sequential":
            return self.subs[0].nx
        return self.x0.shape[-1]

    @property
    def nu(self) -> int:
        return self.Rt.shape[-1]

    @property
    def nt(self) -> int:
        if self.kind == "sequential":
            return sum(s.nt for s in self.subs)
        return self.mu.shape[-1]

    @property
    def nq_var(self) -> int:
        """Residual dimension (reference nb_Q_var, e.g. PosOrnPlannerSys.cpp:77)."""
        if self.kind == "sequential":
            return sum(s.nq_var for s in self.subs)
        return self.prec.shape[-1]


def _limit_arrays(dof, nb_deriv, q_max, q_min, dq_max, dq_min, time_axis, dtype):
    """Build state_min/max and the limit weight mask (System.cpp:44-61), with
    the *_time kinds' zero-padded, zero-weighted time slot
    (PosOrnTimePlannerSys.cpp:72-82)."""
    limits_set = q_max is not None
    nx = dof * nb_deriv + (1 if time_axis else 0)
    if not limits_set:
        zeros = np.zeros(nx)
        return False, zeros, zeros, np.zeros(nx), 0.0
    q_max = np.asarray(q_max, float)
    q_min = np.asarray(q_min, float)
    weight = np.ones(dof * nb_deriv)
    if nb_deriv == 1:
        smax, smin = q_max, q_min
    else:
        if dq_max is None:
            dq_max = np.zeros(dof)
            dq_min = np.zeros(dof)
        dq_max = np.asarray(dq_max, float)
        dq_min = np.asarray(dq_min, float)
        smax = np.concatenate([q_max, dq_max])
        smin = np.concatenate([q_min, dq_min])
        if np.allclose(dq_max, dq_min):
            weight[dof:] = 0.0  # velocity block masked out (System.cpp:58-60)
    if time_axis:
        smax = np.concatenate([smax, [0.0]])
        smin = np.concatenate([smin, [0.0]])
        weight = np.concatenate([weight, [0.0]])
    return True, smax.astype(dtype), smin.astype(dtype), weight.astype(dtype), 1.0


_KIND_CHECK = {
    "posorn": ("POS_ORN",),
    "posorn_time": ("POS_ORN_TIME",),
    "joint": ("JNT",),
    "joint_time": ("JNT_TIME",),
    "point": ("POINT",),
}


def _target_dim(kind: str, nb_deriv: int, car_dim: int) -> int:
    if kind == "posorn":
        return (car_dim + 4) * nb_deriv
    if kind == "posorn_time":
        return (car_dim + 4) * nb_deriv + 1
    if kind == "joint":
        return None  # dof * nb_deriv, filled by caller
    if kind == "joint_time":
        return None
    if kind == "point":
        return car_dim * nb_deriv
    raise ValueError(kind)


def make_spec(
    kind: str,
    robot: Robot,
    keypoints,
    Rt_diag,
    horizon: int,
    nb_deriv: int,
    dt: float = None,
    q0=None,
    dq0=None,
    q_max=None,
    q_min=None,
    dq_max=None,
    dq_min=None,
    dtype=jnp.float64,
) -> Spec:
    """Build a dense Spec for one system kind.

    Mirrors the reference constructors: keypoint tag/order validation
    (System.cpp:363-372), limit setup (System.cpp:44-61), initial state from
    (q0, dq0) (PosOrnPlannerSys.cpp:54-78). Raises ValueError on wrong tags
    or keypoint order, like the reference's runtime_error.
    """
    if kind not in _KIND_CHECK:
        raise ValueError(f"unknown system kind {kind!r}")
    for kp in keypoints:
        if kp.TAG not in _KIND_CHECK[kind]:
            raise ValueError(f"[{kind}] Wrong keypoint type: got {kp.TAG}")
        if kp.order != nb_deriv:
            raise ValueError(
                f"[{kind}] Wrong keypoint order (nb_deriv): expecting {nb_deriv} got {kp.order}"
            )
    import jax

    dtype = jax.dtypes.canonicalize_dtype(dtype)
    time_axis = kind.endswith("_time")
    if not time_axis and dt is None:
        raise ValueError("dt is required for non-time-optimal systems")
    dof = robot.dof
    q0 = np.zeros(dof) if q0 is None else np.asarray(q0, float)
    dq0 = np.zeros(dof) if dq0 is None else np.asarray(dq0, float)

    car = robot.nb_car_dim
    if kind in ("joint", "joint_time"):
        nt = dof * nb_deriv + (1 if time_axis else 0)
    else:
        nt = _target_dim(kind, nb_deriv, car)
    # Residual dim: quaternion (4) -> tangent (3) per derivative order
    # (nb_Q_var = nb_target_var - nb_deriv for posorn kinds,
    # PosOrnPlannerSys.cpp:77; equal otherwise, JointSpacePlannerSys.cpp:74).
    nq = nt - nb_deriv if kind.startswith("posorn") else nt

    np_dtype = np.dtype(jnp.dtype(dtype).name)
    H = horizon
    mu = np.zeros((H, nt), dtype=np_dtype)
    prec = np.zeros((H, nq, nq), dtype=np_dtype)
    kp_mask = np.zeros(H, dtype=np_dtype)
    pos_radius = np.zeros(H, dtype=np_dtype)
    orn_thresh = np.zeros((H, 3), dtype=np_dtype)
    for kp in keypoints:
        k = kp.timestep
        if not (0 <= k < H):
            raise ValueError(f"keypoint timestep {k} outside horizon {H}")
        mu[k] = kp.fx_state()
        prec[k] = kp.precision
        kp_mask[k] = 1.0
        if hasattr(kp, "pos_radius"):
            pos_radius[k] = kp.pos_radius
            orn_thresh[k] = kp.orn_thresh

    limits_set, smax, smin, weight, penalty = _limit_arrays(
        dof, nb_deriv, q_max, q_min, dq_max, dq_min, time_axis, np_dtype
    )

    x0 = [q0] if nb_deriv == 1 else [q0, dq0]
    if time_axis:
        x0.append([0.0])
    x0 = np.concatenate(x0).astype(np_dtype)

    return Spec(
        kind=kind,
        nb_deriv=nb_deriv,
        horizon=H,
        limits_set=limits_set,
        robot=robot,
        dt=jnp.asarray(0.0 if dt is None else dt, dtype=dtype),
        mu=jnp.asarray(mu),
        prec=jnp.asarray(prec),
        kp_mask=jnp.asarray(kp_mask),
        pos_radius=jnp.asarray(pos_radius),
        orn_thresh=jnp.asarray(orn_thresh),
        Rt=jnp.asarray(np.asarray(Rt_diag, float), dtype=dtype),
        state_min=jnp.asarray(smin, dtype=dtype),
        state_max=jnp.asarray(smax, dtype=dtype),
        limit_weight=jnp.asarray(weight, dtype=dtype),
        penalty=jnp.asarray(penalty, dtype=dtype),
        x0=jnp.asarray(x0),
        q0=jnp.asarray(q0, dtype=dtype),
        dq0=jnp.asarray(dq0, dtype=dtype),
    )


def sequential_spec(subs: Tuple[Spec, ...], Rt_diag, dtype=jnp.float64) -> Spec:
    """Compose subsystems sharing state/control space with concatenated
    target spaces (SequentialSystem.cpp:21-76).

    Validates equal nb_state/ctrl/horizon/nbDeriv/initState like the
    reference (SequentialSystem.cpp:34-58). Dynamics follow subsystem 0;
    per-subsystem costs (including each sub's own control penalty and joint
    limits) are summed, while the top-level Rt drives the solver's cost_u /
    cost_uu terms (the reference inherits System::cost_u with the top-level
    R, System.cpp:274-284).
    """
    import jax

    dtype = jax.dtypes.canonicalize_dtype(dtype)
    s0 = subs[0]
    for s in subs[1:]:
        if s.nx != s0.nx:
            raise ValueError("All the systems do not have the same number of state variables")
        if s.nu != s0.nu:
            raise ValueError("All the systems do not have the same number of control variables")
        if s.horizon != s0.horizon:
            raise ValueError("All the systems do not have the same horizon")
        if s.nb_deriv != s0.nb_deriv:
            raise ValueError("All the systems do not have the same number of derivatives")
        if not np.allclose(np.asarray(s.x0), np.asarray(s0.x0)):
            raise ValueError("All the systems do not have the same initState")
    return Spec(
        kind="sequential",
        nb_deriv=s0.nb_deriv,
        horizon=s0.horizon,
        limits_set=False,  # SequentialSystem.cpp:17: top level has no own limits
        subs=tuple(subs),
        Rt=jnp.asarray(np.asarray(Rt_diag, float), dtype=dtype),
        x0=s0.x0,
        q0=s0.q0,
        dq0=s0.dq0,
        dt=s0.dt,
        penalty=jnp.asarray(0.0, dtype=dtype),
    )


def keypoint_indexes(keypoints) -> list:
    """Sorted keypoint timesteps (System.cpp:88-94 getKpIndexes after the
    sort at System.cpp:82)."""
    return sorted(kp.timestep for kp in keypoints)
