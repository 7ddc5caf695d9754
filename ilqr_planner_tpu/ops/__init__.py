"""Math ops: S^3 manifold, SO(3), control-primitive bases, LQR building blocks."""

from ilqr_planner_tpu.ops import kinutils, primitives, sd, so3
from ilqr_planner_tpu.ops.kinutils import jac_pseudo_inverse

__all__ = ["sd", "so3", "primitives", "kinutils", "jac_pseudo_inverse"]
