"""Math ops: S^3 manifold, SO(3), control-primitive bases, LQR building blocks."""

from ilqr_planner_tpu.ops import primitives, sd, so3

__all__ = ["sd", "so3", "primitives"]
