"""Pallas TPU kernels for the solver hot paths."""

from ilqr_planner_tpu.ops.pallas_kernels.riccati import (
    riccati_backward_reference,
    riccati_backward_structured,
)

__all__ = ["riccati_backward_structured", "riccati_backward_reference"]
