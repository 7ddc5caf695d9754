"""Utilities: progress callbacks, record-and-replay serialization."""

from ilqr_planner_tpu.utils.callbacks import CallBackMessage, PrintCallback
from ilqr_planner_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from ilqr_planner_tpu.utils.metrics import MetricsCallback, trace
from ilqr_planner_tpu.utils.serialize import (
    load_csv,
    load_matrix_list,
    save_csv,
    save_matrix_list,
)

__all__ = [
    "CallBackMessage",
    "MetricsCallback",
    "PrintCallback",
    "load_checkpoint",
    "load_csv",
    "load_matrix_list",
    "save_checkpoint",
    "save_csv",
    "save_matrix_list",
    "trace",
]
