"""Utilities: progress callbacks, record-and-replay serialization."""

from ilqr_planner_tpu.utils.callbacks import CallBackMessage, PrintCallback
from ilqr_planner_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from ilqr_planner_tpu.utils.metrics import MetricsCallback, trace
from ilqr_planner_tpu.utils.serialize import load_csv, save_csv

__all__ = [
    "CallBackMessage",
    "MetricsCallback",
    "PrintCallback",
    "load_checkpoint",
    "load_csv",
    "save_checkpoint",
    "save_csv",
    "trace",
]
