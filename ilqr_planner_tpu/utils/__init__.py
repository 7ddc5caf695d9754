"""Utilities: progress callbacks, record-and-replay serialization."""

from ilqr_planner_tpu.utils.callbacks import CallBackMessage, PrintCallback
from ilqr_planner_tpu.utils.serialize import load_csv, save_csv

__all__ = ["CallBackMessage", "PrintCallback", "load_csv", "save_csv"]
