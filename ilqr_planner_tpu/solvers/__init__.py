"""Solvers: recursive iLQR, AL-iLQR, batch iLQR (+ control primitives), LQT.

Each module mirrors one reference solver class (solver/ directory of the
reference) as a functional, fully-jitted TPU computation:

  ilqr     ILQRRecursive  (ILQRRecursive.cpp:19-183)
  al_ilqr  AL_ILQR        (AL-ILQR.cpp:19-232)
  batch    BatchILQR/CP   (BatchILQR.cpp:22-173, BatchILQRCP.cpp:21-176)
  lqt      LQT            (lqt.cpp:16-128)
"""

from ilqr_planner_tpu.solvers import al_ilqr, batch, ilqr, lqt
from ilqr_planner_tpu.solvers.al_ilqr import ALILQRResult, Constraints
from ilqr_planner_tpu.solvers.batch import BatchResult
from ilqr_planner_tpu.solvers.ilqr import ILQRResult
from ilqr_planner_tpu.solvers.lqt import LQT

__all__ = [
    "al_ilqr",
    "batch",
    "ilqr",
    "lqt",
    "ALILQRResult",
    "BatchResult",
    "Constraints",
    "ILQRResult",
    "LQT",
]
