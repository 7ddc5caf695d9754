"""PyLQR: drop-in alias for the reference binding module.

Lets reference users keep their import lines verbatim:

    from PyLQR.sim import KDLRobot
    from PyLQR.system import PosOrnPlannerSys, PosOrnKeypoint
    from PyLQR.solver import BatchILQRCP, BatchILQR, ILQRRecursive
    from PyLQR.utils import primitives, PythonCallbackMessage

backed by the TPU-native framework (ilqr_planner_tpu.compat).
"""

from ilqr_planner_tpu.compat import sim, solver, system, utils

__all__ = ["sim", "system", "solver", "utils"]
