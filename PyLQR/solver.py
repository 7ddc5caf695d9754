from ilqr_planner_tpu.compat.solver import *  # noqa: F401,F403
