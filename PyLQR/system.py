from ilqr_planner_tpu.compat.system import *  # noqa: F401,F403
