from ilqr_planner_tpu.compat.sim import *  # noqa: F401,F403
