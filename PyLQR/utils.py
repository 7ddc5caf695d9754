from ilqr_planner_tpu.compat.utils import *  # noqa: F401,F403
from ilqr_planner_tpu.compat.utils import Sd, primitives  # noqa: F401
