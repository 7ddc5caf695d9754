"""PyLQR.utils: S^3 math, primitive bases, callbacks (bindings.cpp:872-907)."""

import types

import numpy as np

from ilqr_planner_tpu.ops import primitives as _prim
from ilqr_planner_tpu.ops import sd as _sd
from ilqr_planner_tpu.utils.callbacks import CallBackMessage

__all__ = ["Sd", "primitives", "CallBackMessage", "PythonCallbackMessage"]


class PythonCallbackMessage(CallBackMessage):
    """Prints solver progress, like the reference's py::print bridge
    (PythonCallbackMessage.cpp:14-17)."""

    def notify(self, msg: str) -> None:
        print(msg)


# --- PyLQR.utils.Sd (bindings.cpp:891-899) --------------------------------
Sd = types.SimpleNamespace(
    logMap=lambda base, y: np.asarray(_sd.log_map(np.asarray(base, float),
                                                  np.asarray(y, float))),
    expMap=lambda base, u: np.asarray(_sd.exp_map(np.asarray(base, float),
                                                  np.asarray(u, float))),
    distance=lambda x, y: float(_sd.distance(np.asarray(x, float),
                                             np.asarray(y, float))),
    transport=lambda v, b1, b2: np.asarray(
        _sd.transport(np.asarray(v, float), np.asarray(b1, float),
                      np.asarray(b2, float))),
    dquat_to_w_jac=lambda q: np.asarray(_sd.dquat_to_dx_jac(np.asarray(q, float))),
)

# --- PyLQR.utils.primitives (bindings.cpp:901-907) ------------------------
primitives = types.SimpleNamespace(
    # The reference binds the RBF basis with capital RBF (bindings.cpp:903);
    # the lowercase alias is kept for symmetry with the other bases.
    build_psi_RBF=_prim.build_psi_rbf,
    build_psi_rbf=_prim.build_psi_rbf,
    build_psi_bernstein=_prim.build_psi_bernstein,
    build_psi_unitstep=_prim.build_psi_unitstep,
    build_psi_sawtooth=_prim.build_psi_sawtooth,
    build_psi_linear=_prim.build_psi_linear,
)
