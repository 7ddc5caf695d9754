"""Solver progress callbacks.

Preserves the reference's observer API (CallbackMessage.h:12-16 /
PythonCallbackMessage.cpp:14-17): solvers emit one formatted message per
iteration, "Iteration i, Cost: c, alpha= a, time= t". Inside jitted solver
loops the hook is bridged through `jax.debug.callback`, so enabling a
callback does not force the solve off-device.
"""

__all__ = ["CallBackMessage", "PrintCallback"]


class CallBackMessage:
    """Abstract observer; subclass and override notify(msg)."""

    def notify(self, msg: str) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class PrintCallback(CallBackMessage):
    """Prints each message, like PythonCallbackMessage -> py::print."""

    def notify(self, msg: str) -> None:
        print(msg)
