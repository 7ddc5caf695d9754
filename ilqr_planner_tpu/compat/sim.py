"""PyLQR.sim: stateful robot wrappers (bindings.cpp:85-216).

`SimulationInterface` carries the reference's mutable state (q, dq, ddq, t;
SimulationInterface.h:117-123) and exposes the same snake_case methods; all
kinematics go through the functional core on the host CPU device.
"""

import jax
import numpy as np

from ilqr_planner_tpu.models.planar import PlanarRobot, planar_fk
from ilqr_planner_tpu.models.robot import Robot, robot_kin
from ilqr_planner_tpu.models.urdf import chain_from_urdf

__all__ = ["SimulationInterface", "KDLRobot", "Robot2D",
           "TransformedSimulationInterface"]


def _cpu():
    return jax.devices("cpu")[0]


class SimulationInterface:
    """Abstraction of a robot (SimulationInterface.h:13-124)."""

    def __init__(self, robot: Robot, q, dq):
        self._robot = robot
        self.q = np.asarray(q, float)
        self.dq = np.asarray(dq, float)
        self.ddq = np.zeros_like(self.q)
        self.t = 0.0
        self._kin_fn = jax.jit(lambda q, dq: robot_kin(self._robot, q, dq))
        self.update_kinematics()

    # -- kinematics ---------------------------------------------------------
    def update_kinematics(self):
        with jax.default_device(_cpu()):
            ks = self._kin_fn(self.q, self.dq)
        self._ks = jax.tree_util.tree_map(np.asarray, ks)

    # -- commands (SimulationInterface.cpp:19-31) ---------------------------
    def send_acc(self, dt, ddq, update_kin=True):
        ddq = np.asarray(ddq, float)
        self.q = self.q + dt * self.dq + dt * dt / 2 * ddq
        self.dq = self.dq + dt * ddq
        self.t += dt
        if update_kin:
            self.update_kinematics()
        self.ddq = ddq

    def send_vel(self, dt, dq, update_kin=True):
        self.dq = np.asarray(dq, float)
        self.send_acc(dt, np.zeros_like(self.q), update_kin)

    def set_conf(self, q, dq, reset_time=True):
        self.q = np.asarray(q, float)
        self.dq = np.asarray(dq, float)
        self.update_kinematics()
        if reset_time:
            self.t = 0.0

    # -- getters ------------------------------------------------------------
    def get_q(self):
        return self.q.copy()

    def get_dq(self):
        return self.dq.copy()

    def get_ee_pos(self):
        return self._ks.x.copy()

    def get_ee_orn(self):
        return self._ks.quat.copy()

    def get_ee_vel(self):
        return self._ks.dx.copy()

    def get_ee_ang_vel(self):
        return self._ks.w.copy()

    def get_ee_ang_vel_quat(self):
        """0.5 E(q)^T w (SimulationInterface.cpp:69-73)."""
        from ilqr_planner_tpu.ops import sd

        return np.asarray(sd.quat_rate(self._ks.quat, self._ks.w))

    def J(self):
        return self._ks.J.copy()

    def Jp(self):
        return self._ks.dJ.copy()

    def Jt(self):
        c = self._robot.nb_car_dim
        return self._ks.J[:c].copy()

    def Jr(self):
        c = self._robot.nb_car_dim
        return self._ks.J[c:].copy()

    def Jtp(self):
        """Time derivative of the translational Jacobian rows
        (SimulationInterface.cpp:41-43, bound at bindings.cpp:93)."""
        c = self._robot.nb_car_dim
        return self._ks.dJ[:c].copy()

    def Jrp(self):
        """Time derivative of the rotational Jacobian rows
        (SimulationInterface.cpp:45-47, bound at bindings.cpp:94)."""
        c = self._robot.nb_car_dim
        return self._ks.dJ[c:].copy()

    def get_dof(self):
        return self._robot.dof

    def get_nb_car_dim(self):
        return self._robot.nb_car_dim

    def get_time(self):
        return self.t

    def set_time(self, t):
        self.t = float(t)

    @property
    def robot(self) -> Robot:
        """The functional robot pytree (TPU-core handle)."""
        return self._robot


class KDLRobot(SimulationInterface):
    """URDF kinematic-chain robot (KDLRobot.cpp:17-70), KDL-free."""

    def __init__(self, urdf, base_frame, tip_frame, q, dq,
                 transform_rpy=(0.0, 0.0, 0.0), transform_xyz=(0.0, 0.0, 0.0),
                 is_path=True):
        chain = chain_from_urdf(urdf, base_frame, tip_frame,
                                transform_rpy=transform_rpy,
                                transform_xyz=transform_xyz, is_path=is_path)
        super().__init__(Robot.from_chain(chain), q, dq)


class Robot2D(SimulationInterface):
    """Planar n-link robot (2DRobot.cpp:13-70)."""

    def __init__(self, lengths, default_q):
        rob = PlanarRobot(lengths=np.asarray(lengths, float))
        super().__init__(Robot.from_planar(rob), default_q,
                         np.zeros_like(np.asarray(default_q, float)))

    def fkine(self, q=None):
        return np.asarray(planar_fk(self._robot.planar,
                                    self.q if q is None else np.asarray(q, float)))


class TransformedSimulationInterface(SimulationInterface):
    """EE quantities expressed in an object frame T
    (TransformedSimulationInterface.cpp:14-103). Supports the deferred
    `subscribe` initialization variant (cpp:20-29)."""

    def __init__(self, r=None, T=None):
        if T is None:  # called as TransformedSimulationInterface(T)
            r, T = None, r
        self.T = np.asarray(T, float)
        self._base = None
        if r is not None:
            self.subscribe(r)

    def subscribe(self, r: SimulationInterface):
        self._base = r
        super().__init__(r.robot.with_frame(self.T), r.q, r.dq)
        self.t = r.t

    def _check(self):
        if self._base is None:
            raise RuntimeError(
                "[TransformedSimulationInterface] Object is not initialized")

    def update_kinematics(self):
        self._check()
        # mirror the wrapped robot's state first (cpp:31-46)
        self.q = self._base.q.copy()
        self.dq = self._base.dq.copy()
        self.t = self._base.t
        super().update_kinematics()

    def send_acc(self, dt, ddq, update_kin=True):
        self._check()
        self._base.send_acc(dt, ddq, update_kin)
        self.update_kinematics()

    def send_vel(self, dt, dq, update_kin=True):
        self._check()
        self._base.send_vel(dt, dq, update_kin)
        self.update_kinematics()

    def set_conf(self, q, dq, reset_time=True):
        self._check()
        self._base.set_conf(q, dq, reset_time)
        self.update_kinematics()
        if reset_time:
            self.t = 0.0

    def set_time(self, t):
        self._check()
        self.t = float(t)
        self._base.set_time(t)
