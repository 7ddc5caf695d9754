"""Shared constants + helpers for the tutorial scripts.

Each script in this directory is a runnable twin of one reference notebook
(reference: pylqr_planner/Tutorials/*.ipynb) written against the PyLQR
drop-in API (backed by the TPU-native framework). Plotting is optional:
set ILQR_TUTORIAL_PLOT=1 to save PNGs next to the script.
"""

import os

# Default to the CPU backend in float64 (reference precision); the replay
# loops below are eager, which would be slow over a remote-TPU tunnel.
# Set ILQR_TUTORIAL_TPU=1 to run on the TPU backend instead.
if os.environ.get("ILQR_TUTORIAL_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
PATH_TO_URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"
BASE_FRAME = "panda_link0"
TIP_FRAME = "panda_tip"
DOF = 7

# Initial joint configuration used across the tutorials (POS_ORN_SYS cell 4).
Q0 = [0.62991112, -0.2329776, -0.01423721, -1.70254115, 0.06251303,
      1.50592777, 0.71771416]
DQ0 = [0.0] * DOF

# The two canonical pos+quaternion via-points (POS_ORN_SYS cell 6).
TARGET1_POS = np.array([0.554121212377707, -0.01575049935289518,
                        0.38295604872511507])
TARGET1_ORN = np.array([0.014042440828406944, 0.915047647731553,
                        0.4024820607528928, 0.022333898196169735])
TARGET2_POS = np.array([0.254121212377707, -0.07575049935289518,
                        0.13170744424127526])
TARGET2_ORN = np.array([0.029927010072216945, 0.9121514607332729,
                        0.4087591864532181, 0.00011933313484481926])

# Panda joint limits as used in the joint-space notebooks (cell 4).
PANDA_QMAX = np.array([2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525,
                       2.8973])
PANDA_QMIN = np.array([-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175,
                       -2.8973])

# Object frames used by the MULTI_SYS / OBJ_FRAME notebooks (cell 8):
# 4x4 homogeneous transforms from w-first quaternion + translation.


def _quat_to_mat(q):
    """Rotation matrix from a w-first unit quaternion."""
    w, x, y, z = np.asarray(q, float)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def frame(quat_wxyz, pos):
    T = np.eye(4)
    T[:3, :3] = _quat_to_mat(quat_wxyz)
    T[:3, 3] = np.asarray(pos, float)
    return T


OBJ1_FRAME = frame([0.63758403393523, 0.2994657314658187, 0.6042309402208079,
                    -0.37244039285286973], [0.62, 0.05, 0.34])
OBJ2_FRAME = frame([-0.03647984, 0.94060485, 0.33742794, 0.00860923],
                   [0.32, 0.05, 0.54])


def maybe_plot(name, curves, scatters=()):
    """Save a PNG of (label, array) curves if ILQR_TUTORIAL_PLOT=1."""
    if os.environ.get("ILQR_TUTORIAL_PLOT") != "1":
        return
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    for label, y in curves:
        plt.plot(np.asarray(y), label=label)
    for t, v in scatters:
        plt.scatter(t, v, c="black")
    plt.legend()
    plt.title(name)
    out = os.path.join(HERE, f"{name}.png")
    plt.savefig(out)
    print(f"saved {out}")


def report_keypoint_error(name, fX, kp_time, target_pos):
    err = float(np.linalg.norm(np.asarray(fX)[kp_time, :3] - target_pos))
    print(f"{name}: |ee - target| at k={kp_time}: {err:.2e} m")
    return err
