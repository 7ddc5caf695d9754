"""URDF -> KinematicChain, parsed host-side at problem-build time.

Replaces the reference's TinyURDFParser + KDL chain construction
(KDLRobot.cpp:44-66): the URDF is parsed once on the host with the standard
library XML parser, fixed joints are folded into the next actuated joint's
origin (or the tip transform), and the reference's "virtual tip" frame —
KDL EulerZYX(rpy[0], rpy[1], rpy[2]) rotation plus xyz translation appended
after the tip link (KDLRobot.cpp:61-66) — is composed into the tip transform.

The output is a pytree of float arrays; nothing here runs under jit.
"""

import xml.etree.ElementTree as ET

import numpy as np

from ilqr_planner_tpu.models.chain import KinematicChain

__all__ = ["parse_urdf", "chain_from_urdf"]

_ACTUATED = ("revolute", "continuous", "prismatic")


def _rpy_mat(r, p, y):
    """URDF fixed-axis rpy: R = Rz(y) Ry(p) Rx(r)."""

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    return rz(y) @ ry(p) @ rx(r)


def _vec(attr, default):
    if attr is None:
        return np.array(default, dtype=float)
    return np.array([float(v) for v in attr.split()], dtype=float)


def parse_urdf(urdf: str, base_frame: str, tip_frame: str, is_path: bool = True):
    """Parse a URDF and extract the joint path base_frame -> tip_frame.

    Returns a list of dicts {type, axis, R, p} in base-to-tip order.
    Raises ValueError when no chain connects the two frames, mirroring the
    reference's error (KDLRobot.cpp:49).
    """
    root = ET.parse(urdf).getroot() if is_path else ET.fromstring(urdf)

    joints = []
    child_to_joint = {}
    for j in root.findall("joint"):
        origin = j.find("origin")
        rpy = _vec(origin.get("rpy") if origin is not None else None, [0, 0, 0])
        xyz = _vec(origin.get("xyz") if origin is not None else None, [0, 0, 0])
        axis_el = j.find("axis")
        axis = _vec(axis_el.get("xyz") if axis_el is not None else None, [1, 0, 0])
        info = {
            "name": j.get("name"),
            "type": j.get("type"),
            "parent": j.find("parent").get("link"),
            "child": j.find("child").get("link"),
            "R": _rpy_mat(*rpy),
            "p": xyz,
            "axis": axis,
        }
        joints.append(info)
        child_to_joint[info["child"]] = info

    # Walk up from tip link to base link.
    path = []
    link = tip_frame
    while link != base_frame:
        j = child_to_joint.get(link)
        if j is None:
            raise ValueError(
                f"Unable to build kinematic chain from {base_frame} to {tip_frame}"
            )
        path.append(j)
        link = j["parent"]
    path.reverse()
    return path


def chain_from_urdf(
    urdf: str,
    base_frame: str,
    tip_frame: str,
    transform_rpy=(0.0, 0.0, 0.0),
    transform_xyz=(0.0, 0.0, 0.0),
    is_path: bool = True,
    dtype=np.float64,
    prefer_native: bool = True,
) -> KinematicChain:
    """Build a KinematicChain, folding fixed joints and the virtual tip frame.

    `transform_rpy`/`transform_xyz` reproduce the reference's appended virtual
    segment: rotation = KDL EulerZYX(rpy[0], rpy[1], rpy[2]) = Rz(rpy[0]) @
    Ry(rpy[1]) @ Rx(rpy[2]) (KDLRobot.cpp:61-66). Defaults are identity
    (KDLRobot.h:33).

    Parsing uses the native C++ extractor (native/src/urdf_chain.cpp) when
    built, falling back to the pure-Python parser; both feed the same
    folding code below.
    """
    path = None
    if prefer_native:
        from ilqr_planner_tpu.models import native

        if native.available():
            path = native.parse_urdf_native(urdf, base_frame, tip_frame,
                                            is_path=is_path)
    if path is None:
        path = parse_urdf(urdf, base_frame, tip_frame, is_path=is_path)

    origin_rot, origin_pos, axes, prismatic = [], [], [], []
    R_acc = np.eye(3)
    p_acc = np.zeros(3)
    for j in path:
        p_acc = p_acc + R_acc @ j["p"]
        R_acc = R_acc @ j["R"]
        if j["type"] in _ACTUATED:
            origin_rot.append(R_acc)
            origin_pos.append(p_acc)
            axes.append(j["axis"])
            prismatic.append(1.0 if j["type"] == "prismatic" else 0.0)
            R_acc = np.eye(3)
            p_acc = np.zeros(3)
        elif j["type"] != "fixed":
            raise ValueError(f"Unsupported joint type {j['type']!r} ({j['name']})")

    # Remaining fixed transforms after the last actuated joint, then the
    # reference's virtual tip frame (EulerZYX = Rz(a) Ry(b) Rx(g)).
    r0, r1, r2 = (float(v) for v in transform_rpy)
    virtual_R = _rpy_mat(r2, r1, r0)  # Rz(r0) Ry(r1) Rx(r2)
    virtual_p = np.array(transform_xyz, dtype=float)
    tip_pos = p_acc + R_acc @ virtual_p
    tip_rot = R_acc @ virtual_R

    if not axes:
        raise ValueError("Chain has no actuated joints")

    import jax
    import jax.numpy as jnp

    # f64 silently becomes f32 when x64 is disabled (production TPU mode)
    dtype = jax.dtypes.canonicalize_dtype(dtype)

    return KinematicChain(
        origin_rot=jnp.asarray(np.stack(origin_rot), dtype=dtype),
        origin_pos=jnp.asarray(np.stack(origin_pos), dtype=dtype),
        axis=jnp.asarray(np.stack(axes), dtype=dtype),
        prismatic=jnp.asarray(np.array(prismatic), dtype=dtype),
        tip_rot=jnp.asarray(tip_rot, dtype=dtype),
        tip_pos=jnp.asarray(tip_pos, dtype=dtype),
    )
