"""Native C++ URDF chain extractor: build-on-demand + parity with the
pure-Python parser (both feed the same folding code)."""

import numpy as np
import pytest

from ilqr_planner_tpu.models import native
from ilqr_planner_tpu.models.urdf import chain_from_urdf, parse_urdf

URDF = "/root/reference/pylqr_planner/Tutorials/model.urdf"


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available() and not native.build():
        pytest.skip("native toolchain unavailable")


def test_native_matches_python_parser():
    py = parse_urdf(URDF, "panda_link0", "panda_tip")
    nat = native.parse_urdf_native(URDF, "panda_link0", "panda_tip")
    assert len(py) == len(nat) == 10
    for a, b in zip(py, nat):
        assert (a["type"] == b["type"]
                or (a["type"] == "continuous" and b["type"] == "revolute"))
        np.testing.assert_allclose(a["R"], b["R"], atol=1e-15)
        np.testing.assert_allclose(a["p"], b["p"], atol=1e-15)
        np.testing.assert_allclose(a["axis"], b["axis"], atol=1e-15)


def test_chain_identical_via_both_paths():
    c_native = chain_from_urdf(URDF, "panda_link0", "panda_tip", prefer_native=True)
    c_python = chain_from_urdf(URDF, "panda_link0", "panda_tip", prefer_native=False)
    for name in ("origin_rot", "origin_pos", "axis", "prismatic", "tip_rot", "tip_pos"):
        np.testing.assert_allclose(np.asarray(getattr(c_native, name)),
                                   np.asarray(getattr(c_python, name)), atol=1e-15)


def test_native_error_paths():
    with pytest.raises(ValueError, match="Unable to build kinematic chain"):
        native.parse_urdf_native(URDF, "panda_link0", "no_such_link")
    with pytest.raises(ValueError, match="Unable to read"):
        native.parse_urdf_native("/no/such/file.urdf", "a", "b")


def test_native_from_xml_string():
    xml = """<robot name="r">
      <link name="base"/><link name="l1"/><link name="l2"/>
      <joint name="j1" type="revolute">
        <parent link="base"/><child link="l1"/>
        <origin rpy="0 0 0" xyz="0 0 0.5"/><axis xyz="0 1 0"/>
      </joint>
      <joint name="j2" type="fixed">
        <parent link="l1"/><child link="l2"/>
        <origin xyz="0.1 0 0"/>
      </joint>
    </robot>"""
    nat = native.parse_urdf_native(xml, "base", "l2", is_path=False)
    py = parse_urdf(xml, "base", "l2", is_path=False)
    assert [j["type"] for j in nat] == [j["type"] for j in py] == ["revolute", "fixed"]
    np.testing.assert_allclose(nat[0]["axis"], [0, 1, 0])
    np.testing.assert_allclose(nat[1]["p"], [0.1, 0, 0])
