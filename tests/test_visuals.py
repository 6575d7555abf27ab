"""Visualizer smoke tests (reference test/visuals.jl: builds a Visualizer
headless for a representative mechanism and asserts it constructs).  Here:
the HTML export embeds the scene JSON (shapes, contact spheres, frames)
without needing a browser."""

import json
import re

import numpy as np

from dojo_tpu import models, visuals


def _frames(mech, T=3):
    st = mech.zero_state()
    xs = np.repeat(np.asarray(st.x)[None], T, axis=0)
    qs = np.repeat(np.asarray(st.q)[None], T, axis=0)
    return xs, qs


def _embedded_data(html):
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "scene JSON not embedded"
    return json.loads(m.group(1))


def test_visualize_block_contact_spheres(tmp_path):
    mech = models.get_mechanism("block")
    xs, qs = _frames(mech)
    path = visuals.visualize(mech, xs, qs, path=str(tmp_path / "b.html"))
    data = _embedded_data(open(path).read())
    assert len(data["x"]) == 3
    assert len(data["shapes"]) == mech.topo.nb
    # block has 8 corner contacts drawn as spheres (visualizer.jl:176-216)
    assert len(data["contacts"]) == mech.topo.nc > 0
    assert all(c["r"] > 0 for c in data["contacts"])


def test_visualize_shape_kinds(tmp_path):
    """Every shape constructor renders to a typed JSON entry."""
    mech = models.get_mechanism("pendulum")
    xs, qs = _frames(mech, T=2)
    path = visuals.visualize(
        mech, xs, qs, path=str(tmp_path / "p.html"), contact_spheres=False
    )
    data = _embedded_data(open(path).read())
    kinds = {s["type"] for s in data["shapes"]}
    assert kinds <= {"box", "cylinder", "capsule", "sphere", "pyramid",
                     "mesh", "combined", "marker"}
    assert data["contacts"] == []


def test_visualize_stride(tmp_path):
    mech = models.get_mechanism("sphere")
    xs, qs = _frames(mech, T=6)
    path = visuals.visualize(
        mech, xs, qs, path=str(tmp_path / "s.html"), stride=2
    )
    data = _embedded_data(open(path).read())
    assert len(data["x"]) == 3
    assert data["h"] == float(mech.params.timestep) * 2
