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


def test_scene_options_embedded(tmp_path):
    """Camera/light/background/floor/arrow controls land in the scene JSON
    (reference set_camera!/set_light!/set_background!/set_floor!/set_arrow!,
    src/visuals/set.jl:18-159)."""
    mech = models.get_mechanism("block")
    xs, qs = _frames(mech, T=2)
    sc = visuals.scene_options(
        camera_position=(3, -1, 2), camera_lookat=(0, 0, 0.5), camera_fov=40,
        light_direction=(1, 1, 4), light_intensity=0.8, ambient=0.9,
        background=(0.1, 0.1, 0.15), floor_size=6, floor_color=(0.2, 0.2, 0.25),
        grid=False,
        arrows=[{"body": 0, "dir": (0, 0, 1), "origin": (0, 0, 0.3),
                 "length": 0.4, "color": (1.0, 0.8, 0.2)},
                {"body": None, "dir": (1, 0, 0)}],
    )
    path = visuals.visualize(mech, xs, qs, path=str(tmp_path / "sc.html"),
                             scene=sc)
    data = _embedded_data(open(path).read())
    s = data["scene"]
    assert s["camera_position"] == [3.0, -1.0, 2.0]
    assert s["camera_fov"] == 40.0
    assert s["grid"] is False
    assert len(s["arrows"]) == 2
    assert s["arrows"][0]["body"] == 0
    assert "body" not in s["arrows"][1]  # world-pinned arrow (None dropped)


def test_export_video_gif(tmp_path):
    """Headless video export (reference convert.jl FFMPEG path, rebuilt
    matplotlib→GIF): a 3-frame block trajectory renders to an animated GIF."""
    import os

    mech = models.get_mechanism("block")
    xs, qs = _frames(mech, T=3)
    # animate a drop so frames differ
    xs = xs.copy()
    xs[:, 0, 2] = [1.0, 0.6, 0.3]
    out = visuals.export_video(
        mech, xs, qs, path=str(tmp_path / "drop.gif"), width=160, height=120
    )
    assert out.endswith(".gif") and os.path.getsize(out) > 1000
    from PIL import Image

    im = Image.open(out)
    im.seek(2)  # third frame exists → animated
