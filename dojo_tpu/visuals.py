"""Trajectory visualization: standalone HTML/three.js export.

Reference: src/visuals/ (MeshCat scene building, visualizer.jl:14-128).
TPU-native replacement: a dependency-free HTML file with the trajectory
embedded as JSON and rendered by three.js (CDN), with orbit controls,
floor grid, playback scrubber.  Works from any browser; no server, no
Julia/MeshCat stack.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _load_obj(path, scale=None):
    """Minimal OBJ loader: vertex positions + fan-triangulated faces.
    Returns (flat positions [x0,y0,z0,x1,...], flat triangle indices) for a
    three.js BufferGeometry (normals recomputed client-side).  Reference
    analog: convert_shape(Mesh) → MeshFileGeometry (visualizer.jl:130-216)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                verts.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("f "):
                idx = []
                for tok in line.split()[1:]:
                    i = int(tok.split("/")[0])
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):
                    faces.extend((idx[0], idx[k], idx[k + 1]))
    v = np.asarray(verts, dtype=np.float64)
    if scale is not None:
        v = v * np.asarray(scale, dtype=np.float64)
    return np.round(v, 5).ravel().tolist(), faces

_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>dojo_tpu — {title}</title>
<style>
 body {{ margin:0; overflow:hidden; font-family:system-ui; }}
 #hud {{ position:absolute; top:8px; left:8px; color:#eee; background:#0009;
        padding:6px 10px; border-radius:6px; font-size:13px; }}
 #bar {{ position:absolute; bottom:10px; left:5%; width:90%; }}
</style></head>
<body>
<div id="hud">{title} — space: play/pause, drag: orbit</div>
<input id="bar" type="range" min="0" max="{tmax}" value="0"/>
<script type="importmap">{{"imports":{{
 "three":"https://cdn.jsdelivr.net/npm/three@0.160.0/build/three.module.js",
 "three/addons/":"https://cdn.jsdelivr.net/npm/three@0.160.0/examples/jsm/"
}}}}</script>
<script type="module">
import * as THREE from 'three';
import {{ OrbitControls }} from 'three/addons/controls/OrbitControls.js';
const DATA = {data};
const SC = DATA.scene || {{}};
const rgb = (c, dflt) => c ? new THREE.Color(c[0],c[1],c[2]) : new THREE.Color(dflt);
const scene = new THREE.Scene();
scene.background = rgb(SC.background, 0x20242c);
const camera = new THREE.PerspectiveCamera(SC.camera_fov||50, innerWidth/innerHeight, 0.01, 100);
camera.up.set(0,0,1);
camera.position.set(...(SC.camera_position||[2.5,-2.5,1.6]));
const renderer = new THREE.WebGLRenderer({{antialias:true}});
renderer.setSize(innerWidth, innerHeight); document.body.appendChild(renderer.domElement);
const controls = new OrbitControls(camera, renderer.domElement);
controls.target.set(...(SC.camera_lookat||[0,0,0.3]));
scene.add(new THREE.HemisphereLight(0xffffff, 0x445566, SC.ambient==null?1.1:SC.ambient));
const dl = new THREE.DirectionalLight(0xffffff, SC.light_intensity==null?1.2:SC.light_intensity);
dl.position.set(...(SC.light_direction||[3,2,5])); scene.add(dl);
const FS = SC.floor_size||10;
if (SC.grid !== false) {{
  const grid = new THREE.GridHelper(FS, 2*FS, 0x888888, 0x444444);
  grid.rotation.x = Math.PI/2; grid.position.z = 0.001; scene.add(grid);
}}
if (SC.floor !== false) {{
  const floor = new THREE.Mesh(new THREE.PlaneGeometry(FS,FS),
    new THREE.MeshStandardMaterial({{color:rgb(SC.floor_color,0x30343e), roughness:0.9}}));
  scene.add(floor);
}}
const mat = (i,s) => new THREE.MeshStandardMaterial({{
  color: s.color ? new THREE.Color(s.color[0],s.color[1],s.color[2])
                 : new THREE.Color().setHSL((i*0.13)%1, 0.55, 0.55),
  transparent: !!(s.color && s.color.length>3 && s.color[3]<1),
  opacity: s.color && s.color.length>3 ? s.color[3] : 1.0}});
function geomOf(s){{
  if (s.type==='box') return new THREE.BoxGeometry(s.xyz[0],s.xyz[1],s.xyz[2]);
  if (s.type==='cylinder'){{ const g=new THREE.CylinderGeometry(s.rh[0],s.rh[0],s.rh[1],24); g.rotateX(Math.PI/2); return g; }}
  if (s.type==='capsule'){{ const g=new THREE.CapsuleGeometry(s.rh[0],s.rh[1],6,16); g.rotateX(Math.PI/2); return g; }}
  if (s.type==='sphere') return new THREE.SphereGeometry(s.r,24,16);
  if (s.type==='pyramid'){{ const g=new THREE.ConeGeometry(s.wh[0]/Math.SQRT2,s.wh[1],4); g.rotateX(Math.PI/2); g.rotateZ(Math.PI/4); g.translate(0,0,s.wh[1]/4); return g; }}
  if (s.type==='mesh'){{ const g=new THREE.BufferGeometry();
    g.setAttribute('position', new THREE.Float32BufferAttribute(s.v,3));
    g.setIndex(s.f); g.computeVertexNormals(); return g; }}
  return new THREE.SphereGeometry(0.03,12,8);
}}
function subMesh(s,i){{
  const m = new THREE.Mesh(geomOf(s), mat(i,s));
  if (s.off_x){{ m.position.set(s.off_x[0],s.off_x[1],s.off_x[2]); }}
  if (s.off_q){{ m.quaternion.set(s.off_q[1],s.off_q[2],s.off_q[3],s.off_q[0]); }}
  return m;
}}
const meshes = DATA.shapes.map((s,i)=>{{
  const grp = new THREE.Group();
  const subs = (s.type==='combined') ? s.shapes : [s];
  for (const sub of subs) grp.add(subMesh(sub,i));
  scene.add(grp); return grp;
}});
for (const c of (DATA.contacts||[])) {{
  const m = new THREE.Mesh(new THREE.SphereGeometry(c.r,12,8),
    new THREE.MeshStandardMaterial({{color:0xff7043, transparent:true, opacity:0.6}}));
  m.position.set(c.off[0],c.off[1],c.off[2]);
  meshes[c.body].add(m);
}}
for (const a of (SC.arrows||[])) {{
  const dir = new THREE.Vector3(...a.dir).normalize();
  const org = new THREE.Vector3(...(a.origin||[0,0,0]));
  const len = a.length==null ? 0.3 : a.length;
  const ar = new THREE.ArrowHelper(dir, org, len,
    a.color ? rgb(a.color,0).getHex() : 0xffd54f, 0.25*len, 0.12*len);
  (a.body==null ? scene : meshes[a.body]).add(ar);
}}
let t=0, playing=true; const T=DATA.x.length;
const bar=document.getElementById('bar');
addEventListener('keydown',e=>{{if(e.code==='Space'){{playing=!playing;e.preventDefault();}}}});
bar.addEventListener('input',()=>{{t=+bar.value; playing=false;}});
function setFrame(k){{
  for(let i=0;i<meshes.length;i++){{
    const p=DATA.x[k][i], q=DATA.q[k][i];
    meshes[i].position.set(p[0],p[1],p[2]);
    meshes[i].quaternion.set(q[1],q[2],q[3],q[0]);
  }}
}}
let acc=0, last=performance.now();
function anim(now){{
  requestAnimationFrame(anim);
  if(playing){{ acc += (now-last); while(acc > 1000*DATA.h){{ acc-=1000*DATA.h; t=(t+1)%T; }} bar.value=t; }}
  last=now; setFrame(Math.floor(t)); controls.update(); renderer.render(scene,camera);
}}
anim(last);
addEventListener('resize',()=>{{camera.aspect=innerWidth/innerHeight;camera.updateProjectionMatrix();renderer.setSize(innerWidth,innerHeight);}});
</script></body></html>
"""


def _shape_json(shape):
    if shape is None:
        return {"type": "marker"}
    t = shape.get("type")
    if t == "combined":
        return {
            "type": "combined",
            "shapes": [_shape_json(s) for s in shape.get("shapes", [])],
        }
    if t == "box":
        xyz = shape.get("xyz") or shape.get("size")
        out = {"type": "box", "xyz": list(map(float, xyz))}
    elif t in ("cylinder", "capsule"):
        rh = shape.get("rh") or (shape.get("radius", 0.05), shape.get("length", 0.1))
        out = {"type": "cylinder" if t == "cylinder" else "capsule",
               "rh": [float(rh[0]), float(rh[1])]}
    elif t == "sphere":
        out = {"type": "sphere", "r": float(shape.get("r", shape.get("radius", 0.05)))}
    elif t == "pyramid":
        out = {"type": "pyramid", "wh": list(map(float, shape["wh"]))}
    elif t == "mesh" and shape.get("path") and os.path.exists(shape["path"]) \
            and shape["path"].lower().endswith(".obj"):
        v, f = _load_obj(shape["path"], shape.get("scale"))
        out = {"type": "mesh", "v": v, "f": f}
    else:
        out = {"type": "marker"}  # unresolvable mesh formats → frame marker
    if shape.get("position_offset") is not None:
        out["off_x"] = [float(v) for v in shape["position_offset"]]
    if shape.get("orientation_offset") is not None:
        out["off_q"] = [float(v) for v in shape["orientation_offset"]]
    if shape.get("color") is not None:
        out["color"] = [float(v) for v in shape["color"]]
    return out


def scene_options(camera_position=None, camera_lookat=None, camera_fov=None,
                  light_direction=None, light_intensity=None, ambient=None,
                  background=None, floor=True, floor_size=None,
                  floor_color=None, grid=True, arrows=None):
    """Scene-control dict for visualize(..., scene=...) — the analog of the
    reference's set_camera!/set_light!/set_background!/set_floor!/set_arrow!
    (src/visuals/set.jl:18-159).

    arrows: list of dicts {"dir": [3], "origin": [3], "length": float,
    "color": [r,g,b], "body": int|None} — body-attached arrows follow the
    body; body=None pins them to the world frame (set_arrow! analog).
    """
    sc = {}
    if camera_position is not None:
        sc["camera_position"] = [float(v) for v in camera_position]
    if camera_lookat is not None:
        sc["camera_lookat"] = [float(v) for v in camera_lookat]
    if camera_fov is not None:
        sc["camera_fov"] = float(camera_fov)
    if light_direction is not None:
        sc["light_direction"] = [float(v) for v in light_direction]
    if light_intensity is not None:
        sc["light_intensity"] = float(light_intensity)
    if ambient is not None:
        sc["ambient"] = float(ambient)
    if background is not None:
        sc["background"] = [float(v) for v in background]
    if not floor:
        sc["floor"] = False
    if floor_size is not None:
        sc["floor_size"] = float(floor_size)
    if floor_color is not None:
        sc["floor_color"] = [float(v) for v in floor_color]
    if not grid:
        sc["grid"] = False
    if arrows:
        sc["arrows"] = [
            {
                k: ([float(x) for x in v] if isinstance(v, (list, tuple))
                    or hasattr(v, "__len__") else
                    (int(v) if k == "body" else float(v)))
                for k, v in a.items() if v is not None
            }
            for a in arrows
        ]
    return sc


def visualize(mech, xs, qs, path="trajectory.html", title=None, stride=1,
              contact_spheres=True, scene=None):
    """Write a standalone HTML player for a trajectory.

    xs: (T, nb, 3) positions;  qs: (T, nb, 4) quaternions [w,x,y,z]
    (e.g. Trajectory.x / Trajectory.q or stacked rollout records).
    contact_spheres: draw each contact's sphere at its body-frame origin
    (reference build_robot contact spheres, visualizer.jl:176-216).
    scene: scene_options(...) dict with camera/light/background/floor/arrow
    controls (reference src/visuals/set.jl:18-159).
    """
    xs = np.asarray(xs)[::stride]
    qs = np.asarray(qs)[::stride]
    contacts = []
    if contact_spheres and getattr(mech.topo, "nc", 0):
        origins = np.asarray(mech.params.contact_origin)
        radii = np.asarray(mech.params.contact_radius)
        for c, b in enumerate(mech.topo.contact_parent):
            contacts.append({
                "body": int(b),
                "off": [float(v) for v in origins[c]],
                "r": max(float(radii[c]), 1e-3),
            })
    data = {
        "h": float(mech.params.timestep) * stride,
        "shapes": [_shape_json(s) for s in mech.body_shapes],
        "contacts": contacts,
        "scene": scene or {},
        "x": np.round(xs, 5).tolist(),
        "q": np.round(qs, 5).tolist(),
    }
    html = _TEMPLATE.format(
        title=title or f"{mech.topo.nb} bodies / {xs.shape[0]} frames",
        tmax=xs.shape[0] - 1,
        data=json.dumps(data),
    )
    with open(path, "w") as f:
        f.write(html)
    return path


# --------------------------------------------------------------------------
# offline rendering + video export (reference convert.jl:1-31 FFMPEG path —
# rebuilt without ffmpeg: matplotlib software render → GIF/MP4 via PIL or
# imageio)
# --------------------------------------------------------------------------


def _unit_sphere(nu=12, nv=8):
    u = np.linspace(0, 2 * np.pi, nu)
    v = np.linspace(0, np.pi, nv)
    uu, vv = np.meshgrid(u, v)
    pts = np.stack(
        [np.sin(vv) * np.cos(uu), np.sin(vv) * np.sin(uu), np.cos(vv)], -1
    )
    faces = []
    for i in range(nv - 1):
        for j in range(nu - 1):
            a, b = i * nu + j, i * nu + j + 1
            c, d = (i + 1) * nu + j, (i + 1) * nu + j + 1
            faces.extend([(a, b, d), (a, d, c)])
    return pts.reshape(-1, 3), np.asarray(faces)


def _shape_mesh(s):
    """(verts (N,3), faces (M,3)) coarse triangle mesh of a _shape_json."""
    t = s.get("type")
    if t == "box":
        x, y, z = [v / 2 for v in s["xyz"]]
        v = np.array([[sx * x, sy * y, sz * z]
                      for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
        f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                      [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                      [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
        return v, f
    if t == "sphere":
        v, f = _unit_sphere()
        return v * s["r"], f
    if t in ("cylinder", "capsule"):
        r, L = s["rh"]
        n = 12
        th = np.linspace(0, 2 * np.pi, n, endpoint=False)
        ring = np.stack([r * np.cos(th), r * np.sin(th)], -1)
        bot = np.concatenate([ring, np.full((n, 1), -L / 2)], -1)
        top = np.concatenate([ring, np.full((n, 1), L / 2)], -1)
        v = np.concatenate([bot, top, [[0, 0, -L / 2], [0, 0, L / 2]]])
        f = []
        for i in range(n):
            j = (i + 1) % n
            f.extend([(i, j, n + j), (i, n + j, n + i),
                      (2 * n, j, i), (2 * n + 1, n + i, n + j)])
        v2, f2 = np.asarray(v), np.asarray(f)
        if t == "capsule":  # hemispherical caps ≈ two spheres
            sv, sf = _unit_sphere(8, 6)
            for sgn in (-1, 1):
                off = len(v2)
                v2 = np.concatenate([v2, sv * r + [0, 0, sgn * L / 2]])
                f2 = np.concatenate([f2, sf + off])
        return v2, f2
    if t == "pyramid":
        w, h = s["wh"]
        v = np.array([[-w / 2, -w / 2, 0], [w / 2, -w / 2, 0],
                      [w / 2, w / 2, 0], [-w / 2, w / 2, 0], [0, 0, h]])
        f = np.array([[0, 2, 1], [0, 3, 2],
                      [0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]])
        return v, f
    if t == "mesh":
        v = np.asarray(s["v"], dtype=np.float64).reshape(-1, 3)
        f = np.asarray(s["f"], dtype=np.int64).reshape(-1, 3)
        return v, f
    # marker
    v, f = _unit_sphere(8, 6)
    return v * 0.03, f


def render_frames(mech, xs, qs, width=480, height=360, stride=1,
                  camera_position=(2.5, -2.5, 1.6), camera_lookat=(0, 0, 0.3),
                  floor_size=4.0):
    """Software-render a trajectory to a list of PIL images (matplotlib 3D).

    The offline analog of the HTML player for headless video export
    (reference render/convert.jl — rebuilt without a browser or ffmpeg)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection
    from PIL import Image

    from . import nplie

    xs = np.asarray(xs, dtype=np.float64)[::stride]
    qs = np.asarray(qs, dtype=np.float64)[::stride]
    meshes = []
    for s in (_shape_json(sh) for sh in mech.body_shapes):
        subs = s["shapes"] if s.get("type") == "combined" else [s]
        parts = []
        for sub in subs:
            v, f = _shape_mesh(sub)
            if sub.get("off_q") is not None:
                v = v @ nplie.rotation_matrix(sub["off_q"]).T
            if sub.get("off_x") is not None:
                v = v + np.asarray(sub["off_x"])
            parts.append((v, f))
        meshes.append(parts)

    frames = []
    dpi = 80
    fig = plt.figure(figsize=(width / dpi, height / dpi), dpi=dpi)
    ax = fig.add_subplot(111, projection="3d")
    ctr = np.asarray(camera_lookat, dtype=np.float64)
    cam = np.asarray(camera_position, dtype=np.float64)
    d = cam - ctr
    elev = np.degrees(np.arctan2(d[2], np.hypot(d[0], d[1])))
    azim = np.degrees(np.arctan2(d[1], d[0]))
    span = floor_size / 2
    for k in range(xs.shape[0]):
        ax.cla()
        ax.set_axis_off()
        ax.view_init(elev=elev, azim=azim)
        # floor
        fx = [[-span, -span, 0], [span, -span, 0], [span, span, 0],
              [-span, span, 0]]
        ax.add_collection3d(
            Poly3DCollection([fx], facecolor="#30343e", alpha=0.4)
        )
        for i, parts in enumerate(meshes):
            R = nplie.rotation_matrix(qs[k, i])
            col = plt.cm.tab10(i % 10)
            for v, f in parts:
                w = v @ R.T + xs[k, i]
                ax.add_collection3d(
                    Poly3DCollection(
                        w[f], facecolor=col, edgecolor="k",
                        linewidths=0.2, alpha=0.95,
                    )
                )
        ax.set_xlim(ctr[0] - span, ctr[0] + span)
        ax.set_ylim(ctr[1] - span, ctr[1] + span)
        ax.set_zlim(0, 2 * span * height / width)
        ax.set_box_aspect((1, 1, height / width * 2))
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(Image.fromarray(buf.copy()))
    plt.close(fig)
    return frames


def export_video(mech, xs, qs, path="trajectory.gif", fps=None, stride=1,
                 **render_kw):
    """Render a trajectory to an animated GIF (always available) or MP4
    (if an imageio ffmpeg backend exists) — reference convert.jl:1-31
    (MeshCat MP4 → FFMPEG → GIF), rebuilt headless."""
    h = float(np.asarray(mech.params.timestep)) * stride
    fps = fps or max(1, round(1.0 / h))
    frames = render_frames(mech, xs, qs, stride=stride, **render_kw)
    if path.lower().endswith(".gif"):
        frames[0].save(
            path, save_all=True, append_images=frames[1:],
            duration=int(1000 / fps), loop=0,
        )
        return path
    try:
        import imageio.v3 as iio

        iio.imwrite(path, [np.asarray(f) for f in frames], fps=fps)
        return path
    except Exception:
        gif = os.path.splitext(path)[0] + ".gif"
        frames[0].save(
            gif, save_all=True, append_images=frames[1:],
            duration=int(1000 / fps), loop=0,
        )
        return gif
