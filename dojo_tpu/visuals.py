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
const scene = new THREE.Scene();
scene.background = new THREE.Color(0x20242c);
const camera = new THREE.PerspectiveCamera(50, innerWidth/innerHeight, 0.01, 100);
camera.up.set(0,0,1); camera.position.set(2.5,-2.5,1.6);
const renderer = new THREE.WebGLRenderer({{antialias:true}});
renderer.setSize(innerWidth, innerHeight); document.body.appendChild(renderer.domElement);
const controls = new OrbitControls(camera, renderer.domElement);
scene.add(new THREE.HemisphereLight(0xffffff, 0x445566, 1.1));
const dl = new THREE.DirectionalLight(0xffffff, 1.2); dl.position.set(3,2,5); scene.add(dl);
const grid = new THREE.GridHelper(10, 20, 0x888888, 0x444444);
grid.rotation.x = Math.PI/2; grid.position.z = 0.001; scene.add(grid);
const floor = new THREE.Mesh(new THREE.PlaneGeometry(10,10),
  new THREE.MeshStandardMaterial({{color:0x30343e, roughness:0.9}}));
scene.add(floor);
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


def visualize(mech, xs, qs, path="trajectory.html", title=None, stride=1,
              contact_spheres=True):
    """Write a standalone HTML player for a trajectory.

    xs: (T, nb, 3) positions;  qs: (T, nb, 4) quaternions [w,x,y,z]
    (e.g. Trajectory.x / Trajectory.q or stacked rollout records).
    contact_spheres: draw each contact's sphere at its body-frame origin
    (reference build_robot contact spheres, visualizer.jl:176-216).
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
