"""Trajectory visualization: standalone HTML/three.js export.

Reference: src/visuals/ (MeshCat scene building, visualizer.jl:14-128).
TPU-native replacement: a dependency-free HTML file with the trajectory
embedded as JSON and rendered by three.js (CDN), with orbit controls,
floor grid, playback scrubber.  Works from any browser; no server, no
Julia/MeshCat stack.
"""

from __future__ import annotations

import json

import numpy as np

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
grid.rotation.x = Math.PI/2; scene.add(grid);
const mat = i => new THREE.MeshStandardMaterial({{color: new THREE.Color().setHSL((i*0.13)%1, 0.55, 0.55)}});
const meshes = DATA.shapes.map((s,i)=>{{
  let g;
  if (s.type==='box') g = new THREE.BoxGeometry(s.xyz[0],s.xyz[1],s.xyz[2]);
  else if (s.type==='cylinder'){{ g = new THREE.CylinderGeometry(s.rh[0],s.rh[0],s.rh[1],24); g.rotateX(Math.PI/2); }}
  else if (s.type==='sphere') g = new THREE.SphereGeometry(s.r,24,16);
  else g = new THREE.SphereGeometry(0.03,12,8);
  const m = new THREE.Mesh(g, mat(i)); scene.add(m); return m;
}});
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
    if t == "box":
        return {"type": "box", "xyz": list(map(float, shape["xyz"]))}
    if t in ("cylinder", "capsule"):
        rh = shape.get("rh") or (shape.get("radius", 0.05), shape.get("length", 0.1))
        return {"type": "cylinder", "rh": [float(rh[0]), float(rh[1])]}
    if t == "sphere":
        return {"type": "sphere", "r": float(shape.get("r", shape.get("radius", 0.05)))}
    return {"type": "marker"}


def visualize(mech, xs, qs, path="trajectory.html", title=None, stride=1):
    """Write a standalone HTML player for a trajectory.

    xs: (T, nb, 3) positions;  qs: (T, nb, 4) quaternions [w,x,y,z]
    (e.g. Trajectory.x / Trajectory.q or stacked rollout records).
    """
    xs = np.asarray(xs)[::stride]
    qs = np.asarray(qs)[::stride]
    data = {
        "h": float(mech.params.timestep) * stride,
        "shapes": [_shape_json(s) for s in mech.body_shapes],
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
