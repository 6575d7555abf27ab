"""URDF → Mechanism compiler (reference src/mechanism/urdf.jl:396-584).

Parses links/joints with xml.etree, then performs the reference's
``set_parsed_values!`` placement pass: each body's frame is its inertial
(COM) frame; joint anchors (parent/child vertices) and orientation offsets
are derived from the chained URDF joint origins, root → leaves.

Notes kept faithful to the reference:
* the root link becomes the world origin unless ``floating=True`` (then a
  floating base joint is prepended, urdf.jl parse_joints:497-500);
* joint axes are used as given in the joint frame (the reference's
  "TODO: fix axis" behavior, urdf.jl:214-216);
* ``<loop_joint>`` elements close kinematic loops (fourbar);
* fixed joints are kept as constraints by the parser itself; zoo models
  whose reference defaults to ``keep_fixed_joints=false`` (atlas, panda,
  youbot, exoskeleton, quadrotor, uuv — mechanism.jl:11 etc.) run
  ``builder.reduce_fixed_joints`` on the parsed definitions before build,
  merging welded bodies and shrinking the KKT system.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from . import builder as bd
from . import lie, nplie

URDF_JOINT_KINDS = {
    "revolute": "revolute",
    "continuous": "revolute",
    "prismatic": "prismatic",
    "planar": "planar",
    "planarfree": "planar_free",
    "planaraxis": "planar_axis",
    "fixed": "fixed",
    "floating": "floating",
    "orbital": "orbital",
    "ball": "spherical",
    "spherical": "spherical",
    "fixedorientation": "fixed_orientation",
    "cylindrical": "cylindrical",
    "cylindricalfree": "cylindrical_free",
}


def _rpy_to_quat(rpy):
    return nplie.rpy_to_quat(rpy)


def _pose(el):
    if el is None:
        return np.zeros(3), np.array([1.0, 0, 0, 0])
    xyz = np.fromstring(el.get("xyz", "0 0 0"), sep=" ")
    rpy = np.fromstring(el.get("rpy", "0 0 0"), sep=" ")
    return xyz, _rpy_to_quat(rpy)


def _inertial(link):
    el = link.find("inertial")
    if el is None:
        return np.zeros(3), np.array([1.0, 0, 0, 0]), 0.0, np.zeros((3, 3))
    x, q = _pose(el.find("origin"))
    m = float(el.find("mass").get("value", "0")) if el.find("mass") is not None else 0.0
    J = np.zeros((3, 3))
    ine = el.find("inertia")
    if ine is not None:
        ixx = float(ine.get("ixx", "0"))
        iyy = float(ine.get("iyy", "0"))
        izz = float(ine.get("izz", "0"))
        ixy = float(ine.get("ixy", "0"))
        ixz = float(ine.get("ixz", "0"))
        iyz = float(ine.get("iyz", "0"))
        J = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
    return x, q, m, J


def _material_color(vis, root):
    mat = vis.find("material")
    if mat is None:
        return None
    col = mat.find("color")
    if col is None and mat.get("name"):
        # named material defined at robot level (urdf.jl:171-212 parity)
        for m in root.findall("material"):
            if m.get("name") == mat.get("name"):
                col = m.find("color")
                break
    if col is None:
        return None
    rgba = np.fromstring(col.get("rgba", "0.75 0.75 0.75 1"), sep=" ")
    return [float(v) for v in rgba[:4]]


_ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _resolve_mesh(filename):
    """URDF mesh filenames ("mesh/head.obj", "package://...") resolve by
    basename against the bundled asset store (assets/mesh/); basenames are
    unique across the zoo.  Unresolvable files keep the raw name so the
    visualizer can fall back to a frame marker."""
    if not filename:
        return filename
    p = os.path.join(_ASSETS, "mesh", os.path.basename(filename))
    return p if os.path.exists(p) else filename


def _shape_of(link, xi, qi, root):
    """All <visual> geometries of a link, with offsets expressed in the BODY
    (inertial) frame and material colors (urdf.jl parse_links:171-212).
    Returns a single shape dict, a {'type':'combined'} dict, or None."""
    shapes = []
    for vis in link.findall("visual"):
        geom = vis.find("geometry")
        if geom is None:
            continue
        xv, qv = _pose(vis.find("origin"))
        # visual pose is in the LINK frame; body frame is the inertial frame
        off_x = _rot(xv - xi, _qconj(qi))
        off_q = _qmul(_qconj(qi), qv)
        d = None
        for tag in ("box", "cylinder", "sphere", "capsule", "mesh"):
            g = geom.find(tag)
            if g is None:
                continue
            d = {"type": tag, "attrib": dict(g.attrib)}
            if tag in ("cylinder", "capsule"):
                d["radius"] = float(g.get("radius", "0.5"))
                d["length"] = float(g.get("length", "1"))
            elif tag == "sphere":
                d["radius"] = float(g.get("radius", "0.5"))
            elif tag == "box":
                d["size"] = np.fromstring(g.get("size", "1 1 1"), sep=" ")
            elif tag == "mesh":
                d["path"] = _resolve_mesh(g.get("filename"))
                if g.get("scale"):
                    d["scale"] = np.fromstring(g.get("scale"), sep=" ")
            break
        if d is None:
            continue
        if np.linalg.norm(off_x) > 1e-12 or abs(off_q[0]) < 1 - 1e-12:
            d["position_offset"] = off_x
            d["orientation_offset"] = off_q
        color = _material_color(vis, root)
        if color is not None:
            d["color"] = color
        shapes.append(d)
    if not shapes:
        return None
    if len(shapes) == 1:
        return shapes[0]
    return {"type": "combined", "shapes": shapes}


def _qmul(a, b):
    return nplie.qmul(a, b)


def _qconj(q):
    return q * np.array([1.0, -1, -1, -1])


def _rot(v, q):
    return nplie.rotate(v, q)


def parse_urdf(
    path,
    floating=False,
    timestep=0.01,
    gravity=(0, 0, -9.81),
    parse_dampers=True,
    contacts=(),
    dtype=None,
):
    """Parse a URDF file into a Mechanism (joints placed, zero configuration).

    contacts: sequence of builder.ContactDef appended after parsing.
    """
    bodies, jointdefs = parse_urdf_defs(path, floating, parse_dampers)
    return bd.build(
        bodies, jointdefs, list(contacts), timestep=timestep, gravity=gravity,
        dtype=dtype,
    )


def parse_urdf_defs(path, floating=False, parse_dampers=True):
    """Parse a URDF into (bodies, jointdefs) for further customization
    (springs/dampers/limits/spring offsets) before builder.build."""
    tree = ET.parse(path)
    root = tree.getroot()
    assert root.tag == "robot"

    links = {l.get("name"): l for l in root.findall("link")}
    xjoints = root.findall("joint")
    xloops = root.findall("loop_joint")

    inert = {name: _inertial(el) for name, el in links.items()}
    child_names = {j.find("child").get("link") for j in xjoints}
    roots = [n for n in links if n not in child_names]
    assert len(roots) == 1, f"multiple root links: {roots}"
    root_link = roots[0]

    # body set: all links except the root (unless floating)
    body_names = [n for n in links if n != root_link or floating]

    # raw joint records (kind, parent, child, parent_vertex=origin xyz,
    # orientation_offset=origin rpy, axis, damping, name)
    recs = []
    for j in xjoints:
        kind = URDF_JOINT_KINDS[j.get("type")]
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        x, q = _pose(j.find("origin"))
        ax = j.find("axis")
        axis = (
            np.fromstring(ax.get("xyz"), sep=" ") if ax is not None else np.array([1.0, 0, 0])
        )
        dyn = j.find("dynamics")
        damper = float(dyn.get("damping", "0")) if (dyn is not None and parse_dampers) else 0.0
        rec = dict(
            kind=kind, parent=parent, child=child, x=x, q=q, axis=axis,
            damper=damper, name=j.get("name"),
        )
        if parent == root_link and not floating:
            recs.insert(0, rec)
        else:
            recs.append(rec)
    if floating:
        recs.insert(
            0,
            dict(
                kind="floating", parent=root_link, child=root_link, x=np.zeros(3),
                q=np.array([1.0, 0, 0, 0]), axis=np.array([1.0, 0, 0]),
                damper=0.0, name="floating_base", _base=True,
            ),
        )

    # ---- placement pass (set_parsed_values!, urdf.jl:420-528) -------------
    # world poses of joints and bodies; root link is world origin (or the
    # floating base body at identity)
    jxw, jqw = {}, {}  # joint name → world pose
    bxw = {root_link: np.zeros(3)}
    bqw = {root_link: np.array([1.0, 0, 0, 0])}
    parent_joint = {}  # body → joint rec placing it
    jointdefs = []
    out_parent = lambda n: "origin" if (n == root_link and not floating) else n

    # process in root-to-leaves order
    placed = {root_link}
    pending = [r for r in recs]
    while pending:
        progressed = False
        for i, r in enumerate(pending):
            if r["parent"] not in placed:
                continue
            pending.pop(i)
            progressed = True
            if r.get("_base"):
                # floating base: body frame = inertial frame of root link
                xi, qi, _, _ = inert[root_link]
                bxw[root_link] = xi
                bqw[root_link] = qi
                jxw[r["name"]] = np.zeros(3)
                jqw[r["name"]] = np.array([1.0, 0, 0, 0])
                parent_joint[root_link] = r
                jointdefs.append(
                    bd.JointDef(
                        kind="floating", parent="origin", child=root_link,
                        damper=r["damper"], name=r["name"],
                    )
                )
                placed.add("__base__")
                break
            pname, cname = r["parent"], r["child"]
            # parent joint world pose
            if pname == root_link and not floating and pname not in parent_joint:
                xpj, qpj = np.zeros(3), np.array([1.0, 0, 0, 0])
            else:
                pj = parent_joint[pname]
                xpj, qpj = jxw[pj["name"]], jqw[pj["name"]]
            xpb, qpb = bxw[pname], bqw[pname]
            # joint pose in parent-body frame
            xjl = _rot(xpj + _rot(r["x"], qpj) - xpb, _qconj(qpb))
            qjl = _qmul(_qconj(qpb), _qmul(qpj, r["q"]))
            # world pose of this joint
            xj = xpb + _rot(xjl, qpb)
            qj = _qmul(qpb, qjl)
            jxw[r["name"]], jqw[r["name"]] = xj, qj
            # child body frame = child link inertial frame
            xbl, qbl, _, _ = inert[cname]
            offset = _qmul(qjl, qbl)
            parent_vertex = xjl
            child_vertex = _rot(-xbl, _qconj(qbl))
            # place child body in world (zero configuration)
            qb = _qmul(qpb, offset)
            xb = xpb + _rot(parent_vertex, qpb) - _rot(child_vertex, qb)
            bxw[cname], bqw[cname] = xb, qb
            parent_joint[cname] = r
            jointdefs.append(
                bd.JointDef(
                    kind=r["kind"],
                    parent=out_parent(pname),
                    child=cname,
                    axis=r["axis"],
                    parent_vertex=parent_vertex,
                    child_vertex=child_vertex,
                    orientation_offset=offset,
                    damper=r["damper"],
                    name=r["name"],
                )
            )
            placed.add(cname)
            break
        if not progressed:
            raise ValueError(f"unplaceable joints: {[r['name'] for r in pending]}")

    # loop joints (urdf.jl:509-570): vertices in the two parent bodies' frames
    for xl in xloops:
        kind = URDF_JOINT_KINDS[xl.get("type")]
        l1, l2 = xl.find("link1"), xl.find("link2")
        n1, n2 = l1.get("link"), l2.get("link")
        x1, q1 = _pose(l1)
        x2, _ = _pose(l2)
        ax = xl.find("axis")
        axis = (
            np.fromstring(ax.get("xyz"), sep=" ") if ax is not None else np.array([1.0, 0, 0])
        )

        def joint_world(nm):
            if nm == root_link and nm not in parent_joint:
                return np.zeros(3), np.array([1.0, 0, 0, 0])
            pj = parent_joint[nm]
            return jxw[pj["name"]], jqw[pj["name"]]

        xj1, qj1 = joint_world(n1)
        xj2, qj2 = joint_world(n2)
        xb1, qb1 = bxw[n1], bqw[n1]
        xb2, qb2 = bxw[n2], bqw[n2]
        pj1 = _rot(xj1 + _rot(x1, qj1) - xb1, _qconj(qb1))
        pj2 = _rot(xj2 + _rot(x2, qj2) - xb2, _qconj(qb2))
        qjl1 = _qmul(_qconj(qb1), _qmul(qj1, q1))
        offset1 = _qmul(qjl1, qb2)
        axis_p = _rot(axis, qjl1)
        jointdefs.append(
            bd.JointDef(
                kind=kind,
                parent=out_parent(n1),
                child=n2,
                axis=axis_p,
                parent_vertex=pj1,
                child_vertex=pj2,
                orientation_offset=offset1,
                name=xl.get("name"),
            )
        )

    bodies = []
    for n in body_names:
        xi, qi, m, J = inert[n]
        b = bd.Body(n, m, J, shape=_shape_of(links[n], xi, qi, root))
        bodies.append(b)

    return bodies, jointdefs


def apply_zoo_options(jointdefs, springs=None, dampers=None, joint_limits=None,
                      rot_spring_offsets=None):
    """Post-parse customization mirroring the zoo's set_springs!/set_dampers!/
    set_limits/spring_offset idiom (DojoEnvironments/src/utilities.jl)."""
    for jd in jointdefs:
        # the reference skips the floating base for BOTH springs and
        # dampers (utilities.jl set_springs!/set_dampers! `Nλ==0 continue`)
        if springs is not None and jd.kind != "floating":
            jd.spring = float(springs)
        if dampers is not None and jd.kind != "floating":
            jd.damper = float(dampers)
        if joint_limits and jd.name in joint_limits:
            lo, hi = joint_limits[jd.name]
            lim = (np.atleast_1d(lo), np.atleast_1d(hi))
            # limits attach to the sub-joint with free coordinates
            # (set_limits, DojoEnvironments/src/utilities.jl)
            if jd.kind in ("prismatic", "planar", "fixed_orientation",
                           "planar_free", "cylindrical_free"):
                jd.tra_limits = lim
            else:
                jd.rot_limits = lim
        if rot_spring_offsets and jd.name in rot_spring_offsets:
            jd.rot_spring_offset = np.atleast_1d(rot_spring_offsets[jd.name])
    return jointdefs
