"""Mechanism construction: bodies + joint prototypes + contacts → (Topology, Params).

Mirrors the reference constructors (src/mechanism/constructor.jl:46-84,
src/joints/prototypes.jl, src/contacts/constructor.jl:68-131) but compiles
everything down to the masked array form of core.py at build time
(host-side NumPy; nothing here is traced).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import lie, nplie
from .core import CONTACT_WIDTH, BodyState, Params, Topology

# joint kind → (Nλ_tra, Nλ_rot); complement of prototypes.jl
# nullspace_dimension table (:482-499)
KIND_NLAM = {
    "fixed": (3, 3),
    "prismatic": (2, 3),
    "planar": (1, 3),
    "fixed_orientation": (0, 3),
    "revolute": (3, 2),
    "cylindrical": (2, 2),
    "planar_axis": (1, 2),
    "free_revolute": (0, 2),
    "orbital": (3, 1),
    "prismatic_orbital": (2, 1),
    "planar_orbital": (1, 1),
    "free_orbital": (0, 1),
    "spherical": (3, 0),
    "cylindrical_free": (2, 0),
    "planar_free": (1, 0),
    "floating": (0, 0),
}


@dataclasses.dataclass
class Body:
    name: str
    mass: float
    inertia: np.ndarray  # (3,3) or (3,) diagonal
    shape: Optional[dict] = None  # visualization metadata

    def inertia_matrix(self):
        J = np.asarray(self.inertia, dtype=np.float64)
        return np.diag(J) if J.ndim == 1 else J


def box_body(name, x, y, z, mass, **kw):
    """Box inertia (reference bodies/shapes.jl Box:67-104)."""
    J = mass / 12.0 * np.diag([y**2 + z**2, x**2 + z**2, x**2 + y**2])
    return Body(name, mass, J, shape={"type": "box", "xyz": (x, y, z)}, **kw)


def cylinder_body(name, r, h, mass, **kw):
    J = mass * np.diag(
        [(3 * r**2 + h**2) / 12, (3 * r**2 + h**2) / 12, r**2 / 2]
    )
    return Body(name, mass, J, shape={"type": "cylinder", "rh": (r, h)})


def sphere_body(name, r, mass, **kw):
    J = mass * 2.0 / 5.0 * r**2 * np.eye(3)
    return Body(name, mass, J, shape={"type": "sphere", "r": r})


def capsule_body(name, r, h, mass, **kw):
    """Capsule = cylinder of length h + two hemispherical caps
    (reference bodies/shapes.jl Capsule:158-182: mass split by volume,
    parallel-axis hemispheres at d = 3r/8 + h/2)."""
    vol_cyl = np.pi * h * r**2
    vol_hemi = np.pi * 4.0 / 3.0 * r**3 / 2.0
    m_cyl = mass * vol_cyl / (vol_cyl + 2 * vol_hemi)
    m_hemi = mass * vol_hemi / (vol_cyl + 2 * vol_hemi)
    ixx_cyl = m_cyl * (h**2 / 12.0 + r**2 / 4.0)
    izz_cyl = m_cyl * r**2 / 2.0
    ixx_hemi = 83.0 / 320.0 * m_hemi * r**2
    izz_hemi = m_hemi * 2.0 / 5.0 * r**2 / 2.0
    d = 3.0 / 8.0 * r + 0.5 * h
    ixx = ixx_cyl + 2.0 * (ixx_hemi + m_hemi * d**2)
    izz = izz_cyl + 2.0 * izz_hemi
    J = np.diag([ixx, ixx, izz])
    return Body(name, mass, J, shape={"type": "capsule", "rh": (r, h)})


def pyramid_body(name, w, h, mass, **kw):
    """Square pyramid pointing +z, COM at h/4 (shapes.jl Pyramid:270-300)."""
    J = mass / 80.0 * np.diag(
        [4 * w**2 + 3 * h**2, 4 * w**2 + 3 * h**2, 8 * w**2]
    )
    return Body(name, mass, J, shape={"type": "pyramid", "wh": (w, h)})


def mesh_body(name, mass, inertia, path=None, scale=(1.0, 1.0, 1.0), **kw):
    """Body with explicit inertia and a mesh visual (shapes.jl Mesh:13-60;
    meshes never define inertia in the reference either — URDF supplies it)."""
    return Body(name, mass, np.asarray(inertia),
                shape={"type": "mesh", "path": path, "scale": tuple(scale)})


def combined_body(name, mass, inertia, shapes, **kw):
    """Body with explicit inertia and a list of visual shape dicts
    (shapes.jl CombinedShapes:193-258)."""
    return Body(name, mass, np.asarray(inertia),
                shape={"type": "combined", "shapes": list(shapes)})


@dataclasses.dataclass
class JointDef:
    kind: str
    parent: str  # body name or 'origin'
    child: str
    axis: Sequence = (1.0, 0.0, 0.0)
    # rotational-subjoint axis override (defaults to `axis`); needed when a
    # fixed-joint merge (reduce_fixed_joints) conjugates the rotational
    # constraint frame while the translational one stays in the parent frame
    rot_axis: Optional[Sequence] = None
    parent_vertex: Sequence = (0.0, 0.0, 0.0)
    child_vertex: Sequence = (0.0, 0.0, 0.0)
    orientation_offset: Sequence = (1.0, 0.0, 0.0, 0.0)
    spring: float = 0.0
    damper: float = 0.0
    tra_spring_offset: Optional[Sequence] = None
    rot_spring_offset: Optional[Sequence] = None
    tra_limits: Optional[tuple] = None  # (lo, hi) arrays over free tra coords
    rot_limits: Optional[tuple] = None
    name: Optional[str] = None


@dataclasses.dataclass
class ContactDef:
    body: str
    kind: str = "nonlinear"  # 'nonlinear' | 'linear' | 'impact'
    normal: Sequence = (0.0, 0.0, 1.0)
    friction: float = 1.0
    origin: Sequence = (0.0, 0.0, 0.0)  # contact point in body frame
    radius: float = 0.0
    offset: Sequence = (0.0, 0.0, 0.0)  # halfspace offset in world frame
    name: Optional[str] = None
    # body-body collision: set child to a body name.  The pair geometry is
    # sphere-sphere by default; give capsule endpoints / box size / string
    # length for the other collision pairs (reference src/contacts/
    # collisions/{sphere_sphere,sphere_capsule,sphere_box,string}.jl).
    child: Optional[str] = None
    child_origin: Sequence = (0.0, 0.0, 0.0)
    child_radius: float = 0.0
    capsule: Optional[tuple] = None  # (endpoint_a(3), endpoint_b(3)) child frame
    box: Optional[Sequence] = None  # (width, depth, height) of child box
    string_length: Optional[float] = None  # taut-string maximum length

    @property
    def geom(self) -> str:
        if self.child is None:
            return "halfspace"
        if self.capsule is not None:
            return "capsule"
        if self.box is not None:
            return "box"
        if self.string_length is not None:
            return "string"
        return "sphere"


def reduce_fixed_joints(bodies, joints, contacts=()):
    """Merge bodies across body-body Fixed joints (reference
    mechanism/methods.jl reduce_fixed_joints:161-233, extended to rewrite
    contact attachments, which the reference marks TODO).

    Operates on definition lists before build().  The merged body keeps the
    parent's name and orientation; its origin moves to the combined COM.
    Origin-welded fixed joints are kept as constraints (reference behavior:
    parent == origin keeps com at zero — equivalent dynamics either way).
    """
    import copy

    bodies = [copy.deepcopy(b) for b in bodies]
    joints = [copy.deepcopy(j) for j in joints]
    contacts = [copy.deepcopy(c) for c in contacts]

    def rmat(q):
        return nplie.rotation_matrix(q)

    def kmat(d):
        d = np.asarray(d, dtype=np.float64)
        return float(d @ d) * np.eye(3) - np.outer(d, d)

    while True:
        jfix = next(
            (j for j in joints if j.kind == "fixed" and j.parent != "origin"),
            None,
        )
        if jfix is None:
            return bodies, joints, contacts
        p = next(b for b in bodies if b.name == jfix.parent)
        c = next(b for b in bodies if b.name == jfix.child)
        off = np.asarray(jfix.orientation_offset, dtype=np.float64)
        R = rmat(off)
        # child origin in parent frame (methods.jl:181)
        delta = np.asarray(jfix.parent_vertex, dtype=np.float64) - R @ np.asarray(
            jfix.child_vertex, dtype=np.float64
        )
        m = p.mass + c.mass
        s = c.mass / m * delta  # new COM in old parent frame (methods.jl:187)
        Jp = p.inertia_matrix() + p.mass * kmat(-s)
        Jc = R @ c.inertia_matrix() @ R.T + c.mass * kmat(delta - s)
        p.mass = m
        p.inertia = Jp + Jc

        def to_parent(v):
            return R @ np.asarray(v, dtype=np.float64) + delta - s

        for jd in joints:
            if jd is jfix:
                continue
            if jd.parent == p.name:
                jd.parent_vertex = np.asarray(jd.parent_vertex, np.float64) - s
            elif jd.child == p.name:
                jd.child_vertex = np.asarray(jd.child_vertex, np.float64) - s
            elif jd.parent == c.name:
                jd.parent = p.name
                jd.parent_vertex = to_parent(jd.parent_vertex)
                # translational displacement (expressed in the jd-parent's
                # body frame) rotates by R(off): d' = R(off)·d → tra axis
                # rotates.  The rotational displacement is EXACTLY unchanged
                # once off_jd' = off ∘ off_jd absorbs the frame change, so
                # the rot axis must stay.
                if jd.rot_axis is None:
                    jd.rot_axis = np.asarray(jd.axis, dtype=np.float64)
                jd.axis = R @ np.asarray(jd.axis, dtype=np.float64)
                jd.orientation_offset = nplie.qmul(
                    off, np.asarray(jd.orientation_offset, np.float64)
                )
            elif jd.child == c.name:
                jd.child = p.name
                jd.child_vertex = to_parent(jd.child_vertex)
                # q_child = q_merged ∘ off, so the relative rotation becomes
                # off_jd⁻¹ q_par⁻¹ q_m off = off⁻¹ ∘ [(off_jd off⁻¹)⁻¹
                # q_par⁻¹ q_m] ∘ off — a conjugation: rotation_vector picks up
                # R(off)ᵀ, i.e. the ROT axis rotates by R(off) while the
                # translational frame (parent side) is untouched.
                jd.rot_axis = R @ np.asarray(
                    jd.axis if jd.rot_axis is None else jd.rot_axis,
                    dtype=np.float64,
                )
                jd.orientation_offset = nplie.qmul(
                    np.asarray(jd.orientation_offset, np.float64),
                    nplie.qconj(off),
                )
        for cd in contacts:
            if cd.body == p.name:
                cd.origin = np.asarray(cd.origin, np.float64) - s
            elif cd.body == c.name:
                cd.body = p.name
                cd.origin = to_parent(cd.origin)
            if cd.child == p.name:
                cd.child_origin = np.asarray(cd.child_origin, np.float64) - s
                if cd.capsule is not None:
                    cd.capsule = (
                        np.asarray(cd.capsule[0], np.float64) - s,
                        np.asarray(cd.capsule[1], np.float64) - s,
                    )
                if cd.box is not None and np.linalg.norm(s) > 0:
                    # the box is centered on the child body's frame origin
                    # (contacts.sphere_box_geometry), which a COM shift moves
                    raise ValueError(
                        f"reduce_fixed_joints: box contact '{cd.name}' sits "
                        f"on merged body '{p.name}' whose COM shifts; box aux "
                        "stores sizes only (no center/frame) — keep the fixed "
                        "joint or re-author the contact."
                    )
            elif cd.child == c.name:
                cd.child = p.name
                cd.child_origin = to_parent(cd.child_origin)
                # frame-carrying child geometry: capsule endpoints transform
                # like points; a box stores only its sizes (its center and
                # axes are the child body frame), so a merge cannot be
                # represented — fail loudly rather than silently colliding
                # against a mis-placed box.
                if cd.capsule is not None:
                    cd.capsule = (to_parent(cd.capsule[0]),
                                  to_parent(cd.capsule[1]))
                if cd.box is not None:
                    raise ValueError(
                        f"reduce_fixed_joints: box contact '{cd.name}' is "
                        f"attached to merged body '{c.name}'; box aux stores "
                        "sizes only (no center/frame) — keep the fixed joint "
                        "or re-author the contact."
                    )
        joints.remove(jfix)
        bodies.remove(c)


def set_floating_base(bodies, joints, name):
    """Re-root the kinematic chain so body `name` hangs directly off the
    origin joint (reference mechanism/methods.jl set_floating_base:87-159).

    Operates on definition lists before build().  The joint chain from the
    origin's current subtree root down to `name` is reversed: each joint on
    the path swaps parent/child and vertices, negates its axes, and inverts
    its orientation offset; the origin-attached joint re-points its child to
    `name` (keeping its kind, e.g. floating).  Returns (bodies, joints) —
    contacts are body-attached and unaffected.
    """
    import copy

    bodies = [copy.deepcopy(b) for b in bodies]
    joints = [copy.deepcopy(j) for j in joints]

    child_to_joint = {}
    for jd in joints:
        if jd.child in child_to_joint:
            raise ValueError(
                f"set_floating_base: body '{jd.child}' has multiple parent "
                "joints (kinematic loop) — re-rooting a loop is unsupported"
            )
        child_to_joint[jd.child] = jd

    if name not in child_to_joint:
        raise ValueError(f"set_floating_base: unknown body '{name}'")
    chain = [child_to_joint[name]]
    while chain[-1].parent not in ("origin", "world"):
        chain.append(child_to_joint[chain[-1].parent])

    for jd in chain:
        if jd.parent in ("origin", "world"):
            jd.child = name
            continue
        off = np.asarray(jd.orientation_offset, np.float64)
        R = nplie.rotation_matrix(off)
        jd.parent, jd.child = jd.child, jd.parent
        jd.parent_vertex, jd.child_vertex = (
            np.asarray(jd.child_vertex, np.float64),
            np.asarray(jd.parent_vertex, np.float64),
        )
        # Reversal conjugates the rotational displacement — rotvec' =
        # −R(off)·rotvec — and maps the parent-frame translational
        # displacement by −R(off)ᵀ (on the constraint manifold), so the two
        # sub-joint axes transform differently.  The double negation keeps
        # minimal coordinates invariant, so spring offsets and limits carry
        # over unchanged.  (The reference uses plain −axis,
        # methods.jl:124-136 — exact only for identity offsets.)
        a_rot = np.asarray(
            jd.axis if jd.rot_axis is None else jd.rot_axis, np.float64
        )
        jd.rot_axis = -R @ a_rot
        jd.axis = -R.T @ np.asarray(jd.axis, np.float64)
        jd.orientation_offset = nplie.qconj(off)
    return bodies, joints


def _masks(axis, nlam):
    """constraint/nullspace mask rows (joints/joint.jl:56-64), zero-padded."""
    v1, v2, v3 = lie.orthogonal_rows(np.asarray(axis, dtype=np.float64))
    c = np.zeros((3, 3))
    n = np.zeros((3, 3))
    if nlam == 0:
        n[:] = np.eye(3)
    elif nlam == 1:
        c[0] = v3
        n[0], n[1] = v1, v2
    elif nlam == 2:
        c[0], c[1] = v1, v2
        n[0] = v3
    else:
        c[:] = np.eye(3)
    lam_mask = np.zeros(3)
    lam_mask[:nlam] = 1.0
    free_mask = np.zeros(3)
    free_mask[: 3 - nlam] = 1.0
    return c, n, lam_mask, free_mask


class Mechanism:
    """Compiled mechanism: static topology + parameter pytree + name maps.

    The analog of the reference Mechanism (src/mechanism/constructor.jl:19-44)
    with static type parameters replaced by `Topology` and all numeric model
    data in the `Params` pytree.
    """

    def __init__(self, topo, params, body_names, joint_names, contact_names,
                 joint_defs, body_shapes=None):
        self.topo = topo
        self.params = params
        self.body_names = list(body_names)
        self.joint_names = list(joint_names)
        self.contact_names = list(contact_names)
        self.joint_defs = joint_defs
        self.body_shapes = body_shapes or [None] * len(body_names)
        self.body_index = {n: i for i, n in enumerate(body_names)}
        self.joint_index = {n: i for i, n in enumerate(joint_names)}

    # -- convenience -------------------------------------------------------
    @property
    def input_dim(self):
        return self.topo.input_dim

    @property
    def minimal_dim(self):
        return self.topo.minimal_dim

    @property
    def timestep(self):
        return float(self.params.timestep)

    # cached jitted entry points ------------------------------------------
    def _cache(self, key, make):
        d = self.__dict__.setdefault("_fn_cache", {})
        if key not in d:
            d[key] = make()
        return d[key]

    def step(self, state, u=None, opts=None, params=None):
        """One simulation step (maximal in/out).  u: packed inputs
        (input_dim,) or None."""
        import jax

        from .core import SolverOptions
        from .residual import pad_inputs
        from .simulate import make_step

        opts = opts or SolverOptions()
        fn = self._cache(("step", opts), lambda: jax.jit(make_step(self.topo, opts)))
        up = None if u is None else pad_inputs(self.topo, jnp.asarray(u))
        return fn(params if params is not None else self.params, state, up)

    def simulate(self, state, horizon, us=None, opts=None, params=None):
        """Rollout for `horizon` steps; us: (T, input_dim) packed or None."""
        import jax

        from .core import SolverOptions
        from .residual import pad_inputs
        from .simulate import make_simulate

        opts = opts or SolverOptions()
        fn = self._cache(
            ("simulate", opts),
            lambda: jax.jit(
                make_simulate(self.topo, opts), static_argnames="horizon"
            ),
        )
        if us is not None:
            us = jax.vmap(lambda uu: pad_inputs(self.topo, uu))(jnp.asarray(us))
            return fn(params if params is not None else self.params, state, us)
        return fn(
            params if params is not None else self.params,
            state,
            None,
            horizon=horizon,
        )

    # -- parameter get/set (reference get.jl/set.jl/data.jl surface) --------
    _BODY_FIELDS = {"mass": "mass", "inertia": "inertia"}
    _JOINT_FIELDS = {
        "spring": ("tra_spring", "rot_spring"),
        "damper": ("tra_damper", "rot_damper"),
        "parent_vertex": ("tra_vertex_parent",),
        "child_vertex": ("tra_vertex_child",),
        "orientation_offset": ("rot_offset",),
    }
    _CONTACT_FIELDS = {
        "friction": "contact_friction",
        "origin": "contact_origin",
        "radius": "contact_radius",
        "offset": "contact_offset",
    }

    def get_body(self, name):
        """Body parameter view (reference get_body + data.jl body rows)."""
        i = self.body_index[name]
        return {k: self.params._asdict()[v][i] for k, v in self._BODY_FIELDS.items()}

    def get_joint(self, name):
        i = self.joint_index[name]
        return {
            k: self.params._asdict()[fields[0]][i]
            for k, fields in self._JOINT_FIELDS.items()
        }

    def get_contact(self, name):
        i = self.contact_names.index(name)
        return {k: self.params._asdict()[v][i] for k, v in self._CONTACT_FIELDS.items()}

    def _set_rows(self, index, mapping, kwargs):
        p = self.params
        for k, v in kwargs.items():
            fields = mapping[k]
            fields = (fields,) if isinstance(fields, str) else fields
            for f in fields:
                arr = getattr(p, f)
                p = p._replace(**{f: arr.at[index].set(jnp.asarray(v, arr.dtype))})
        return p

    def set_body(self, name, **kwargs):
        """Functional parameter update (reference set_data! body rows);
        returns the new Params (also stored on the mechanism)."""
        self.params = self._set_rows(self.body_index[name], self._BODY_FIELDS, kwargs)
        return self.params

    def set_joint(self, name, **kwargs):
        self.params = self._set_rows(self.joint_index[name], self._JOINT_FIELDS, kwargs)
        return self.params

    def set_contact(self, name, **kwargs):
        self.params = self._set_rows(
            self.contact_names.index(name), self._CONTACT_FIELDS, kwargs
        )
        return self.params

    # -- flat data vector (reference data.jl get_data/set_data!) ------------
    # The reference's data vector interleaves per-node [u, spring, damper],
    # body [m, J, v15, ω15, x2, q2], contact [friction, radius, origin]
    # (data.jl:6-195) because its gradients need one vector to differentiate
    # against.  Here gradients flow through (params, state, u) pytrees
    # directly, so the data vector is the *parameter* portion only: a
    # deterministic raveling of the physical Params fields, used for sysid
    # over all parameters at once and for flat checkpoint/export.
    _DATA_FIELDS = (
        "mass", "inertia",
        "tra_spring", "tra_damper", "tra_vertex_parent", "tra_vertex_child",
        "tra_spring_offset", "rot_spring", "rot_damper", "rot_offset",
        "rot_spring_offset",
        "contact_friction", "contact_radius", "contact_origin",
        "contact_offset", "contact_child_origin", "contact_child_radius",
        "contact_aux", "gravity", "timestep",
    )

    def get_data(self, params=None):
        """Flat vector of all physical parameters (masses, inertias, joint
        springs/dampers/vertices/offsets, contact geometry/friction, gravity,
        timestep) in `_DATA_FIELDS` order."""
        p = self.params if params is None else params
        return jnp.concatenate(
            [jnp.ravel(getattr(p, f)) for f in self._DATA_FIELDS]
        )

    def with_data(self, vec, params=None):
        """Functional inverse of get_data: Params with the flat vector
        scattered back into the physical fields (jit/grad-safe — use inside
        a loss for whole-vector system identification)."""
        p = self.params if params is None else params
        out, i = {}, 0
        for f in self._DATA_FIELDS:
            a = getattr(p, f)
            n = int(np.prod(a.shape)) if a.shape else 1
            out[f] = jnp.reshape(vec[i : i + n], a.shape).astype(a.dtype)
            i += n
        return p._replace(**out)

    def set_data(self, vec):
        """In-place variant (reference set_data!): stores and returns the
        updated Params."""
        self.params = self.with_data(vec)
        return self.params

    def minimal_state(self, state):
        from .minimal import maximal_to_minimal

        return maximal_to_minimal(self.topo, self.params, state)

    def maximal_state(self, y):
        from .minimal import minimal_to_maximal

        return minimal_to_maximal(self.topo, self.params, y)

    def set_minimal(self, state, joint, coords=None, velocities=None):
        from .minimal import set_joint_minimal

        j = joint if isinstance(joint, int) else self.joint_index[joint]
        return set_joint_minimal(
            self.topo, self.params, state, j, coords, velocities
        )

    def cast(self, dtype) -> "Mechanism":
        """Cast floating-point params to ``dtype`` host-side and re-upload
        the whole pytree in ONE batched device_put (a per-leaf tree-map of
        .astype would be ~40 eager device ops — multi-second round trips
        each on a TPU relay).  Mutates and returns self."""
        np_p = getattr(self, "_np_params", None)
        if np_p is None:
            np_p = jax.tree.map(np.asarray, self.params)
        np_p = jax.tree.map(
            lambda a: a.astype(dtype)
            if np.issubdtype(a.dtype, np.floating)
            else a,
            np_p,
        )
        self._np_params = np_p
        self.params = jax.device_put(np_p)
        return self

    def zero_state(self) -> BodyState:
        """Zero-coordinate forward-kinematics placement
        (reference zero_coordinates!, mechanism/set.jl:94-107)."""
        nb = self.topo.nb
        x = np.zeros((nb, 3))
        q = np.tile(np.array([1.0, 0, 0, 0]), (nb, 1))
        src = getattr(self, "_np_params", self.params)
        pv = np.asarray(src.tra_vertex_parent)
        cv = np.asarray(src.tra_vertex_child)
        off = np.asarray(src.rot_offset)
        for j in self.topo.root_to_leaves:
            if j in self.topo.loop_joints:
                continue
            p, c = self.topo.joint_parent[j], self.topo.joint_child[j]
            xa = np.zeros(3) if p < 0 else x[p]
            qa = np.array([1.0, 0, 0, 0]) if p < 0 else q[p]
            qb = nplie.qmul(qa, off[j])
            xb = xa + nplie.rotate(pv[j], qa) - nplie.rotate(cv[j], qb)
            x[c], q[c] = xb, qb
        dtype = np.dtype(self.params.mass.dtype)
        # numpy leaves: zero device round-trips here; jit callers transfer
        # the whole state in one batched put
        return BodyState(
            x=np.asarray(x, dtype),
            q=np.asarray(q, dtype),
            v=np.zeros((nb, 3), dtype),
            w=np.zeros((nb, 3), dtype),
        )


def build(
    bodies: Sequence[Body],
    joints: Sequence[JointDef],
    contacts: Sequence[ContactDef] = (),
    timestep: float = 0.01,
    gravity=(0.0, 0.0, -9.81),
    dtype=None,
) -> Mechanism:
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # respects jax_enable_x64
    nb, nj, nc = len(bodies), len(joints), len(contacts)
    body_names = [b.name for b in bodies]
    bidx = {"origin": -1, "world": -1}
    bidx.update({n: i for i, n in enumerate(body_names)})

    # limit pad width
    maxlim = 0
    for jd in joints:
        for lim, (nfree) in ((jd.tra_limits, 3 - KIND_NLAM[jd.kind][0]),
                             (jd.rot_limits, 3 - KIND_NLAM[jd.kind][1])):
            if lim is not None:
                maxlim = max(maxlim, len(np.atleast_1d(lim[0])))
    cw = max((CONTACT_WIDTH[c.kind] for c in contacts), default=0)

    # topology ordering: BFS from origin (traversal.jl root_to_leaves)
    children = {}
    for j, jd in enumerate(joints):
        children.setdefault(bidx[jd.parent], []).append(j)
    order, seen_bodies, loop = [], {-1}, []
    frontier = [-1]
    while frontier:
        b = frontier.pop(0)
        for j in children.get(b, []):
            c = bidx[joints[j].child]
            if c in seen_bodies:
                loop.append(j)
                continue
            order.append(j)
            seen_bodies.add(c)
            frontier.append(c)
    for j in range(nj):  # loop-closing joints appended last
        if j not in order:
            if j not in loop:
                loop.append(j)
            order.append(j)

    topo = Topology(
        nb=nb,
        nj=nj,
        nc=nc,
        maxlim=maxlim,
        cw=cw,
        joint_parent=tuple(bidx[j.parent] for j in joints),
        joint_child=tuple(bidx[j.child] for j in joints),
        contact_parent=tuple(bidx[c.body] for c in contacts),
        contact_child=tuple(
            bidx[c.child] if c.child is not None else -1 for c in contacts
        ),
        contact_kind=tuple(c.kind for c in contacts),
        contact_geom=tuple(c.geom for c in contacts),
        tra_nfree=tuple(3 - KIND_NLAM[j.kind][0] for j in joints),
        rot_nfree=tuple(3 - KIND_NLAM[j.kind][1] for j in joints),
        root_to_leaves=tuple(order),
        loop_joints=tuple(loop),
    )

    # joint parameter arrays
    def zeros(*s):
        return np.zeros(s)

    tra_cmask, tra_nmask = zeros(nj, 3, 3), zeros(nj, 3, 3)
    rot_cmask, rot_nmask = zeros(nj, 3, 3), zeros(nj, 3, 3)
    tra_lam, tra_free = zeros(nj, 3), zeros(nj, 3)
    rot_lam, rot_free = zeros(nj, 3), zeros(nj, 3)
    tvp, tvc = zeros(nj, 3), zeros(nj, 3)
    roff = np.tile(np.array([1.0, 0, 0, 0]), (nj, 1))
    t_spring, t_damper = zeros(nj), zeros(nj)
    r_spring, r_damper = zeros(nj), zeros(nj)
    t_soff, r_soff = zeros(nj, 3), zeros(nj, 3)
    ML = max(maxlim, 0)
    t_lo, t_hi, t_lm = zeros(nj, ML), zeros(nj, ML), zeros(nj, ML)
    r_lo, r_hi, r_lm = zeros(nj, ML), zeros(nj, ML), zeros(nj, ML)

    for j, jd in enumerate(joints):
        nl_t, nl_r = KIND_NLAM[jd.kind]
        tra_cmask[j], tra_nmask[j], tra_lam[j], tra_free[j] = _masks(jd.axis, nl_t)
        rot_cmask[j], rot_nmask[j], rot_lam[j], rot_free[j] = _masks(
            jd.axis if jd.rot_axis is None else jd.rot_axis, nl_r
        )
        tvp[j] = np.asarray(jd.parent_vertex, dtype=np.float64)
        tvc[j] = np.asarray(jd.child_vertex, dtype=np.float64)
        o = np.asarray(jd.orientation_offset, dtype=np.float64)
        roff[j] = o / np.linalg.norm(o)
        t_spring[j] = r_spring[j] = jd.spring
        t_damper[j] = r_damper[j] = jd.damper
        if jd.tra_spring_offset is not None:
            t_soff[j, : 3 - nl_t] = np.atleast_1d(jd.tra_spring_offset)
        if jd.rot_spring_offset is not None:
            r_soff[j, : 3 - nl_r] = np.atleast_1d(jd.rot_spring_offset)
        if jd.tra_limits is not None:
            lo, hi = (np.atleast_1d(v) for v in jd.tra_limits)
            t_lo[j, : len(lo)], t_hi[j, : len(hi)] = lo, hi
            t_lm[j, : len(lo)] = 1.0
        if jd.rot_limits is not None:
            lo, hi = (np.atleast_1d(v) for v in jd.rot_limits)
            r_lo[j, : len(lo)], r_hi[j, : len(hi)] = lo, hi
            r_lm[j, : len(lo)] = 1.0

    # contact parameter arrays (orthogonal_columns → normal/tangent rows,
    # reference nonlinear.jl:28-45)
    c_fric, c_rad = zeros(nc), zeros(nc)
    c_norm, c_orig, c_off = zeros(nc, 3), zeros(nc, 3), zeros(nc, 3)
    c_tan = zeros(nc, 2, 3)
    c_corig, c_crad = zeros(nc, 3), zeros(nc)
    c_aux = zeros(nc, 6)
    for c, cd in enumerate(contacts):
        v1, v2, v3 = lie.orthogonal_rows(np.asarray(cd.normal, dtype=np.float64))
        A = np.stack([v1, v2, v3], axis=1)  # columns
        Ainv = np.linalg.inv(A)
        c_norm[c] = Ainv[2]
        c_tan[c] = Ainv[:2]
        c_fric[c] = cd.friction
        c_orig[c] = np.asarray(cd.origin, dtype=np.float64)
        c_rad[c] = cd.radius
        c_off[c] = np.asarray(cd.offset, dtype=np.float64)
        c_corig[c] = np.asarray(cd.child_origin, dtype=np.float64)
        c_crad[c] = cd.child_radius
        if cd.capsule is not None:
            c_aux[c, :3] = np.asarray(cd.capsule[0], dtype=np.float64)
            c_aux[c, 3:6] = np.asarray(cd.capsule[1], dtype=np.float64)
        elif cd.box is not None:
            c_aux[c, :3] = np.asarray(cd.box, dtype=np.float64)
        elif cd.string_length is not None:
            c_aux[c, 0] = float(cd.string_length)

    # Build every leaf in numpy and ship the whole pytree with ONE batched
    # jax.device_put below — per-leaf jnp.asarray would be ~40 separate
    # host→device transfers, each a multi-second round trip on a TPU relay.
    np_dtype = np.dtype(dtype)
    a = lambda x: np.asarray(x, np_dtype)
    params = Params(
        mass=a([b.mass for b in bodies]),
        inertia=a(np.stack([b.inertia_matrix() for b in bodies]))
        if nb
        else a(zeros(0, 3, 3)),
        tra_cmask=a(tra_cmask),
        tra_nmask=a(tra_nmask),
        tra_lam_mask=a(tra_lam),
        tra_free_mask=a(tra_free),
        tra_vertex_parent=a(tvp),
        tra_vertex_child=a(tvc),
        tra_spring=a(t_spring),
        tra_damper=a(t_damper),
        tra_spring_offset=a(t_soff),
        tra_lim_lo=a(t_lo),
        tra_lim_hi=a(t_hi),
        tra_lim_mask=a(t_lm),
        rot_cmask=a(rot_cmask),
        rot_nmask=a(rot_nmask),
        rot_lam_mask=a(rot_lam),
        rot_free_mask=a(rot_free),
        rot_offset=a(roff),
        rot_spring=a(r_spring),
        rot_damper=a(r_damper),
        rot_spring_offset=a(r_soff),
        rot_lim_lo=a(r_lo),
        rot_lim_hi=a(r_hi),
        rot_lim_mask=a(r_lm),
        contact_friction=a(c_fric),
        contact_normal=a(c_norm),
        contact_tangent=a(c_tan),
        contact_origin=a(c_orig),
        contact_radius=a(c_rad),
        contact_offset=a(c_off),
        contact_child_origin=a(c_corig),
        contact_child_radius=a(c_crad),
        contact_aux=a(c_aux),
        gravity=a(np.asarray(gravity, dtype=np.float64)),
        timestep=a(timestep),
    )
    np_params = params
    params = jax.device_put(params)
    mech = Mechanism(
        topo,
        params,
        body_names,
        [jd.name or f"joint_{i}" for i, jd in enumerate(joints)],
        [cd.name or f"contact_{i}" for i, cd in enumerate(contacts)],
        list(joints),
        [b.shape for b in bodies],
    )
    mech._np_params = np_params  # host copies for build-time helpers
    return mech
