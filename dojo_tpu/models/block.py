"""Free bodies with contact (reference mechanisms/{block,block2d,sphere,
dzhanibekov,tippetop}/mechanism.jl)."""

import jax.numpy as jnp
import numpy as np

from .. import builder as bd
from ..core import BodyState
from . import register, register_init

X, Y, Z = np.eye(3)


@register("block")
def get_block(
    timestep=0.01,
    gravity=-9.81,
    mass=1.0,
    edge_length=0.5,
    friction_coefficient=0.8,
    contact=True,
    contact_radius=0.0,
    contact_type="nonlinear",
):
    block = bd.box_body("block", edge_length, edge_length, edge_length, mass)
    joint = bd.JointDef(kind="floating", parent="origin", child="block")
    contacts = []
    if contact:
        e = edge_length / 2
        corners = [
            [e, e, -e], [e, -e, -e], [-e, e, -e], [-e, -e, -e],
            [e, e, e], [e, -e, e], [-e, e, e], [-e, -e, e],
        ]
        contacts = [
            bd.ContactDef(
                body="block",
                kind=contact_type,
                normal=Z,
                friction=friction_coefficient,
                origin=c,
                radius=contact_radius,
                name=f"contact{i}",
            )
            for i, c in enumerate(corners)
        ]
    return bd.build(
        [block], [joint], contacts, timestep=timestep, gravity=(0, 0, gravity)
    )


@register_init("block")
def initialize_block(
    mech, position=(0, 0, 1.0), orientation=(1.0, 0, 0, 0), velocity=(0, 0, 0),
    angular_velocity=(0, 0, 0),
):
    s = mech.zero_state()
    dt = s.x.dtype
    return BodyState(
        x=jnp.asarray([position], dt),
        q=jnp.asarray([orientation], dt) / jnp.linalg.norm(jnp.asarray(orientation).astype(dt)),
        v=jnp.asarray([velocity], dt),
        w=jnp.asarray([angular_velocity], dt),
    )


@register("sphere")
def get_sphere(
    timestep=0.01,
    gravity=-9.81,
    mass=1.0,
    radius=0.5,
    friction_coefficient=0.8,
    contact=True,
    contact_type="nonlinear",
):
    sphere = bd.sphere_body("sphere", radius, mass)
    joint = bd.JointDef(kind="floating", parent="origin", child="sphere")
    contacts = (
        [
            bd.ContactDef(
                body="sphere",
                kind=contact_type,
                normal=Z,
                friction=friction_coefficient,
                radius=radius,
            )
        ]
        if contact
        else []
    )
    return bd.build(
        [sphere], [joint], contacts, timestep=timestep, gravity=(0, 0, gravity)
    )


@register_init("sphere")
def initialize_sphere(
    mech, position=(0, 0, 0.5), orientation=(1.0, 0, 0, 0), velocity=(1.0, 0, 0),
    angular_velocity=(0, 0, 0),
):
    return initialize_block(mech, position, orientation, velocity, angular_velocity)


@register("dzhanibekov")
def get_dzhanibekov(timestep=0.01, gravity=0.0, mass=1.0):
    """Tumbling T-handle (reference mechanisms/dzhanibekov) — asymmetric
    rigid body exercising the intermediate-axis instability."""
    main = bd.box_body("main", 0.1, 0.1, 1.0, mass)
    side = bd.box_body("side", 0.1, 0.1, 0.4, mass / 2)
    joints = [
        bd.JointDef(kind="floating", parent="origin", child="main"),
        bd.JointDef(
            kind="fixed",
            parent="main",
            child="side",
            parent_vertex=[0.1, 0, 0],
            child_vertex=[0, 0, -0.2],
            orientation_offset=[np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0],
        ),
    ]
    return bd.build([main, side], joints, timestep=timestep, gravity=(0, 0, gravity))


@register_init("dzhanibekov")
def initialize_dzhanibekov(mech, angular_velocity=(2.0, 0.01, 0.0)):
    from ..minimal import maximal_to_minimal, minimal_to_maximal

    s = mech.zero_state()
    y = maximal_to_minimal(mech.topo, mech.params, s)
    # floating joint velocities: [Δv(3); Δω(3)] at offsets 6:12
    y = y.at[9:12].set(jnp.asarray(angular_velocity, y.dtype))
    return minimal_to_maximal(mech.topo, mech.params, y)


@register("tippetop")
def get_tippetop(
    timestep=0.01,
    gravity=-9.81,
    friction_coefficient=0.4,
    contact=True,
    contact_type="nonlinear",
):
    """Spinning top that flips upside-down (reference mechanisms/tippetop)."""
    r1, r2 = 0.5, 0.175
    m1, m2 = 1.0, 0.2
    ball = bd.sphere_body("ball", r1, m1)
    stem = bd.sphere_body("stem", r2, m2)
    joints = [
        bd.JointDef(kind="floating", parent="origin", child="ball"),
        bd.JointDef(
            kind="fixed",
            parent="ball",
            child="stem",
            parent_vertex=[0, 0, r1 + r2 / 2],
        ),
    ]
    contacts = (
        [
            bd.ContactDef(
                body="ball", kind=contact_type, normal=Z,
                friction=friction_coefficient, radius=r1,
            ),
            bd.ContactDef(
                body="stem", kind=contact_type, normal=Z,
                friction=friction_coefficient, radius=r2,
            ),
        ]
        if contact
        else []
    )
    return bd.build(
        [ball, stem], joints, contacts, timestep=timestep, gravity=(0, 0, gravity)
    )


@register_init("tippetop")
def initialize_tippetop(mech, angular_velocity=(0.01, 0.0, 50.0)):
    from ..minimal import maximal_to_minimal, minimal_to_maximal

    s = mech.zero_state()
    # lift so the ball rests on the floor
    s = s._replace(x=s.x + jnp.asarray([0.0, 0.0, 0.5], s.x.dtype))
    y = maximal_to_minimal(mech.topo, mech.params, s)
    y = y.at[9:12].set(jnp.asarray(angular_velocity, y.dtype))
    return minimal_to_maximal(mech.topo, mech.params, y)
