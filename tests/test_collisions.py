"""Collision-pair tests (reference test/collisions.jl strategy: drop/rest
behaviors per pair)."""

import jax.numpy as jnp
import numpy as np
import pytest

import dojo_tpu as dt
from dojo_tpu.core import SolverOptions

from util import rollout


def test_sphere_sphere_stack():
    """Sphere dropped onto a resting sphere: no interpenetration, settles."""
    r1, r2 = 0.3, 0.2
    bottom = dt.sphere_body("bottom", r1, 2.0)
    top = dt.sphere_body("top", r2, 1.0)
    joints = [
        dt.JointDef(kind="floating", parent="origin", child="bottom"),
        dt.JointDef(kind="floating", parent="origin", child="top"),
    ]
    contacts = [
        dt.ContactDef(body="bottom", normal=[0, 0, 1], friction=0.5, radius=r1),
        dt.ContactDef(body="top", normal=[0, 0, 1], friction=0.5, radius=r2),
        dt.ContactDef(
            body="top", child="bottom", friction=0.5,
            radius=r2, child_radius=r1, name="pair",
        ),
    ]
    mech = dt.build(
        [bottom, top], joints, contacts, timestep=0.01, gravity=(0, 0, -9.81)
    )
    state = mech.zero_state()._replace(
        x=jnp.asarray([[0.0, 0.0, r1], [0.02, 0.0, 2 * r1 + r2 + 0.15]])
    )
    opts = SolverOptions(rtol=1e-6, btol=1e-4)
    final, tr = rollout(mech, state, 60, opts=opts)
    assert np.all(np.isfinite(np.asarray(final.pack())))
    # no interpenetration at any recorded step
    gap = np.linalg.norm(
        np.asarray(tr["x"][:, 1] - tr["x"][:, 0]), axis=-1
    ) - (r1 + r2)
    assert gap.min() > -5e-4, gap.min()
    # bottom sphere stays on the floor
    assert abs(float(final.x[0, 2]) - r1) < 5e-3


def test_sphere_capsule_rest():
    """Sphere dropped onto a fixed horizontal capsule settles on top
    (reference test/collisions.jl sphere-capsule drop behavior;
    collisions/sphere_capsule.jl)."""
    cap = dt.Body(name="cap", mass=2.0, inertia=np.eye(3) * 0.1)
    ball = dt.sphere_body("ball", 0.1, 0.5)
    mech = dt.build(
        [cap, ball],
        [
            dt.JointDef(kind="fixed", parent="origin", child="cap"),
            dt.JointDef(kind="floating", parent="origin", child="ball"),
        ],
        [
            dt.ContactDef(
                body="ball", child="cap", friction=0.4, radius=0.1,
                child_radius=0.15, capsule=([-0.5, 0, 0], [0.5, 0, 0]),
            )
        ],
        timestep=0.01, gravity=(0, 0, -9.81),
    )
    state = mech.zero_state()._replace(
        x=jnp.asarray([[0.0, 0.0, 0.0], [0.02, 0.0, 0.6]])
    )
    final, tr = rollout(mech, state, 120, opts=SolverOptions(rtol=1e-8, btol=1e-6))
    assert np.all(tr["success"])
    # rests on top of the capsule: z = r_capsule + r_ball
    assert abs(float(final.x[1, 2]) - 0.25) < 2e-3
    assert abs(float(final.v[1, 2])) < 1e-4


def test_sphere_box_rest():
    """Sphere dropped onto a fixed box settles on the top face
    (collisions/sphere_box.jl + point_to_box_v2.jl clamp closest point)."""
    box = dt.box_body("box", 0.6, 0.6, 0.4, 5.0)
    ball = dt.sphere_body("ball", 0.1, 0.5)
    mech = dt.build(
        [box, ball],
        [
            dt.JointDef(kind="fixed", parent="origin", child="box"),
            dt.JointDef(kind="floating", parent="origin", child="ball"),
        ],
        [
            dt.ContactDef(
                body="ball", child="box", friction=0.4, radius=0.1,
                box=[0.6, 0.6, 0.4],
            )
        ],
        timestep=0.01, gravity=(0, 0, -9.81),
    )
    state = mech.zero_state()._replace(
        x=jnp.asarray([[0.0, 0.0, 0.0], [0.03, 0.01, 0.8]])
    )
    final, tr = rollout(mech, state, 120, opts=SolverOptions(rtol=1e-8, btol=1e-6))
    assert np.all(tr["success"])
    # rests on the box top: z = h/2 + r_ball
    assert abs(float(final.x[1, 2]) - 0.3) < 2e-3
    assert abs(float(final.v[1, 2])) < 1e-4


def test_string_pendulum():
    """Ball on a taut string hangs at exactly the string length below the
    anchor (collisions/string.jl negative-distance cone)."""
    anchor = dt.Body(name="anchor", mass=1.0, inertia=np.eye(3) * 0.01)
    ball = dt.sphere_body("ball", 0.1, 0.5)
    mech = dt.build(
        [anchor, ball],
        [
            dt.JointDef(kind="fixed", parent="origin", child="anchor",
                        parent_vertex=[0, 0, 1.0]),
            dt.JointDef(kind="floating", parent="origin", child="ball"),
        ],
        [
            dt.ContactDef(
                body="ball", child="anchor", friction=0.0, kind="impact",
                string_length=0.5,
            )
        ],
        timestep=0.01, gravity=(0, 0, -9.81),
    )
    state = mech.zero_state()._replace(
        x=jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 0.8]])
    )
    final, tr = rollout(mech, state, 250, opts=SolverOptions(rtol=1e-8, btol=1e-6))
    assert np.all(tr["success"])
    sep = float(jnp.linalg.norm(final.x[1] - final.x[0]))
    assert abs(sep - 0.5) < 2e-3  # taut at max length
    assert abs(float(final.x[1, 2]) - 0.5) < 5e-3  # hangs straight down
