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
