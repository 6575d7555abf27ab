"""Energy/momentum conservation sweep across joint kinds × springs
(reference test/energy.jl:1-641, test/momentum.jl:1-381 pattern): a
free-floating two-body assembly exchanges energy/momentum only internally,
so total linear/angular momentum is exactly conserved (discrete-Legendre
property of the variational integrator) and mechanical energy shows bounded
symplectic oscillation with no drift.

All cases share one array shape (2 bodies, 2 joints, maxlim=0), so XLA's
persistent cache compiles the step once for the whole sweep."""

import jax.numpy as jnp
import numpy as np
import pytest

import dojo_tpu as dt

from util import energy_momentum, rollout

KINDS = [
    "revolute", "prismatic", "spherical", "cylindrical", "planar",
    "fixed_orientation", "orbital", "prismatic_orbital", "planar_axis",
    "cylindrical_free", "planar_free", "free_revolute",
]


def _mech(kind, spring):
    bodies = [
        dt.box_body("a", 0.1, 0.12, 0.4, 1.0),
        dt.box_body("b", 0.14, 0.1, 0.3, 0.7),
    ]
    joints = [
        dt.JointDef(kind="floating", parent="origin", child="a"),
        dt.JointDef(kind=kind, parent="a", child="b",
                    axis=np.array([0.3, 0.0, 0.954]) / 0.99955,
                    parent_vertex=[0, 0, -0.2], child_vertex=[0, 0, 0.15],
                    spring=spring),
    ]
    return dt.build(bodies, joints, [], timestep=0.01, gravity=(0, 0, 0))


@pytest.mark.slow
@pytest.mark.parametrize("spring", [0.0, 12.0])
@pytest.mark.parametrize("kind", KINDS)
def test_conservation_sweep(kind, spring):
    mech = _mech(kind, spring)
    state = mech.zero_state()._replace(
        v=jnp.asarray([[0.3, -0.1, 0.2], [0.3, -0.1, 0.2]]),
        w=jnp.asarray([[0.4, 1.1, -0.3], [0.4, 1.1, -0.3]]),
    )
    final, tr = rollout(mech, state, 150)
    assert tr["success"].all(), (kind, spring)
    me, pl, pa = energy_momentum(mech, tr)
    # skip the first samples: the rigid-rotation initial condition violates
    # the joint velocity manifold; internal constraint impulses resolve it
    # without changing the totals
    me, pl, pa = me[2:], pl[2:], pa[2:]
    scale = max(1.0, float(jnp.abs(me[0])))
    assert float(jnp.abs(pl - pl[0]).max()) < 1e-9, (kind, spring)
    assert float(jnp.abs(pa - pa[0]).max()) < 1e-6, (kind, spring)
    # bounded energy oscillation (symplectic), no secular drift
    assert float(jnp.abs(me - me[0]).max()) / scale < 2e-2, (kind, spring)
    drift = abs(float(me[-1] - me[:20].mean()))
    assert drift / scale < 1e-2, (kind, spring, drift)
