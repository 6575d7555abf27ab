"""Real-mechanism conservation sweeps (reference test/energy.jl:1-641,
test/momentum.jl:1-381): snake + twister chains across joint kinds ×
spring regimes, plus a humanoid astronaut drift case.  Gravity-free,
contact-free long rollouts — total linear/angular momentum is exactly
conserved by the variational integrator (discrete-Legendre property) and
mechanical energy shows bounded symplectic oscillation with no secular
drift.

All chain cases share one array shape (4 bodies / 4 joints / maxlim 0), so
the jitted step compiles once for the whole sweep (the masked-joint-kernel
design pays off exactly here)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import models

from util import energy_momentum, rollout

# reference energy.jl sweeps :Revolute/:Prismatic/:Spherical/:Cylindrical
# (+ planar variants in momentum.jl) with spring ∈ {0, >0}
KINDS = ["Spherical", "Revolute", "Prismatic", "Cylindrical", "Planar"]


def _chain_state(mech, seed):
    """Zero pose + smooth rigid-body-ish initial velocities (the reference
    initializes with random minimal velocities; a shared twist keeps early
    constraint-projection impulses small)."""
    rng = np.random.default_rng(seed)
    nb = mech.topo.nb
    base_v = rng.normal(scale=0.3, size=3)
    base_w = rng.normal(scale=0.5, size=3)
    state = mech.zero_state()
    return state._replace(
        v=jnp.asarray(np.tile(base_v, (nb, 1))),
        w=jnp.asarray(np.tile(base_w, (nb, 1))),
    )


@pytest.mark.slow
@pytest.mark.parametrize("spring", [0.0, 20.0])
@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("model", ["snake", "twister"])
def test_chain_conservation(model, kind, spring):
    mech = models.get_mechanism(
        model, num_bodies=4, joint_type=kind, springs=spring, dampers=0.0,
        gravity=0.0, contact=False,
    )
    state = _chain_state(mech, seed=hash((model, kind)) % 2**16)
    final, tr = rollout(mech, state, 300)  # 3 s at h=0.01
    assert tr["success"].all(), (model, kind, spring)
    me, pl, pa = energy_momentum(mech, tr)
    # skip the constraint-projection transient (see test_conservation.py)
    me, pl, pa = me[2:], pl[2:], pa[2:]
    # exact momentum conservation (momentum.jl tolerances 1e-8…1e-6)
    assert float(jnp.abs(pl - pl[0]).max()) < 1e-8, (model, kind, spring)
    assert float(jnp.abs(pa - pa[0]).max()) < 1e-6, (model, kind, spring)
    # energy: bounded symplectic oscillation, no secular drift — compare
    # first/last-quarter means (energy.jl drift tolerances)
    scale = max(1.0, float(jnp.abs(me).max()))
    q = len(me) // 4
    drift = abs(float(me[-q:].mean() - me[:q].mean())) / scale
    assert drift < 1e-4, (model, kind, spring, drift)


@pytest.mark.slow
def test_humanoid_astronaut_drift():
    """Floating humanoid in zero gravity with initial twist (reference
    momentum.jl humanoid/atlas astronaut cases): momentum exactly conserved,
    energy drift-free over 2 s."""
    mech = models.get_mechanism(
        "humanoid", gravity=0.0, contact_feet=False, parse_dampers=False
    )
    state = models.initialize(mech, "humanoid")
    nb = mech.topo.nb
    state = state._replace(
        v=state.v + jnp.asarray(np.tile([0.1, -0.05, 0.2], (nb, 1))),
        w=state.w + jnp.asarray(np.tile([0.2, 0.4, -0.1], (nb, 1))),
    )
    final, tr = rollout(mech, state, 200)
    assert tr["success"].all()
    me, pl, pa = energy_momentum(mech, tr)
    me, pl, pa = me[2:], pl[2:], pa[2:]
    assert float(jnp.abs(pl - pl[0]).max()) < 1e-8
    assert float(jnp.abs(pa - pa[0]).max()) < 1e-6
    scale = max(1.0, float(jnp.abs(me).max()))
    q = len(me) // 4
    drift = abs(float(me[-q:].mean() - me[:q].mean())) / scale
    assert drift < 1e-4, drift
