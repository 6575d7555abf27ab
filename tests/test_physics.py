"""Physical-invariant tests (reference test/energy.jl, test/momentum.jl,
test/behaviors.jl strategy): conservation and rest behaviors are the
backend-independent oracles for a physics engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dojo_tpu as dt
from dojo_tpu import mechanics, models
from dojo_tpu.core import SolverOptions
from dojo_tpu.residual import make_context

TIGHT = SolverOptions(rtol=1e-10, btol=1e-10)


def mechanical_energy(mech, traj):
    def diag(x, q, v, w, wsol):
        st = dt.BodyState(x=x, q=q, v=v, w=w)
        ctx = make_context(mech.topo, st, mech.params)
        pl, pa = mechanics.momentum(mech.topo, mech.params, st, wsol, ctx)
        vl, wl = mechanics.momentum_consistent_velocities(mech.params, st, pl, pa)
        ke = mechanics.kinetic_energy(mech.params, vl, wl)
        pe = mechanics.potential_energy(mech.topo, mech.params, st)
        return ke + pe, pl.sum(0), pa.sum(0)

    return jax.vmap(diag)(traj.x, traj.q, traj.v, traj.w, traj.info.w)


def test_free_body_conservation():
    """Torque-free tumbling body: energy + both momenta conserved
    (dzhanibekov-style; reference test/energy.jl astronaut cases)."""
    b = dt.Body("brick", 1.0, np.diag([1.9, 2.1, 3.2]))
    j = dt.JointDef(kind="floating", parent="origin", child="brick")
    mech = dt.build([b], [j], timestep=0.01, gravity=(0, 0, 0))
    state = mech.zero_state()._replace(
        w=jnp.array([[0.2, 3.0, 0.01]]), v=jnp.array([[0.3, -0.2, 0.1]])
    )
    final, traj = mech.simulate(state, 300, opts=TIGHT)
    assert bool(traj.info.success.all())
    me, pl, pa = mechanical_energy(mech, traj)
    assert float(jnp.abs(me - me[0]).max()) < 1e-8
    assert float(jnp.abs(pl - pl[0]).max()) < 1e-12
    assert float(jnp.abs(pa - pa[0]).max()) < 1e-8
    assert float(jnp.abs(jnp.linalg.norm(traj.q, axis=-1) - 1).max()) < 1e-12


def test_pendulum_energy_and_constraint():
    mech = models.get_mechanism("pendulum", timestep=0.01)
    state = models.initialize(mech, "pendulum", angle=0.6, angular_velocity=1.3)
    final, traj = mech.simulate(state, 300, opts=TIGHT)
    assert bool(traj.info.success.all())
    assert int(traj.info.iterations.max()) <= 3
    me, _, _ = mechanical_energy(mech, traj)
    # variational integrator: bounded energy oscillation, no drift
    assert float(jnp.abs(me - me[0]).max()) < 2e-3
    # pivot point stays fixed (joint constraint satisfied)
    from dojo_tpu import lie

    arm = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (300, 1))
    pivot = traj.x[:, 0, :] + jax.vmap(lie.rotate)(arm, traj.q[:, 0, :])
    assert float(jnp.abs(pivot - pivot[0]).max()) < 1e-8


def test_minimal_roundtrip():
    mech = models.get_mechanism("pendulum")
    state = models.initialize(mech, "pendulum", angle=0.37, angular_velocity=-0.9)
    y = mech.minimal_state(state)
    np.testing.assert_allclose(np.asarray(y), [0.37, -0.9], atol=1e-12)
    s2 = mech.maximal_state(y)
    np.testing.assert_allclose(np.asarray(s2.pack()), np.asarray(state.pack()), atol=1e-12)


def test_cartpole_roundtrip_and_sim():
    mech = models.get_mechanism("cartpole")
    state = models.initialize(mech, "cartpole", position=0.1, orientation=0.4)
    y = mech.minimal_state(state)
    np.testing.assert_allclose(np.asarray(y), [0.1, 0.4, 0, 0], atol=1e-10)
    final, traj = mech.simulate(state, 50, opts=SolverOptions())
    assert bool(traj.info.success.all())


@pytest.mark.slow
def test_box_toss_rest():
    """Reference test/behaviors.jl:21-40 — box comes to rest at the correct
    height with tiny residual velocity."""
    h = 0.01
    mech = models.get_mechanism("block", timestep=h, friction_coefficient=0.1)
    state = models.initialize(
        mech,
        "block",
        position=[0, 0, 0.5],
        velocity=[1.0, 1.5, 1.0],
        angular_velocity=np.array([5.0, 4.0, 2.0]) * h,
    )
    opts = SolverOptions(rtol=1e-6, btol=1e-6)
    final, traj = mech.simulate(state, int(5.0 / h), opts=opts)
    assert bool(traj.info.success.all())
    assert float(jnp.abs(final.v).max()) < 1e-8
    assert abs(float(final.x[0, 2]) - 0.25) < 1e-3
    # no penetration at any step (SDF ≥ 0 analog)
    assert float(traj.x[:, 0, 2].min()) > 0.25 - 1e-5


def test_spring_damper_pendulum():
    """Springs store energy (total conserved); dampers dissipate."""
    mech = models.get_mechanism("pendulum", springs=20.0, timestep=0.01)
    state = models.initialize(mech, "pendulum", angle=0.9, angular_velocity=0.0)
    final, traj = mech.simulate(state, 200, opts=TIGHT)
    me, _, _ = mechanical_energy(mech, traj)
    assert float(jnp.abs(me - me[0]).max()) < 5e-3

    mech_d = models.get_mechanism("pendulum", dampers=2.0, timestep=0.01)
    state = models.initialize(mech_d, "pendulum", angle=0.9, angular_velocity=0.0)
    final, traj = mech_d.simulate(state, 400, opts=SolverOptions())
    # damped pendulum settles toward hanging equilibrium (angle → 0 ± small)
    y_end = mech_d.minimal_state(final)
    assert abs(float(y_end[1])) < 0.2  # velocity nearly gone
