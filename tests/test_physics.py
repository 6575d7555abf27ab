"""Physical-invariant tests (reference test/energy.jl, test/momentum.jl,
test/behaviors.jl strategy): conservation and rest behaviors are the
backend-independent oracles for a physics engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dojo_tpu as dt
from dojo_tpu import models

from util import OPTS, energy_momentum, rollout


def test_free_body_conservation():
    """Torque-free tumbling body: energy + both momenta conserved
    (dzhanibekov-style; reference test/energy.jl astronaut cases)."""
    b = dt.Body("brick", 1.0, np.diag([1.9, 2.1, 3.2]))
    j = dt.JointDef(kind="floating", parent="origin", child="brick")
    mech = dt.build([b], [j], timestep=0.01, gravity=(0, 0, 0))
    state = mech.zero_state()._replace(
        w=jnp.array([[0.2, 3.0, 0.01]]), v=jnp.array([[0.3, -0.2, 0.1]])
    )
    final, tr = rollout(mech, state, 200)
    assert tr["success"].all()
    me, pl, pa = energy_momentum(mech, tr)
    assert float(jnp.abs(me - me[0]).max()) < 1e-6
    assert float(jnp.abs(pl - pl[0]).max()) < 1e-10
    assert float(jnp.abs(pa - pa[0]).max()) < 1e-6
    assert float(jnp.abs(jnp.linalg.norm(tr["q"], axis=-1) - 1).max()) < 1e-12


def test_pendulum_energy_and_constraint():
    mech = models.get_mechanism("pendulum", timestep=0.01)
    state = models.initialize(mech, "pendulum", angle=0.6, angular_velocity=1.3)
    final, tr = rollout(mech, state, 200)
    assert tr["success"].all()
    assert tr["iterations"].max() <= 3
    me, _, _ = energy_momentum(mech, tr)
    # variational integrator: bounded energy oscillation, no drift
    assert float(jnp.abs(me - me[0]).max()) < 2e-3
    # pivot point stays fixed (joint constraint satisfied)
    from dojo_tpu import lie

    arm = jnp.tile(jnp.array([0.0, 0.0, 0.5]), (200, 1))
    pivot = tr["x"][:, 0, :] + jax.vmap(lie.rotate)(arm, tr["q"][:, 0, :])
    assert float(jnp.abs(pivot - pivot[0]).max()) < 1e-7


def test_minimal_roundtrip():
    mech = models.get_mechanism("pendulum")
    state = models.initialize(mech, "pendulum", angle=0.37, angular_velocity=-0.9)
    y = mech.minimal_state(state)
    np.testing.assert_allclose(np.asarray(y), [0.37, -0.9], atol=1e-12)
    s2 = mech.maximal_state(y)
    np.testing.assert_allclose(
        np.asarray(s2.pack()), np.asarray(state.pack()), atol=1e-12
    )


def test_cartpole_roundtrip_and_sim():
    mech = models.get_mechanism("cartpole")
    state = models.initialize(mech, "cartpole", position=0.1, orientation=0.4)
    # minimal layout is per-joint [coords; velocities] (reference
    # minimal_index convention): [cart pos, cart vel, pole angle, pole vel]
    y = mech.minimal_state(state)
    np.testing.assert_allclose(np.asarray(y), [0.1, 0, 0.4, 0], atol=1e-10)
    final, tr = rollout(mech, state, 30)
    assert tr["success"].all()


def test_spring_damper_pendulum():
    """Springs store energy (total conserved); dampers dissipate it."""
    mech = models.get_mechanism("pendulum", springs=20.0, timestep=0.01)
    state = models.initialize(mech, "pendulum", angle=0.9, angular_velocity=0.0)
    final, tr = rollout(mech, state, 150)
    me, _, _ = energy_momentum(mech, tr)
    # bounded symplectic oscillation ~(ωh)²·E, no drift: last sample returns
    # to the initial energy far closer than the mid-swing max deviation
    assert float(jnp.abs(me - me[0]).max()) < 5e-2
    assert float(jnp.abs(me[-1] - me[0])) < 5e-3

    mech_d = models.get_mechanism("pendulum", dampers=2.0, timestep=0.01)
    state = models.initialize(mech_d, "pendulum", angle=0.9, angular_velocity=0.0)
    final, tr = rollout(mech_d, state, 300)
    y_end = mech_d.minimal_state(final)
    assert abs(float(y_end[1])) < 0.2  # settled near rest


@pytest.mark.slow
def test_box_toss_rest():
    """Reference test/behaviors.jl:21-40 — box comes to rest at the correct
    height with tiny residual velocity."""
    from dojo_tpu.core import SolverOptions

    h = 0.01
    opts = SolverOptions(rtol=1e-6, btol=1e-6)
    mech = models.get_mechanism("block", timestep=h, friction_coefficient=0.1)
    state = models.initialize(
        mech,
        "block",
        position=[0, 0, 0.5],
        velocity=[1.0, 1.5, 1.0],
        angular_velocity=np.array([5.0, 4.0, 2.0]) * h,
    )
    final, tr = rollout(mech, state, int(5.0 / h), opts=opts)
    assert tr["success"].all()
    assert float(jnp.abs(final.v).max()) < 1e-8
    assert abs(float(final.x[0, 2]) - 0.25) < 1e-3
    assert float(tr["x"][:, 0, 2].min()) > 0.25 - 1e-5  # SDF ≥ 0 analog


def test_block_drop_short():
    """Cheap contact check: dropped block lands and does not penetrate."""
    from dojo_tpu.core import SolverOptions

    opts = SolverOptions(rtol=1e-6, btol=1e-6)
    mech = models.get_mechanism("block", timestep=0.05, friction_coefficient=0.8)
    state = models.initialize(mech, "block", position=[0, 0, 0.4])
    final, tr = rollout(mech, state, 20, opts=opts)
    assert tr["success"].all()
    assert abs(float(final.x[0, 2]) - 0.25) < 2e-3
    assert float(tr["x"][:, 0, 2].min()) > 0.25 - 1e-4


def test_quadruped_never_penetrates():
    """min SDF ≥ 0 over a passive quadruped drop (reference oracle
    test/behaviors.jl:1-19; get_sdf from contacts/utilities.jl)."""
    import dojo_tpu as dt
    from dojo_tpu import models

    from dojo_tpu.core import SolverOptions
    from util import jitted_step

    mech = models.get_mechanism("quadruped", timestep=0.05)
    state = models.initialize(mech, "quadruped")
    step = jitted_step(mech, SolverOptions(rtol=1e-8, btol=1e-6, max_iter=50))
    min_sdf = np.inf
    s = state
    for _ in range(30):  # 1.5 simulated seconds
        s, info = step(mech.params, s)
        sdf = np.asarray(dt.signed_distances(mech.topo, mech.params, s))
        min_sdf = min(min_sdf, float(sdf.min()))
    assert min_sdf > -1e-4, min_sdf


def test_block_toss_warm_transient_recentering():
    """The warm-started chain through impact/bounce/rest (r5 fix): the
    contact-transition re-centering (SolverOptions.warm_onset_*) resets
    the carried cone AND joint impulses to the neutral init exactly on
    activity-flip steps, so the warm chain converges everywhere the cold
    chain does — r4's warm chain failed at every fresh impact (BENCH_r04:
    753 steps/s, dense rescue each step)."""
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.simulate import make_simulate

    mech = models.get_mechanism("block")  # h=0.1: few steps to rest
    state = models.initialize(
        mech, "block", position=(0, 0, 1.0), velocity=(1.0, 0.5, 0.0)
    )
    sim = make_simulate(mech.topo, SolverOptions())
    final, traj = jax.jit(
        lambda p, s: sim(p, s, horizon=150, warm_start=True)
    )(mech.params, state)
    assert float(traj.info.success.mean()) == 1.0
    assert abs(float(final.x[0, 2]) - 0.2511) < 2e-3  # at rest, h=0.1 slack
    assert float(jnp.abs(final.v).max()) < 1e-8
