"""Environment-layer parity tests (reference DojoEnvironments/test/
environments.jl:1-22: every environment runs get_state/step/simulate with a
short horizon).  Heavy mechanisms are marked slow."""

import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import envs

LIGHT = ["pendulum", "cartpole_dqn"]
HEAVY = ["ant_ars", "quadruped_waypoint", "quadruped_sampling",
         "quadrotor_waypoint", "uuv_waypoint", "youbot_waypoint"]


def _run_env(name, **kw):
    env = envs.get_environment(name, **kw)
    y0 = env.reset()
    assert np.isfinite(np.asarray(y0)).all(), name
    rng = np.random.default_rng(0)
    y = y0
    for k in range(2):
        u = 0.01 * rng.normal(size=env.input_dim)
        # env input dims differ from mech input dims for mapped envs; the
        # input_map contract is "accept the env's action vector"
        if name in ("quadrotor_waypoint",):
            u = 0.1 * np.abs(rng.normal(size=4))
        elif name == "uuv_waypoint":
            u = 0.1 * np.abs(rng.normal(size=6))
        elif name in ("quadruped_waypoint", "quadruped_sampling"):
            u = 0.01 * rng.normal(size=12)
        elif name == "ant_ars":
            u = 0.01 * rng.normal(size=8)
        elif name == "cartpole_dqn":
            u = np.asarray([0.1])
        elif name == "youbot_waypoint":
            u = 0.1 * rng.normal(size=env.input_dim)
        y, r, done, info = env.step(y, u)
        assert np.isfinite(np.asarray(y)).all(), (name, k)
        assert np.isfinite(float(r)), name
        assert bool(info.success), (name, k, info)
    return env, y0, y


@pytest.mark.parametrize("name", LIGHT)
def test_environment_runs(name):
    _run_env(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", HEAVY)
def test_environment_runs_heavy(name):
    kw = {}
    if name == "quadruped_waypoint":
        kw = dict(timestep=0.01)  # reference default 0.001 — same topology
    _run_env(name, **kw)


@pytest.mark.slow
def test_uuv_buoyancy_rises():
    """Buoyancy (19.5·9.81 N up vs ~19.2 kg weight) makes the resting UUV
    drift upward (uuv_waypoint.jl:173)."""
    env = envs.get_environment("uuv_waypoint")
    y = env.reset()
    for _ in range(5):
        y, r, done, info = env.step(y, np.zeros(6))
        assert bool(info.success)
    ny = env.state_dim
    vz = float(y[8]) if ny >= 9 else 0.0  # base linear velocity z
    assert vz > 0.0, f"UUV should rise under buoyancy, vz={vz}"


@pytest.mark.slow
def test_quadruped_waypoint_progression():
    """The waypoint index (traced aux state) advances when the base reaches
    a waypoint."""
    env = envs.get_environment("quadruped_waypoint", timestep=0.01)
    y = env.reset()
    aux = env.aux_reset()
    assert int(aux) == 0
    # teleport the base onto waypoint 0 and step
    y = jnp.asarray(y).at[0].set(float(env.waypoints[0][0]))
    y = y.at[1].set(float(env.waypoints[0][1]))
    y, r, done, info, aux = env.step(y, np.zeros(12), aux=aux)
    assert int(aux) == 1
    # reward now tracks waypoint 1
    assert float(r) == pytest.approx(
        -float(jnp.linalg.norm(y[:2] - env.waypoints[1])), rel=1e-5
    )


@pytest.mark.slow
def test_quadruped_waypoint_vmapped_rollout():
    """A batch of env lanes rolls out under jax.vmap(lax.scan(step)) with
    per-lane waypoint indices — the aux state is data, not Python state."""
    import jax

    env = envs.get_environment("quadruped_waypoint", timestep=0.01)
    y0 = jnp.asarray(env.reset())
    scan_step = env.make_scan_step()
    B, T = 3, 2
    # lane 0 starts on waypoint 0 (its index should advance); others don't
    ys0 = jnp.tile(y0, (B, 1))
    ys0 = ys0.at[0, 0].set(float(env.waypoints[0][0]))
    ys0 = ys0.at[0, 1].set(float(env.waypoints[0][1]))
    aux0 = jnp.zeros((B,), jnp.int32)
    us = jnp.zeros((B, T, 12))

    @jax.jit
    def rollout(ys0, aux0, us):
        def lane(y0, a0, u_seq):
            (yf, af), (ys, rs, dones, oks) = jax.lax.scan(
                scan_step, (y0, a0), u_seq
            )
            return yf, af, rs, oks

        return jax.vmap(lane)(ys0, aux0, us)

    yf, af, rs, oks = rollout(ys0, aux0, us)
    assert yf.shape == (B, y0.shape[0])
    assert np.isfinite(np.asarray(yf)).all()
    assert np.asarray(oks).all()
    af = np.asarray(af)
    assert af[0] == 1, af  # lane 0 reached waypoint 0
    assert (af[1:] == 0).all(), af
