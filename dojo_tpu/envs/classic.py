"""Classic environments (reference environments/{pendulum,cartpole_dqn,
ant_ars}.jl)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import models
from ..core import SolverOptions
from .base import Environment


class Pendulum(Environment):
    """Torque-controlled pendulum (environments/pendulum.jl)."""

    model_name = "pendulum"

    def __init__(self, horizon=100, timestep=0.01, gravity=-9.81, springs=0.0,
                 dampers=0.0, **kw):
        mech = models.get_mechanism(
            "pendulum", timestep=timestep, gravity=gravity, springs=springs,
            dampers=dampers,
        )
        super().__init__(mech, horizon, **kw)

    def reward(self, y, u, y2, info, aux=None):
        # swing-up reward: upright is θ=π
        return -jnp.cos(y2[0]) - 1e-3 * jnp.sum(u**2)


class CartpoleDQN(Environment):
    """Cart-pole balance (environments/cartpole_dqn.jl)."""

    model_name = "cartpole"

    def __init__(self, horizon=200, timestep=0.01, gravity=-9.81, **kw):
        mech = models.get_mechanism("cartpole", timestep=timestep, gravity=gravity)
        super().__init__(mech, horizon, **kw)

    def input_map(self, u):
        # only the cart is actuated (scalar action)
        if u is None:
            return jnp.zeros(2)
        u = jnp.atleast_1d(jnp.asarray(u))
        return jnp.concatenate([u[:1], jnp.zeros(1)])

    # minimal layout: [x, ẋ, θ, θ̇] (prismatic then revolute sub-vectors)
    def reward(self, y, u, y2, info, aux=None):
        # reference DQN example: 1 per step while alive
        # (examples/learning/cartpole_dqn.jl:123)
        return jnp.asarray(1.0)

    def is_done(self, y):
        # cart past ±2.4 m or pole past ±12° (cartpole_dqn.jl:183-184)
        return (jnp.abs(y[0]) > 2.4) | (jnp.abs(y[2]) > 12 * jnp.pi / 180)


class AntARS(Environment):
    """Ant locomotion for Augmented Random Search
    (environments/ant_ars.jl:1-79): reward = forward progress − control −
    contact penalty + alive bonus; observations append clamped contact
    impulses."""

    model_name = "ant"

    def __init__(self, horizon=100, timestep=0.05, gravity=-9.81, **kw):
        mech = models.get_mechanism("ant", timestep=timestep, gravity=gravity)
        super().__init__(mech, horizon, **kw)

    def input_map(self, u):
        if u is None:
            return jnp.zeros(self.mech.input_dim)
        # floating base (first 6 inputs) not actuated
        return jnp.concatenate([jnp.zeros(6), jnp.asarray(u)])

    def observe(self, y, info):
        topo = self.mech.topo
        nh = topo.cw // 2
        wc = info.w[topo.contact_off :].reshape(topo.nc, topo.cw)
        forces = jnp.clip(wc[:, nh], -1.0, 1.0)  # normal impulses γ₀
        return jnp.concatenate([y, forces])

    def reward(self, y, u, y2, info, aux=None):
        h = self.mech.params.timestep
        forward = (y2[0] - y[0]) / h  # x-velocity of the trunk
        ctrl = 0.5 * jnp.sum(u**2)
        alive = 0.05
        return forward * h + alive - ctrl * h

    def is_done(self, y):
        return (y[2] < 0.29) | (y[2] > 1.0)  # trunk height bounds
