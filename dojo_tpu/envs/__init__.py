"""RL-style environments (reference DojoEnvironments/src/environments.jl).

An Environment wraps a Mechanism with minimal-coordinate step/get_state/
input_map semantics.  Steps are jitted pure functions, so environments
vmap across scenario batches natively (unlike the reference's mutating
single-instance design).
"""

from .base import Environment
from .classic import AntARS, CartpoleDQN, Pendulum

_REGISTRY = {}


def register(name):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


from . import classic  # noqa: E402  (populates registry)
from .waypoint import (  # noqa: E402
    QuadrotorWaypoint,
    QuadrupedSampling,
    QuadrupedWaypoint,
    UUVWaypoint,
    YoubotWaypoint,
)


def get_environment(name, **kwargs):
    reg = {
        "pendulum": Pendulum,
        "cartpole_dqn": CartpoleDQN,
        "ant_ars": AntARS,
        "quadruped_waypoint": QuadrupedWaypoint,
        "quadruped_sampling": QuadrupedSampling,
        "quadrotor_waypoint": QuadrotorWaypoint,
        "uuv_waypoint": UUVWaypoint,
        "youbot_waypoint": YoubotWaypoint,
    }
    reg.update(_REGISTRY)
    if name not in reg:
        raise KeyError(f"unknown environment '{name}'; have {sorted(reg)}")
    return reg[name](**kwargs)
