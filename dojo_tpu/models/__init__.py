"""Model zoo: programmatic mechanisms mirroring DojoEnvironments/src/mechanisms.

Registry API (reference mechanisms.jl:9-26):
    get_mechanism(name, **kwargs)  -> Mechanism
    initialize(mech, name, **kwargs) -> BodyState
"""

from importlib import import_module

_REGISTRY = {}


def register(name):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


_INIT_REGISTRY = {}


def register_init(name):
    def deco(fn):
        _INIT_REGISTRY[name] = fn
        return fn

    return deco


_MODULES = [
    "pendulum",
    "cartpole",
    "block",
    "snake",
    "locomotion",
    "quadruped",
    "misc",
]


def _load_all():
    for m in _MODULES:
        import_module(f"dojo_tpu.models.{m}")


def get_mechanism(name, **kwargs):
    _load_all()
    if name not in _REGISTRY:
        raise KeyError(f"unknown mechanism '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def initialize(mech, name, **kwargs):
    _load_all()
    if name not in _INIT_REGISTRY:
        return mech.zero_state()
    return _INIT_REGISTRY[name](mech, **kwargs)


def registered_models():
    _load_all()
    return sorted(_REGISTRY)
