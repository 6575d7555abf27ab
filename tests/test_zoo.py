"""Zoo parity tests (reference DojoEnvironments/test/mechanisms.jl:1-35):
EVERY registered mechanism constructs, initializes, round-trips its
minimal↔maximal maps, and simulates ≥0.5 s with solver success asserted.
Cheap models run un-marked; the big URDF mechanisms are marked slow."""

import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import models

from util import rollout

CHEAP = [
    "pendulum", "slider", "block", "block2d", "sphere", "npendulum",
    "nslider", "cartpole", "dzhanibekov", "tippetop", "raiberthopper",
]
HEAVY = [
    "snake", "twister", "hopper", "halfcheetah", "walker", "ant",
    "quadruped", "quadrotor", "uuv", "youbot", "panda", "exoskeleton",
    "humanoid", "atlas", "fourbar",
]


def _registry_complete():
    return sorted(CHEAP + HEAVY)


def test_zoo_registry_complete():
    """All 26 reference zoo mechanisms are registered and covered here
    (DojoEnvironments/src/mechanisms/include.jl:1-26)."""
    assert models.registered_models() == _registry_complete()
    assert len(models.registered_models()) == 26


@pytest.mark.parametrize("name", CHEAP + HEAVY)
def test_build_and_init(name):
    mech = models.get_mechanism(name)
    state = models.initialize(mech, name)
    assert np.all(np.isfinite(np.asarray(state.pack())))
    # orientations normalized
    qn = np.linalg.norm(np.asarray(state.q), axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-9)
    # minimal → maximal round trip reproduces the state
    y = mech.minimal_state(state)
    s2 = mech.maximal_state(y)
    np.testing.assert_allclose(
        np.asarray(s2.pack()), np.asarray(state.pack()), atol=1e-8
    )


def _simulate_half_second(name, **kw):
    from dojo_tpu.core import SolverOptions

    # reference zoo smoke tests run at default tolerances (btol=1e-4);
    # rolling-contact cone boundaries legitimately stall at btol=1e-6
    opts = SolverOptions(rtol=1e-6, btol=1e-4)
    mech = models.get_mechanism(name, **kw)
    state = models.initialize(mech, name)
    n = max(2, int(round(0.5 / mech.timestep)))
    final, tr = rollout(mech, state, n, opts=opts)
    assert np.all(np.isfinite(np.asarray(final.pack()))), name
    assert tr["success"].mean() >= 0.9, (name, tr["success"].mean())
    # no blowup: bodies stay bounded and quaternions unit
    assert float(np.abs(np.asarray(tr["x"])).max()) < 20.0, name
    qn = np.linalg.norm(np.asarray(tr["q"]), axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-8)


@pytest.mark.parametrize("name", CHEAP)
def test_short_rollout(name):
    _simulate_half_second(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", HEAVY)
def test_short_rollout_heavy(name):
    # XLA:CPU segfaults once too many compiled executables are resident in
    # one process (see tests/conftest.py); this module alone compiles 26
    # rollouts, so drop the jit caches after every heavy one — the
    # persistent compile cache makes any re-trace a cheap deserialize.
    try:
        _simulate_half_second(name)
    finally:
        import gc
        import jax

        jax.clear_caches()
        gc.collect()
