"""Zoo smoke tests (reference DojoEnvironments/test/mechanisms.jl:1-35):
every registered mechanism constructs, initializes, and its minimal↔maximal
maps round-trip.  Full rollouts for the cheap models only (compile budget)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import models

from util import rollout

CHEAP = ["pendulum", "slider", "block", "sphere"]
BUILD_ONLY = [
    "npendulum", "nslider", "cartpole", "dzhanibekov", "tippetop", "snake",
    "twister", "hopper", "halfcheetah", "walker", "ant", "quadruped",
]


@pytest.mark.parametrize("name", CHEAP + BUILD_ONLY)
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


@pytest.mark.parametrize("name", CHEAP)
def test_short_rollout(name):
    from dojo_tpu.core import SolverOptions

    # reference zoo smoke tests run at default tolerances (btol=1e-4);
    # rolling-contact cone boundaries legitimately stall at btol=1e-6
    opts = SolverOptions(rtol=1e-6, btol=1e-4)
    mech = models.get_mechanism(name)
    state = models.initialize(mech, name)
    final, tr = rollout(mech, state, 10, opts=opts)
    # equality residuals must converge every step; the complementarity
    # target can stall at friction-cone boundaries (rolling contact) —
    # the reference zoo tests likewise don't assert solver status
    assert np.all(np.isfinite(np.asarray(final.pack())))
    assert tr["success"].mean() >= 0.5
    # no NaN/no blowup: bodies stay below 10 m and quaternions unit
    assert float(np.abs(np.asarray(tr["x"])).max()) < 10.0
    qn = np.linalg.norm(np.asarray(tr["q"]), axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-8)
