"""Data-Jacobian FD breadth: ∂r/∂(model parameters) on the big mechanisms.

Reference test/data.jl:69-281 FD-checks the analytic ∂residual/∂data blocks
(src/gradients/data.jl) on ~15 mechanisms.  Here the data-Jacobian IS
autodiff of one residual, so the check compares a jax.jvp of
r(w; θ) in a random parameter direction against central finite differences
of the same function — on the heavyweight models the fast suite skips
(quadruped/atlas/humanoid, contacts engaged after a few steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu.residual import make_context, make_residual

from test_jacobian_fd import _post_step_point

MECHS = [
    ("quadruped", {}),
    ("atlas", {}),
    ("humanoid", {}),
    ("halfcheetah", {}),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,kw", MECHS, ids=[m[0] for m in MECHS])
def test_param_directional_derivative_fd(name, kw):
    mech, state, w = _post_step_point(name, kw)
    topo = mech.topo
    res_fn = make_residual(topo)
    mu = 1e-4
    params = mech.params

    def r(p):
        ctx = make_context(topo, state, p, None)
        return res_fn(w, ctx, p, mu)

    # random tangent over every float parameter leaf except the timestep
    # (reference data vector: mass/inertia/springs/dampers/vertices/
    # contact params — not h) and the mask/limit-activity fields, which are
    # structural
    rng = np.random.default_rng(5)
    skip = {"timestep"}
    masks = {f for f in params._fields if "mask" in f}

    def tangent_leaf(field, a):
        a = np.asarray(a)
        if field in skip or field in masks or not np.issubdtype(
            a.dtype, np.floating
        ):
            return jnp.zeros_like(jnp.asarray(a))
        return jnp.asarray(rng.normal(size=a.shape), dtype=a.dtype)

    tangent = type(params)(
        *(tangent_leaf(f, getattr(params, f)) for f in params._fields)
    )

    _, rdot_ad = jax.jvp(r, (params,), (tangent,))

    eps = 1e-6
    plus = jax.tree.map(lambda a, t: a + eps * t, params, tangent)
    minus = jax.tree.map(lambda a, t: a - eps * t, params, tangent)
    rdot_fd = (np.asarray(r(plus)) - np.asarray(r(minus))) / (2 * eps)

    rdot_ad = np.asarray(rdot_ad)
    scale = max(1.0, np.abs(rdot_fd).max())
    err = np.abs(rdot_ad - rdot_fd).max() / scale
    assert err < 5e-5, (name, err)
