"""Independent finite-difference verification of the Newton (solution)
matrix across the zoo (reference test/jacobian.jl:1-117 test_solmat): the
analytic Jacobian jacfwd(res_fn) — the matrix every Mehrotra iteration
factorizes — must match central differences of the residual itself.

This is independent of test_ldu.py (which only checks LDU-vs-dense
CONSISTENCY): AD of a wrong residual is consistently wrong; FD of the
residual is the ground truth.  The reference evaluates at a post-simulation
state so contact/limit rows are active; we do the same, evaluating at a
perturbed strictly-interior cone point like the solver's own iterates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import models
from dojo_tpu.core import REG
from dojo_tpu.residual import make_context, make_residual
from dojo_tpu.solver import make_solver

from util import jitted_step

# ~the reference's mechanism list (jacobian.jl) restricted to our zoo names;
# mixed-contact + loop-closure cases included
MECHS = [
    ("pendulum", {}),
    ("npendulum", {}),
    ("cartpole", {}),
    ("block", {}),
    ("sphere", {}),
    ("snake", {"num_bodies": 3}),
    ("twister", {"num_bodies": 3}),
    ("fourbar", {}),
    ("halfcheetah", {}),
    ("quadruped", {}),
    ("atlas", {}),
    ("humanoid", {}),
]


def _post_step_point(name, kw):
    """Simulate a few steps (so contacts engage), then take the solver's
    final iterate w* nudged into the cone interior."""
    mech = models.get_mechanism(name, **kw)
    state = models.initialize(mech, name)
    step = jitted_step(mech)
    info = None
    for _ in range(3):
        state, info = step(mech.params, state, None)
    w = info.w
    # nudge: keep cone variables strictly interior the way init_w does
    init_w, _, _ = make_solver(mech.topo, linsolve="dense")
    w = init_w(state.v, state.w, mech.params, w_prev=w, warm_floor=1e-2)
    return mech, state, w


@pytest.mark.slow
@pytest.mark.parametrize("name,kw", MECHS, ids=[m[0] for m in MECHS])
def test_solution_matrix_fd(name, kw):
    mech, state, w = _post_step_point(name, kw)
    topo = mech.topo
    res_fn = make_residual(topo)
    ctx = make_context(topo, state, mech.params)
    mu = jnp.asarray(1e-4, w.dtype)

    J = jax.jacfwd(res_fn)(w, ctx, mech.params, mu)
    eps = 1e-6

    @jax.jit
    @jax.vmap
    def fd_col(e):
        rp = res_fn(w + eps * e, ctx, mech.params, mu)
        rm = res_fn(w - eps * e, ctx, mech.params, mu)
        return (rp - rm) / (2 * eps)

    J_fd = fd_col(jnp.eye(topo.dim, dtype=w.dtype)).T
    scale = max(1.0, float(jnp.abs(J).max()))
    err = float(jnp.abs(J - J_fd).max()) / scale
    # reference test_solmat tolerance ϵ=1e-6 f64
    assert err < 1e-6, (name, err, scale)
    # the regularized matrix the solver factorizes must be well-posed at
    # this point (no silent rank collapse masked by REG)
    Jr = J + REG * jnp.eye(topo.dim, dtype=w.dtype)
    assert np.isfinite(np.asarray(Jr)).all()
    assert np.linalg.matrix_rank(np.asarray(Jr)) == topo.dim, name
