"""solve.traced observability: per-iteration stats match the while_loop
solver's result (reference verbose trace table analog, mehrotra.jl:75-98)."""

import jax
import jax.numpy as jnp
import numpy as np

from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.residual import make_context
from dojo_tpu.solver import make_solver


def test_traced_solve_matches_and_records():
    mech = models.get_mechanism("pendulum", timestep=0.01)
    state = models.initialize(mech, "pendulum", angle=0.6, angular_velocity=1.0)
    init_w, solve, _ = make_solver(mech.topo)
    opts = SolverOptions(rtol=1e-10, btol=1e-10, max_iter=8)
    ctx = make_context(mech.topo, state, mech.params)
    w0 = init_w(state.v, state.w, mech.params)

    res = jax.jit(lambda w: solve(w, ctx, mech.params, opts))(w0)
    res_t, trace = jax.jit(lambda w: solve.traced(w, ctx, mech.params, opts))(w0)

    assert bool(res.success) and bool(res_t.success)
    np.testing.assert_allclose(np.asarray(res_t.w), np.asarray(res.w), atol=1e-12)
    assert int(res_t.iterations) == int(res.iterations)
    tr = {k: np.asarray(v) for k, v in trace.items()}
    n = int(res.iterations)
    assert tr["valid"][:n].all() and not tr["valid"][n:].any()
    # rvio decreases to tolerance over the trace
    assert tr["rvio"][n - 1] < opts.rtol
    assert np.isfinite(tr["mu"][:n]).all()
