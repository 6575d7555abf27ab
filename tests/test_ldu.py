"""Graph-sparse block-LDU solver tests: the assembler's per-node blocks and
the level-scheduled factorization must reproduce the dense Newton solve
exactly (reference: GraphBasedSystems.jl ldu_factorization!/
ldu_backsubstitution! vs full_matrix densification, used at
src/solver/mehrotra.jl:36-49)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import models
from dojo_tpu.blocks import make_assembler
from dojo_tpu.core import REG
from dojo_tpu.graph import build_schedule
from dojo_tpu.ldu import gj_inverse, make_ldu
from dojo_tpu.residual import make_context, make_residual
from dojo_tpu.solver import make_solver


@pytest.mark.parametrize("name", ["pendulum", "cartpole", "quadruped", "snake"])
def test_ldu_matches_dense(name):
    mech = models.get_mechanism(name)
    state = models.initialize(mech, name)
    topo = mech.topo
    sched = build_schedule(topo)
    assert sched is not None, f"{name} should be loop-free"
    res_fn = make_residual(topo)
    init_w, _, _ = make_solver(topo, linsolve="dense")
    ctx = make_context(topo, state, mech.params)
    rng = np.random.default_rng(0)
    w0 = init_w(state.v, state.w, mech.params) + 0.01 * jnp.asarray(
        rng.standard_normal(topo.dim)
    )
    mu = jnp.asarray(1e-4, w0.dtype)

    J = jax.jacfwd(res_fn)(w0, ctx, mech.params, mu) + REG * jnp.eye(topo.dim)
    extract, factorize, solve, matvec = make_ldu(sched)
    assemble = make_assembler(topo, sched)

    # per-node assembled blocks == blocks sliced out of the dense Jacobian
    b_ref = extract(J)
    b_asm = assemble(w0, ctx, mech.params, mu)
    assert float(jnp.max(jnp.abs(b_ref - b_asm))) < 1e-10

    # LDU solve == dense solve
    r = res_fn(w0, ctx, mech.params, mu)
    d_dense = jnp.linalg.solve(J, -r)
    d_ldu = solve(factorize(b_asm), -r)
    rel = float(jnp.max(jnp.abs(d_ldu - d_dense))) / float(
        jnp.max(jnp.abs(d_dense))
    )
    assert rel < 1e-9, rel


def test_fourbar_falls_back_dense():
    mech = models.get_mechanism("fourbar")
    assert build_schedule(mech.topo) is None  # kinematic loop


def test_gj_inverse_pivoting():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((7, 10, 10)))
    A = A.at[:, 0, 0].set(0.0)  # force pivoting
    Ainv = gj_inverse(A, 10)
    err = jnp.max(jnp.abs(Ainv @ A - jnp.eye(10)))
    assert float(err) < 1e-9
