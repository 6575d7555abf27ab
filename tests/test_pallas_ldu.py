"""Pallas LDU kernels vs the jnp reference path (interpret mode, CPU).

The kernels (dojo_tpu/pallas_ldu.py) re-implement ldu.py's block-LU
factorization/solve with batch-minor layout for TPU VMEM execution; this
test pins their numerics to the jnp path on a real quadruped KKT system
(the hardest schedule in the zoo: supernodes with contacts, 8 levels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import models
from dojo_tpu import pallas_ldu as PL
from dojo_tpu import solver as S
from dojo_tpu.blocks import make_assembler
from dojo_tpu.graph import build_schedule
from dojo_tpu.ldu import make_ldu
from dojo_tpu.residual import make_context, make_residual


@pytest.fixture(scope="module")
def quadruped_kkt():
    mech = models.get_mechanism("quadruped", timestep=0.05)
    f32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        t,
    )
    state = f32(models.initialize(mech, "quadruped"))
    params = f32(mech.params)
    topo = mech.topo
    sched = build_schedule(topo)
    assemble = make_assembler(topo, sched)
    res_fn = make_residual(topo)
    init_w, _, _ = S.make_solver(topo)
    u = jnp.zeros((topo.nj, 6), jnp.float32)
    ctx = make_context(topo, state, params, u)
    w0 = init_w(state.v, state.w, params)
    B, D = 4, w0.shape[0]
    key = jax.random.PRNGKey(0)
    bw = w0[None] + 0.01 * jax.random.normal(key, (B, D), jnp.float32)
    bctx = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), ctx)
    bmu = jnp.full((B,), 1e-3, jnp.float32)
    blocks = jax.vmap(assemble, in_axes=(0, 0, None, 0))(bw, bctx, params, bmu)
    r = jax.vmap(res_fn, in_axes=(0, 0, None, 0))(bw, bctx, params, bmu)
    return sched, blocks, r, D


def test_pallas_matches_jnp_solve(quadruped_kkt):
    sched, blocks, r, D = quadruped_kkt
    _, factorize, ldu_solve, matvec = make_ldu(sched)

    fact_ref = jax.vmap(factorize)(blocks)
    x = jax.vmap(ldu_solve)(fact_ref, r)
    res1 = r - jax.vmap(matvec)(blocks, x)
    x_ref = x + jax.vmap(ldu_solve)(fact_ref, res1)

    fac_b, sol_b = PL.make_pallas_ldu(sched, refine=1, interpret=True)
    fact_p = fac_b(blocks)
    # factored off-diagonal blocks must agree tightly (same elimination);
    # LU/PS may differ where pivot magnitudes tie, so the solve result —
    # which both factorizations must reproduce — is the contract.
    np.testing.assert_allclose(
        np.asarray(fact_p[0]), np.asarray(fact_ref[0]), atol=5e-3
    )
    x_nod = sol_b(blocks, fact_p, PL.flat_to_nodes(sched, r))
    x_p = PL.nodes_to_flat(sched, x_nod, D)
    scale = float(jnp.max(jnp.abs(x_ref)))
    np.testing.assert_allclose(
        np.asarray(x_p) / scale, np.asarray(x_ref) / scale, atol=2e-5
    )


def test_pallas_solve_accuracy(quadruped_kkt):
    """The pallas solve must actually solve the system (residual check)."""
    sched, blocks, r, D = quadruped_kkt
    _, _, _, matvec = make_ldu(sched)
    fac_b, sol_b = PL.make_pallas_ldu(sched, refine=1, interpret=True)
    fact_p = fac_b(blocks)
    x_nod = sol_b(blocks, fact_p, PL.flat_to_nodes(sched, r))
    x = PL.nodes_to_flat(sched, x_nod, D)
    res = r - jax.vmap(matvec)(blocks, x)
    relres = jnp.linalg.norm(res, axis=-1) / jnp.linalg.norm(r, axis=-1)
    assert float(jnp.max(relres)) < 1e-4
