"""Mesh/scaling utilities: sharded batched stepping runs on the virtual
8-device mesh and the weak-scaling harness produces a report."""

import jax
import jax.numpy as jnp
import numpy as np

from dojo_tpu import models, parallel
from dojo_tpu.core import SolverOptions
from dojo_tpu.simulate import make_step


def _pendulum_step():
    mech = models.get_mechanism("pendulum", timestep=0.01)
    step = make_step(mech.topo, SolverOptions(rtol=1e-8, btol=1e-8))

    def fn(params, y):
        state = mech.maximal_state(y)
        st2, info = step(params, state)
        return mech.minimal_state(st2), info.success

    return mech, fn


def test_sharded_batch_apply():
    mech, fn = _pendulum_step()
    mesh = parallel.make_mesh(dp=4)
    B = 8
    ys = jnp.tile(jnp.asarray([0.4, 0.0]), (B, 1))
    jfn = parallel.sharded_batch_apply(mesh, fn, mech.params, ys)
    y2, ok = jfn(mech.params, parallel.batch_shard(mesh, ys))
    assert np.asarray(ok).all()
    assert np.isfinite(np.asarray(y2)).all()


def test_weak_scaling_report():
    mech, fn = _pendulum_step()
    rep = parallel.weak_scaling(
        lambda p, y: fn(p, y)[0], mech.params,
        lambda B: jnp.tile(jnp.asarray([0.4, 0.0]), (B, 1)),
        per_device=4, sizes=[1, 2], reps=1,
    )
    assert rep["virtual"] is True  # CPU mesh in tests
    assert set(rep["sizes"]) == {1, 2}
    for n, row in rep["sizes"].items():
        assert row["throughput_per_s"] > 0
