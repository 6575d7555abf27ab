"""Device-mesh scaling for batched contact solves / MPC.

The reference is single-process CPU (SURVEY §2.3) — this subsystem is the
TPU-native addition: scenario batches sharded over a {dp} (data/scenario)
axis with optional {hz} (horizon-block) axis, XLA inserting ICI collectives.
Parameters are replicated; states/controls sharded along dp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = None, hz: int = 1, devices=None) -> Mesh:
    """Mesh over available devices with axes (dp, hz)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // hz
    return Mesh(devices[: dp * hz].reshape(dp, hz), ("dp", "hz"))


def batch_shard(mesh: Mesh, tree, axis: int = 0):
    """Place a pytree with leading batch axis sharded over dp."""
    spec = P(*([None] * axis + ["dp"]))

    def put(x):
        ndim = jnp.asarray(x).ndim
        pspec = P(*(["dp"] + [None] * (ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, pspec))

    return jax.tree.map(put, tree)


def sharded_batch_apply(mesh: Mesh, fn, params, *batched_args):
    """jit fn vmapped over the batch, batch axes sharded over dp; params
    replicated.  Returns the jitted callable."""

    def shardspec(x):
        return NamedSharding(mesh, P(*(["dp"] + [None] * (jnp.asarray(x).ndim - 1))))

    in_shardings = (None,) + tuple(
        jax.tree.map(shardspec, a) for a in batched_args
    )
    vfn = jax.vmap(fn, in_axes=(None,) + (0,) * len(batched_args))
    return jax.jit(vfn, in_shardings=in_shardings)
