"""Scaling-efficiency measurement for batched contact-MPC solves.

The reference is single-process CPU — scaling is the TPU-native value-add,
and its honest metric is weak-scaling efficiency

    eff(N) = throughput(N devices) / (N × throughput(1 device))

with per-device batch held constant.  This module measures it for any
vmappable per-scenario function (an MPC solve, a contact step).  On real
hardware (TPU slice) the numbers are meaningful; on a virtual CPU mesh all
"devices" share one core, so efficiency degenerates to ~1/N — the harness
still runs there to validate shardings, and flags `virtual=True`.

    from dojo_tpu.parallel import scaling
    report = scaling.weak_scaling(step_fn, params, make_batch, per_device=256)
    # {1: {...}, 2: {...}, ...} with throughput and efficiency per size
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _is_virtual():
    d = jax.devices()[0]
    return d.platform == "cpu"


def weak_scaling(fn, params, make_batch, per_device: int = 256,
                 sizes=None, reps: int = 5):
    """Measure weak-scaling efficiency of `fn(params, x)` vmapped over a
    per-device-constant batch.

    fn: per-scenario function (params, x) → pytree
    make_batch: B → batched x pytree (leading axis B)
    sizes: device counts to test (default: powers of two up to all devices)
    """
    n_all = len(jax.devices())
    if sizes is None:
        sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= n_all]
    report = {"virtual": _is_virtual(), "per_device": per_device, "sizes": {}}
    base = None
    for n in sizes:
        mesh = Mesh(np.asarray(jax.devices()[:n]), ("dp",))
        B = per_device * n
        x = make_batch(B)
        sh = jax.tree.map(
            lambda a: NamedSharding(
                mesh, P(*(["dp"] + [None] * (jnp.asarray(a).ndim - 1)))
            ),
            x,
        )
        x = jax.tree.map(jax.device_put, x, sh)
        jfn = jax.jit(jax.vmap(fn, in_axes=(None, 0)),
                      in_shardings=(None, sh))
        out = jax.block_until_ready(jfn(params, x))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jfn(params, x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        thr = B / dt
        if base is None:
            base = thr
        report["sizes"][n] = {
            "throughput_per_s": round(thr, 1),
            "efficiency": round(thr / (n * base), 4),
        }
    return report
