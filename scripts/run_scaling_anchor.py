"""Record the weak-scaling anchor row (BASELINE.md deliverable): the
single-chip throughput of the benchmark unit (batched quadruped contact
step), via parallel.scaling.weak_scaling.  On the one-chip relay this
produces the N=1 anchor; multi-chip rows fill in when a slice is available
(virtual-mesh rows are flagged, all virtual devices share one core)."""

import json

import jax
import jax.numpy as jnp

from dojo_tpu.cachedir import enable_compile_cache

enable_compile_cache()

from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.parallel import scaling
from dojo_tpu.simulate import make_step


def main():
    mech = models.get_mechanism("quadruped", timestep=0.05).cast(jnp.float32)
    state = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32),
        models.initialize(mech, "quadruped"),
    )
    step = make_step(
        mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
    )

    def fn(params, s):
        s2, info = step(params, s)
        return s2.x, info.success

    def make_batch(B):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), state
        )

    report = scaling.weak_scaling(
        fn, mech.params, make_batch, per_device=256
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
