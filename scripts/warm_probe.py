"""TPU warm-start diagnosis probe: runs the EXACT bench.py phase_steps
graph (same jit name/body, so it shares the persistent-cache entry) and
prints per-step solver health for the warm-started chain vs the cold chain.

Context: the first warm-started steps run on hardware reported success 0.0
/ 38 iters in the steady loop while CPU f64 and f32 replicas are healthy
(BASELINE.md r4 notes) — this isolates whether that reproduces, per step.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dojo_tpu.cachedir import enable_compile_cache

enable_compile_cache()

from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.simulate import make_step

B = 256
mech = models.get_mechanism("quadruped", timestep=0.05).cast(jnp.float32)
state = jax.tree.map(
    lambda a: jnp.asarray(a, jnp.float32),
    models.initialize(mech, "quadruped"),
)
step = make_step(mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30))
batt = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
u = jnp.zeros((B, mech.topo.nj, 6), dtype=jnp.float32)


@jax.jit
def batched(params, st, u, w_prev):
    st2, info = jax.vmap(
        lambda s, uu, wp: step(params, s, uu, w_prev=wp),
    )(st, u, w_prev)
    return st2, info.w, info.success, info.iterations


w_neutral = jax.jit(
    jax.vmap(lambda s: step.init_w(s.v, s.w, mech.params))
)(batt)

t0 = time.perf_counter()
st, w, ok, it = batched(mech.params, batt, u, w_neutral)
jax.block_until_ready(st)
print("compile+cold0: %.1f s  ok=%.3f it=%.1f" % (
    time.perf_counter() - t0, float(ok.mean()), float(it.mean())))

for k in range(8):
    st2, w2, ok, it = batched(mech.params, st, u, w)
    print(
        "warm%d ok=%.3f it=%.1f z=%.3f finite(w)=%d" % (
            k, float(ok.mean()), float(it.mean()),
            float(st2.x[:, 0, 2].mean()), int(jnp.isfinite(w2).all()),
        )
    )
    stc, wc, okc, itc = batched(mech.params, st, u, w_neutral)
    print("  cold%d ok=%.3f it=%.1f z=%.3f" % (
        k, float(okc.mean()), float(itc.mean()),
        float(stc.x[:, 0, 2].mean())))
    st, w = st2, w2
