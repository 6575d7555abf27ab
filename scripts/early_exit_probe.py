"""Per-lane early-exit measurement (SURVEY §7.3 hard-part #1).

A vmapped lax.while_loop lifts its condition to `any(active)`: every lane
pays the WORST lane's Newton iteration count (B=256 → worst-of-256).  TPU
SIMD can't skip work per lane, so the only mechanical lever is GROUPED
batching: lax.map over G sub-batches of B/G lanes — each group's loop
exits at its own worst lane, trading one big batch's occupancy for
early exit.  Whether that wins depends on the iteration-count tail vs the
per-iteration cost curve c(B):

    T_grouped = Σ_g worst(g) · c(B/G)   vs   T_full = worst(B) · c(B)

This probe measures both on the bench.py steps config (B=256 quadruped
contact steps, f32, graph-LDU+Pallas) for G in {1, 4, 8} plus the
iteration histogram, so BASELINE.md records a MEASURED verdict instead of
a design note.

Run on TPU: `python scripts/early_exit_probe.py`
Env: PROBE_B (default 256), PROBE_GROUPS (default "1,4,8"), PROBE_K
(chain steps, default 6).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dojo_tpu.cachedir import enable_compile_cache

enable_compile_cache()

from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.simulate import make_step


def main():
    B = int(os.environ.get("PROBE_B", "256"))
    K = int(os.environ.get("PROBE_K", "6"))
    groups = [int(g) for g in os.environ.get("PROBE_GROUPS", "1,4,8").split(",")]

    mech = models.get_mechanism("quadruped", timestep=0.05).cast(jnp.float32)
    state = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32),
        models.initialize(mech, "quadruped"),
    )
    step = make_step(mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30))
    batt = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
    u = jnp.zeros((B, mech.topo.nj, 6), dtype=jnp.float32)

    def one(s, uu):
        s2, info = step(mech.params, s, uu)
        return s2, info.success, info.iterations

    results = {}
    for G in groups:
        if B % G:
            continue
        bg = B // G

        def grouped(st, u):
            if G == 1:
                return jax.vmap(one)(st, u)
            re = lambda a: a.reshape((G, bg) + a.shape[1:])
            stg = jax.tree.map(re, st)
            ug = re(u)
            out = jax.lax.map(lambda t: jax.vmap(one)(*t), (stg, ug))
            fl = lambda a: a.reshape((G * bg,) + a.shape[2:])
            return jax.tree.map(fl, out)

        t0 = time.perf_counter()
        fn = jax.jit(grouped).lower(batt, u).compile()
        t_comp = time.perf_counter() - t0
        st2, ok, it = fn(batt, u)
        jax.block_until_ready(st2)
        # drop-chain: successive states raise iteration variance (impacts)
        st = batt
        t0 = time.perf_counter()
        its = []
        for _ in range(K):
            st, ok, it = fn(st, u)
            its.append(np.asarray(it))
        jax.block_until_ready(st)
        dt = time.perf_counter() - t0
        it_all = np.concatenate(its)
        results[G] = {
            "steps_per_s": round(B * K / dt, 1),
            "compile_s": round(t_comp, 1),
            "iters_mean": round(float(it_all.mean()), 2),
            "iters_p95": int(np.percentile(it_all, 95)),
            "iters_max": int(it_all.max()),
        }
        print(f"G={G:3d} (sub-batch {bg:4d}): {results[G]}", flush=True)

    print(json.dumps({"B": B, "K": K, "groups": results}))


if __name__ == "__main__":
    main()
