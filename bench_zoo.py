"""Cross-zoo benchmark: 1 simulated second per mechanism (reference
benchmark/mechanisms_benchmark.jl:3-43), batched per chip.

Prints one JSON line per mechanism: steps/s/chip, solver success, mean
Newton iterations.  Heavier than bench.py (many topologies → many
compiles); run occasionally to catch perf regressions outside the
quadruped.  Env knobs: ZOO_B (batch, default 64), ZOO_MODELS
(comma-separated subset).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # default: the relay/TPU cache — NOT safe for local CPU runs (set the
    # env var to /tmp/dojo_tpu_xla_cache_local for those)
    from dojo_tpu.cachedir import repo_cache_dir
    jax.config.update("jax_compilation_cache_dir", repo_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


MODELS = [
    "pendulum", "npendulum", "cartpole", "block", "sphere", "snake",
    "hopper", "halfcheetah", "walker", "ant", "quadruped", "humanoid",
]


def bench_one(name, B):
    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.simulate import make_step

    mech = models.get_mechanism(name)
    f32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        t,
    )
    mech.params = f32(mech.params)
    state = f32(models.initialize(mech, name))
    opts = SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
    step = make_step(mech.topo, opts)
    batt = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)

    @jax.jit
    def batched(params, st):
        st2, info = jax.vmap(step, in_axes=(None, 0, None))(params, st, None)
        return st2, info.success, info.iterations

    t0 = time.perf_counter()
    st, ok, its = batched(mech.params, batt)
    jax.block_until_ready(st)
    compile_s = time.perf_counter() - t0

    n = max(2, int(round(1.0 / mech.timestep)))  # 1 simulated second
    oks, itss = [], []
    t0 = time.perf_counter()
    st = batt
    for _ in range(n):
        st, ok, its = batched(mech.params, st)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0
    return {
        "model": name,
        "steps_per_s": round(B * n / dt, 1),
        "sim_seconds_per_s": round(B * n * mech.timestep / dt, 2),
        "solver_success": round(float(np.mean(np.asarray(ok))), 4),
        "mean_iters": round(float(np.mean(np.asarray(its))), 1),
        "batch": B,
        "compile_s": round(compile_s, 1),
    }


def main():
    B = int(os.environ.get("ZOO_B", "64"))
    names = os.environ.get("ZOO_MODELS")
    names = names.split(",") if names else MODELS
    for name in names:
        try:
            print(json.dumps(bench_one(name, B)), flush=True)
        except Exception as e:  # keep the sweep alive across models
            print(json.dumps({"model": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
