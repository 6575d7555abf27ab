"""AOT round-trip test on the real steps-bench function.

  python scripts/aot_steps_test.py save   # compile + serialize
  python scripts/aot_steps_test.py load   # fresh process: load + run + time
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
    import jax
    import jax.numpy as jnp

    from dojo_tpu import models
    from dojo_tpu.cachedir import enable_compile_cache
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.simulate import make_step

    enable_compile_cache()
    B = int(os.environ.get("BENCH_STEPS_B", "256"))
    mech = models.get_mechanism("quadruped", timestep=0.05).cast(jnp.float32)
    state = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32),
        models.initialize(mech, "quadruped"),
    )
    step = make_step(mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30))
    batt = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
    u = jnp.zeros((B, mech.topo.nj, 6), dtype=jnp.float32)

    def batched(params, st, u, w_prev):
        st2, info = jax.vmap(
            lambda s, uu, wp: step(params, s, uu, w_prev=wp),
        )(st, u, w_prev)
        return st2, info.w, info.success, info.iterations

    w_neutral = jax.jit(jax.vmap(lambda s: step.init_w(s.v, s.w, mech.params)))(
        batt
    )
    args = (mech.params, batt, u, w_neutral)
    config = {"phase": "steps", "B": B, "dtype": "f32"}
    return batched, args, config


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    import jax

    from dojo_tpu.aot import load_aot, save_aot

    batched, args, config = build()
    if mode == "save":
        t0 = time.perf_counter()
        compiled = jax.jit(batched).lower(*args).compile()
        print(f"compile: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        save_aot("steps_b256", compiled, config)
        print(f"save: {time.perf_counter() - t0:.1f}s")
        out = compiled(*args)
        jax.block_until_ready(out)
        print("compiled run ok, success:", float(out[2].mean()))
    else:
        t0 = time.perf_counter()
        fn = load_aot("steps_b256", config)
        print(f"load: {time.perf_counter() - t0:.1f}s")
        assert fn is not None, "AOT load failed"
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"first call: {time.perf_counter() - t0:.2f}s, "
              f"success: {float(out[2].mean())}")
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"second call: {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
