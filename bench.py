"""Benchmark: quadruped contact-dynamics solves/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Current stage (round 1): batched quadruped contact-dynamics steps/s via
vmap — the inner kernel of the contact-MPC north star (H=40 MPC solves/s =
steps/s / (40 × SQP iterations)).  vs_baseline compares against the
driver target of 1000 MPC solves/s ≈ 40k contact steps/s per chip.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.simulate import make_step

    mech = models.get_mechanism("quadruped", timestep=0.05)
    f32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        t,
    )
    state = f32(models.initialize(mech, "quadruped"))
    mech.params = f32(mech.params)
    opts = SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
    step = make_step(mech.topo, opts)

    B = int(os.environ.get("BENCH_B", "256"))  # scenario batch per chip
    batt = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
    u = jnp.zeros((B, mech.topo.nj, 6), dtype=state.x.dtype)

    @jax.jit
    def batched_step(params, st, u):
        new_state, info = jax.vmap(step, in_axes=(None, 0, 0))(params, st, u)
        return new_state, (info.iterations, info.success)

    # warmup/compile
    st2, iters = batched_step(mech.params, batt, u)
    jax.block_until_ready(st2)

    # timed: K sequential batched steps (chained, like an MPC rollout)
    K = int(os.environ.get("BENCH_K", "10"))
    t0 = time.perf_counter()
    st = batt
    for _ in range(K):
        st, iters = batched_step(mech.params, st, u)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0

    steps_per_s = B * K / dt
    mpc_solves_per_s = steps_per_s / 40.0  # H=40 rollout ≈ 1 MPC solve unit
    target = 40000.0  # 1000 MPC solves/s × H=40 contact steps
    its, succ = iters
    print(
        json.dumps(
            {
                "metric": f"quadruped contact-dynamics steps/s/chip (B={B}, h=0.05)",
                "value": round(steps_per_s, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / target, 4),
                "solver_success_rate": round(float(np.mean(np.asarray(succ))), 4),
                "mean_newton_iters": round(float(np.mean(np.asarray(its))), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
