"""North-star benchmark: quadruped trot contact-MPC solves/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The benchmark unit is one receding-horizon contact-MPC solve on the
quadruped (H=40 knots, dt=0.05 — BASELINE.json config "Quadruped trot-gait
MPC"): a warm-started iLQR re-solve (rollout + IFT linearization reusing
the contact solves + Riccati backward + line-searched forward), tracking a
procedural trot reference, vmapped over a batch of scenarios.  After each
solve the plant advances with the returned u0 (closed loop).

vs_baseline compares against the driver target of 1000 MPC solves/s/chip.
Secondary fields: p50 per-solve latency vs the 50 ms real-time budget, raw
contact-step throughput inside the MPC, solver success rates, and gait
quality (forward progress per commanded distance).

Env knobs: BENCH_MPC_B (batch, default 512), BENCH_MPC_K (control steps,
default 10), BENCH_ITERS (iLQR iterations/solve, default 1).
"""

import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA cache for relay/TPU runs (NOT shared with the local
    CPU test cache — relay-compiled CPU AOT blobs segfault this host)."""
    import jax

    try:
        if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            jax.config.update(
                "jax_compilation_cache_dir", "/tmp/dojo_tpu_xla_cache"
            )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.gradients import make_rollout_linearize_minimal
    from dojo_tpu.minimal import maximal_to_minimal
    from dojo_tpu.mpc import ILQRConfig, TrotSpec, make_trot_mpc

    B = int(os.environ.get("BENCH_MPC_B", "512"))
    K = int(os.environ.get("BENCH_MPC_K", "10"))
    ITERS = int(os.environ.get("BENCH_ITERS", "1"))
    H, DT = 40, 0.05

    mech = models.get_mechanism("quadruped", timestep=DT)
    f32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        t,
    )
    mech.params = f32(mech.params)
    state0 = f32(models.initialize(mech, "quadruped"))
    y0 = maximal_to_minimal(mech.topo, mech.params, state0)
    ny = mech.topo.minimal_dim

    spec = TrotSpec()
    # rescue=False: failures are data for the controller (BASELINE.md) —
    # halves the compiled program vs the dense-rescue second pass
    mpc_opts = SolverOptions(rtol=1e-4, btol=1e-3, max_iter=12, rescue=False)
    mpc, ref_fn = make_trot_mpc(
        mech, horizon=H, spec=spec,
        config=ILQRConfig(iterations=ITERS, alphas=(1.0, 0.5)),
        opts=mpc_opts, dt=DT,
    )
    # plant: tighter tolerances than the controller's relaxed solves
    plant_opts = SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
    plant_step, _, plant_seed = make_rollout_linearize_minimal(
        mech.topo, plant_opts
    )
    from dojo_tpu.mpc.trot import actuated_indices

    act = jnp.asarray(actuated_indices(mech))
    n_packed = mech.topo.input_dim

    # scenario batch: small per-lane perturbations of the standing pose
    rng = np.random.default_rng(0)
    pert = np.zeros((B, ny), dtype=np.float32)
    pert[:, :2] = rng.normal(scale=0.01, size=(B, 2))  # base xy
    pert[:, 6:9] = rng.normal(scale=0.02, size=(B, 3))  # base velocity
    ys = jnp.asarray(np.asarray(y0)[None] + pert)
    us_warm = jnp.zeros((B, H, 12), dtype=jnp.float32)
    w_plant = jax.vmap(lambda y: plant_seed(mech.params, y))(ys)

    @jax.jit
    def control_step(params, ys, us_warm, w_plant, t0):
        goals = ref_fn(t0)
        u0, us_next, c, okf = jax.vmap(
            mpc, in_axes=(None, 0, 0, None)
        )(params, ys, us_warm, goals)
        u_full = jax.vmap(
            lambda u: jnp.zeros(n_packed, u.dtype).at[act].set(u)
        )(u0)
        ys2, w2, _, ok = jax.vmap(
            plant_step, in_axes=(None, 0, 0, 0)
        )(params, ys, u_full, w_plant)
        return ys2, us_next, w2, c, okf, ok

    # warmup/compile
    t_compile = time.perf_counter()
    out = control_step(mech.params, ys, us_warm, w_plant, jnp.float32(0.0))
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t_compile

    viz_path = os.environ.get("BENCH_MPC_VIZ")  # e.g. docs/trot.html
    lane0 = [np.asarray(ys)[0]]
    lat = []
    okfs, oks = [], []
    t_all = time.perf_counter()
    for k in range(K):
        t0 = time.perf_counter()
        ys, us_warm, w_plant, c, okf, ok = control_step(
            mech.params, ys, us_warm, w_plant, jnp.float32(k * DT)
        )
        jax.block_until_ready(ys)
        lat.append(time.perf_counter() - t0)
        okfs.append(np.asarray(okf))
        oks.append(np.asarray(ok))
        if viz_path:
            lane0.append(np.asarray(ys)[0])
    t_all = time.perf_counter() - t_all

    if viz_path:
        from dojo_tpu import visuals
        from dojo_tpu.minimal import minimal_to_maximal

        states = [
            minimal_to_maximal(mech.topo, mech.params, jnp.asarray(y))
            for y in lane0
        ]
        xs = np.stack([np.asarray(s.x) for s in states])
        qs = np.stack([np.asarray(s.q) for s in states])
        visuals.visualize(mech, xs, qs, viz_path, title="quadruped trot MPC")

    solves_per_s = B * K / t_all
    p50_ms = float(np.median(lat) * 1e3)
    # contact solves per MPC solve: rollout H + iters * (n_alpha * H fwd)
    steps_per_solve = H * (1 + ITERS * 2) + 1  # +1 plant step
    target = 1000.0

    # gait quality: commanded forward distance vs achieved
    adv = float(np.mean(np.asarray(ys)[:, 0]) - np.mean(np.asarray(y0)[0]))
    cmd = spec.vx * K * DT
    print(
        json.dumps(
            {
                "metric": (
                    f"quadruped trot contact-MPC solves/s/chip "
                    f"(H={H}, dt={DT}, B={B}, iLQR iters={ITERS})"
                ),
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / target, 4),
                "p50_solve_latency_ms": round(p50_ms, 1),
                "real_time_budget_ms": 50.0,
                "contact_steps_per_s": round(solves_per_s * steps_per_solve, 0),
                "mpc_solver_success": round(float(np.mean(okfs)), 4),
                "plant_solver_success": round(float(np.mean(oks)), 4),
                "tracking_cost": round(float(np.mean(np.asarray(c))), 3),
                "forward_progress_frac": round(adv / cmd, 3) if cmd else None,
                "compile_s": round(t_compile, 1),
            }
        )
    )


def fallback_steps_bench():
    """Raw contact-step throughput (the round-1 metric) — printed if the
    full MPC bench cannot run (e.g. compile/backend failure), so the driver
    always records ONE JSON line."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.simulate import make_step

    B, K = 256, 10
    mech = models.get_mechanism("quadruped", timestep=0.05)
    f32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        t,
    )
    mech.params = f32(mech.params)
    state = f32(models.initialize(mech, "quadruped"))
    step = make_step(mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30))
    batt = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
    u = jnp.zeros((B, mech.topo.nj, 6), dtype=jnp.float32)

    @jax.jit
    def batched(params, st, u):
        st2, info = jax.vmap(step, in_axes=(None, 0, 0))(params, st, u)
        return st2, info.success

    st, ok = batched(mech.params, batt, u)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for _ in range(K):
        st, ok = batched(mech.params, st, u)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0
    sps = B * K / dt
    print(
        json.dumps(
            {
                "metric": "quadruped contact-dynamics steps/s/chip "
                "(B=256, h=0.05; FALLBACK — MPC bench failed)",
                "value": round(sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(sps / 40000.0, 4),
                "solver_success_rate": round(float(np.mean(np.asarray(ok))), 4),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always emit one JSON line
        import sys, traceback

        traceback.print_exc(file=sys.stderr)
        fallback_steps_bench()
