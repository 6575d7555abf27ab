"""North-star benchmark: quadruped trot contact-MPC solves/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Structure (hard lesson from BENCH_r02, which OOM'd + timed out and recorded
NOTHING): the orchestrator (this process, stdlib-only — no jax import) runs
each measurement in a SUBPROCESS with its own timeout and prints the best
JSON line obtained so far when it finishes — or when the driver's timeout
SIGTERMs it.  Something always lands on stdout with rc=0.

  phase "steps": raw contact-step throughput (the round-1 metric) — small,
      known-good compile; runs first so a result exists within minutes.
  phase "mpc":  the north-star metric — receding-horizon quadruped trot
      contact-MPC solves/s (H=40 knots, dt=0.05, warm-started iLQR re-solve:
      rollout + IFT linearization reusing the contact solves + Riccati +
      line-searched forward), vmapped over scenarios, closed-loop against a
      tighter-tolerance plant.  Runs at a small batch first (guaranteed MPC
      number), then the full batch.  Linearization is knot-chunked
      (ILQRConfig.linearize_chunk) so the per-knot KKT block stacks never
      materialize at (B, H, ...) — the r2 OOM.

vs_baseline compares against the driver target of 1000 MPC solves/s/chip.

Env knobs: BENCH_BUDGET_S (orchestrator budget, default 2400),
BENCH_MPC_B (full batch, default 256), BENCH_MPC_B_SMALL (default 32),
BENCH_MPC_K (control steps, default 10), BENCH_ITERS (iLQR iters/solve,
default 1), BENCH_LIN_CHUNK (default 8), BENCH_PHASE (run one phase inline).
"""

import json
import os
import signal
import subprocess
import sys
import time

TARGET_MPC = 1000.0  # driver north star: MPC solves/s/chip
TARGET_STEPS = 40000.0  # raw-steps anchor used since round 1


def _enable_compile_cache():
    """Persistent XLA cache for relay/TPU runs (NOT shared with the local
    CPU test cache — relay-compiled CPU AOT blobs segfault this host).
    Lives under the repo (not /tmp, which is wiped between sessions)."""
    from dojo_tpu.cachedir import enable_compile_cache

    enable_compile_cache()


def _cache_entries():
    """Number of files in the XLA compile cache (cache-hit telemetry: a
    compile that added no files was served from the persistent cache)."""
    from dojo_tpu.cachedir import repo_cache_dir

    try:
        return len(os.listdir(repo_cache_dir()))
    except OSError:
        return 0


def _device_kind():
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}"


# --------------------------------------------------------------------------
# phase: steps — raw contact-step throughput
# --------------------------------------------------------------------------


def phase_steps():
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.simulate import make_step

    B = int(os.environ.get("BENCH_STEPS_B", "256"))
    K = int(os.environ.get("BENCH_STEPS_K", "10"))
    mech = models.get_mechanism("quadruped", timestep=0.05).cast(jnp.float32)
    state = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32),
        models.initialize(mech, "quadruped"),
    )
    step = make_step(mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30))
    batt = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
    u = jnp.zeros((B, mech.topo.nj, 6), dtype=jnp.float32)

    # steady-state steps warm-start the solver from the previous step's
    # solution (StepInfo.w → init_w(w_prev) re-centering), exactly the
    # reference's warm start from previous velocities (mechanism/set.jl:21-24
    # + our cone re-centering) — roughly halves Newton iterations
    @jax.jit
    def batched(params, st, u, w_prev):
        st2, info = jax.vmap(
            lambda s, uu, wp: step(params, s, uu, w_prev=wp),
        )(st, u, w_prev)
        return st2, info.w, info.success, info.iterations

    # cold start = warm graph fed the cone-neutral init point (init_w with
    # w_prev=neutral reproduces the cold reset, so ONE compiled graph serves
    # both phases — a second "cold" jit doubled the steps-phase compile)
    w_neutral = jax.jit(
        jax.vmap(lambda s: step.init_w(s.v, s.w, mech.params))
    )(batt)

    n_cache0 = _cache_entries()
    t_c = time.perf_counter()
    st, w, ok, it = batched(mech.params, batt, u, w_neutral)
    jax.block_until_ready(st)
    t_c = time.perf_counter() - t_c
    it_cold = float(np.mean(np.asarray(it)))
    st, w, ok, it = batched(mech.params, st, u, w)
    warm = True
    if float(np.mean(np.asarray(ok))) < 0.9:
        # warm chain unhealthy on this backend — fall back to cold-start
        # steps (same compiled graph fed the neutral init each call)
        warm = False
        st = batt
    t0 = time.perf_counter()
    oks, its = [], []
    for _ in range(K):
        st, w, ok, it = batched(
            mech.params, st, u, w if warm else w_neutral
        )
        oks.append(ok)
        its.append(it)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0
    ok = jnp.stack(oks)
    it = jnp.stack(its)
    sps = B * K / dt
    print(
        json.dumps(
            {
                "metric": (
                    f"quadruped contact-dynamics steps/s/chip (B={B}, "
                    f"h=0.05{', warm-started' if warm else ''})"
                ),
                "value": round(sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(sps / TARGET_STEPS, 4),
                "solver_success_rate": round(float(np.mean(np.asarray(ok))), 4),
                "mean_newton_iters": round(float(np.mean(np.asarray(it))), 1),
                "cold_newton_iters": round(it_cold, 1),
                "compile_s": round(t_c, 1),
                "device": _device_kind(),
                "cache_hit": _cache_entries() == n_cache0,
            }
        ),
        flush=True,
    )


# --------------------------------------------------------------------------
# phase: mpc — the north-star metric
# --------------------------------------------------------------------------


def phase_mpc():
    import jax
    import jax.numpy as jnp
    import numpy as np

    _enable_compile_cache()

    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.gradients import make_rollout_linearize_minimal
    from dojo_tpu.minimal import maximal_to_minimal
    from dojo_tpu.mpc import (
        ILQRConfig,
        TrotSpec,
        make_trot_mpc,
        make_trot_rt,
        make_trot_rti,
        trot_gains,
        trot_spring_params,
    )
    from dojo_tpu.mpc.trot import actuated_indices

    # default B_full == B_small: the B=128 rt config hit a TPU device fault
    # at first execution during priming (kernel fault / infra — unresolved
    # this round; B=32 is primed and verified).  Export BENCH_MPC_B=128 to
    # attempt the full batch explicitly.
    B_full = int(os.environ.get("BENCH_MPC_B", "32"))
    B_small = int(os.environ.get("BENCH_MPC_B_SMALL", "32"))
    K = int(os.environ.get("BENCH_MPC_K", "10"))
    ITERS = int(os.environ.get("BENCH_ITERS", "1"))
    # "rt" (default): runtime-tunable iLQR (make_trot_rt) — cost diagonals,
    # Riccati reg, control clamp, and joint springs are traced DATA, so the
    # tuned values never invalidate the compiled graph (BASELINE.md r4);
    # "rti": real-time-iteration controller (one linearize+Riccati+forward
    # per control step, H sequential contact solves — mpc/ilqr.make_rti_mpc);
    # "ilqr": full re-solve with baked cost (rollout + 2-alpha forward)
    # knot-chunked linearize (lax.map) is OFF by default on TPU: the
    # scan-of-vmap batched-matmul pattern trips an XLA:TPU mis-rewrite into
    # a base-dilated convolution ("Expected instruction to have shape equal
    # to f32[16,32,8,14,14]", internal compiler error).  B=128 at full-H
    # vmap keeps the (B,H,nodes,14,14) block temps ~3 GB — inside v5e HBM
    # (the r2 OOM was B=512 → 12.8 GB).
    CHUNK = int(os.environ.get("BENCH_LIN_CHUNK", "0"))
    H, DT = 40, 0.05
    deadline = float(os.environ.get("BENCH_PHASE_DEADLINE", "1e18"))

    MODE = os.environ.get("BENCH_MPC_MODE", "rt")
    mech = models.get_mechanism("quadruped", timestep=DT).cast(jnp.float32)
    # rt mode starts at the TRUE standing height for the gait's joint
    # angles (z≈0.30, measured by scripts/rest_pose_probe.py) — the old
    # default (z=0.43) drops the robot 0.13 m into impact chaos
    init_kw = {"body_position": (0, 0, -0.13)} if MODE == "rt" else {}
    state0 = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32),
        models.initialize(mech, "quadruped", **init_kw),
    )
    y0 = maximal_to_minimal(mech.topo, mech.params, state0)
    ny = mech.topo.minimal_dim

    spec = TrotSpec()
    # rescue=False: failures are data for the controller (BASELINE.md) —
    # halves the compiled program vs the dense-rescue second pass
    mpc_opts = SolverOptions(rtol=1e-4, btol=1e-3, max_iter=12, rescue=False)
    gains = None
    params_run = mech.params
    if MODE == "rt":
        # controller rescue=True: at float32, ~12% of forward-pass knots
        # (impact steps) fail without it and poison the warm-started chain
        # — the line search then never accepts (r4 tuning finding)
        rt_opts = SolverOptions(rtol=1e-4, btol=1e-3, max_iter=16,
                                rescue=True)
        mpc, ref_fn, gains = make_trot_rt(
            mech, horizon=H, spec=spec, opts=rt_opts, dt=DT,
            iterations=ITERS,
        )
        gains = trot_gains(
            mech, joint_w=float(os.environ.get("BENCH_JW", "1")),
        )
        gains = gains._replace(
            reg=jnp.float32(float(os.environ.get("BENCH_REG", "10"))),
            du_max=jnp.float32(float(os.environ.get("BENCH_DU_MAX", "1e9"))),
        )
        params_run = trot_spring_params(
            mech,
            springs=float(os.environ.get("BENCH_SPRINGS", "40")),
            dampers=float(os.environ.get("BENCH_DAMPERS", "4")),
        )
        steps_per_solve = H * (1 + ITERS * 4) + 1
    elif MODE == "rti":
        rti_init, mpc, ref_fn = make_trot_rti(
            mech, horizon=H, spec=spec,
            config=ILQRConfig(alphas=(1.0,), linearize_chunk=CHUNK),
            opts=mpc_opts, dt=DT,
        )
        steps_per_solve = H + 1  # forward rollout + plant step
    else:
        mpc, ref_fn = make_trot_mpc(
            mech, horizon=H, spec=spec,
            config=ILQRConfig(
                iterations=ITERS, alphas=(1.0, 0.5), linearize_chunk=CHUNK
            ),
            opts=mpc_opts, dt=DT,
        )
        # rollout H + iters * (n_alpha * H fwd) + plant step
        steps_per_solve = H * (1 + ITERS * 2) + 1
    # plant: tighter tolerances than the controller's relaxed solves
    plant_opts = SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
    plant_step, _, plant_seed = make_rollout_linearize_minimal(
        mech.topo, plant_opts
    )
    act = jnp.asarray(actuated_indices(mech))
    n_packed = mech.topo.input_dim

    # goals (and in rt mode the cost/reg/clamp gains + spring params) are
    # computed OUTSIDE the jit and passed as data: tuning then never
    # recompiles the 30-min control_step graph.  All controller modes share
    # the carry signature mpc(..., y, <carried>, goals, ...) →
    # (u0, <carried>', c, okf): <carried> is the warm-start control
    # sequence (rt/ilqr) or the RTIState trajectory (rti).
    if MODE == "rt":
        def mpc_call(params, ys, ctrl, goals, gains):
            return jax.vmap(
                mpc, in_axes=(None, 0, 0) + (None,) * 6
            )(params, ys, ctrl, goals, *gains)
    else:
        def mpc_call(params, ys, ctrl, goals, gains):
            return jax.vmap(
                mpc, in_axes=(None, 0, 0, None)
            )(params, ys, ctrl, goals)

    @jax.jit
    def control_step(params, ys, ctrl, w_plant, goals, gains):
        u0, ctrl2, c, okf = mpc_call(params, ys, ctrl, goals, gains)
        u_full = jax.vmap(
            lambda u: jnp.zeros(n_packed, u.dtype).at[act].set(u)
        )(u0)
        ys2, w2, _, ok = jax.vmap(
            plant_step, in_axes=(None, 0, 0, 0)
        )(params, ys, u_full, w_plant)
        return ys2, ctrl2, w2, c, okf, ok

    def make_batch(B):
        rng = np.random.default_rng(0)
        pert = np.zeros((B, ny), dtype=np.float32)
        pert[:, :2] = rng.normal(scale=0.01, size=(B, 2))  # base xy
        pert[:, 6:9] = rng.normal(scale=0.02, size=(B, 3))  # base velocity
        ys = jnp.asarray(np.asarray(y0)[None] + pert)
        us_warm = jnp.zeros((B, H, 12), dtype=jnp.float32)
        w_plant = jax.vmap(lambda y: plant_seed(params_run, y))(ys)
        if MODE == "rti":
            goals0 = ref_fn(jnp.float32(0.0))
            ctrl = jax.jit(
                jax.vmap(rti_init, in_axes=(None, 0, 0, None))
            )(params_run, ys, us_warm, goals0)
        else:
            ctrl = us_warm
        return ys, ctrl, w_plant

    def run_config(B, label_extra=""):
        ys, ctrl, w_plant = make_batch(B)
        goals0 = jax.block_until_ready(ref_fn(jnp.float32(0.0)))
        n_cache0 = _cache_entries()
        t_compile = time.perf_counter()
        out = control_step(params_run, ys, ctrl, w_plant, goals0, gains)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t_compile

        viz_path = os.environ.get("BENCH_MPC_VIZ") if B == B_full else None
        lane0 = [np.asarray(ys)[0]]
        lat, okfs, oks = [], [], []
        t_all = time.perf_counter()
        for k in range(K):
            t0 = time.perf_counter()
            ys, ctrl, w_plant, c, okf, ok = control_step(
                params_run, ys, ctrl, w_plant,
                ref_fn(jnp.float32(k * DT)), gains,
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
        adv = float(np.mean(np.asarray(ys)[:, 0]) - np.mean(np.asarray(y0)[0]))
        cmd = spec.vx * K * DT
        print(
            json.dumps(
                {
                    "metric": (
                        f"quadruped trot contact-MPC solves/s/chip "
                        f"(H={H}, dt={DT}, B={B}, {MODE}"
                        f"{label_extra})"
                    ),
                    "value": round(solves_per_s, 1),
                    "unit": "solves/s",
                    "vs_baseline": round(solves_per_s / TARGET_MPC, 4),
                    "p50_solve_latency_ms": round(p50_ms, 1),
                    "real_time_budget_ms": 50.0,
                    "contact_steps_per_s": round(
                        solves_per_s * steps_per_solve, 0
                    ),
                    "mpc_solver_success": round(float(np.mean(okfs)), 4),
                    "plant_solver_success": round(float(np.mean(oks)), 4),
                    "tracking_cost": round(float(np.mean(np.asarray(c))), 3),
                    "forward_progress_frac": (
                        round(adv / cmd, 3) if cmd else None
                    ),
                    "compile_s": round(t_compile, 1),
                    "device": _device_kind(),
                    "cache_hit": _cache_entries() == n_cache0,
                }
            ),
            flush=True,
        )
        return t_compile, t_all

    # small batch first: guarantees an MPC-metric line lands even if the
    # full-batch attempt OOMs or exceeds the phase timeout
    t_compile, t_run = run_config(B_small, " [small-batch preflight]")
    if B_full > B_small:
        # only attempt the full batch if the remaining budget plausibly
        # covers a second compile + a linearly-scaled run
        est = t_compile * 0.5 + t_run * (B_full / B_small) + 60.0
        if time.time() + est < deadline:
            run_config(B_full)
        else:
            print(
                f"bench: skipping B={B_full} (est {est:.0f}s exceeds budget)",
                file=sys.stderr,
            )


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

_best = None
_child = None


def _emit_and_exit(signum=None, frame=None):
    global _child
    if _child is not None and _child.poll() is None:
        try:
            os.killpg(os.getpgid(_child.pid), signal.SIGKILL)
        except Exception:
            pass
    out = _best or {
        "metric": "bench failed (no phase produced a result)",
        "value": 0.0,
        "unit": "solves/s",
        "vs_baseline": 0.0,
    }
    print(json.dumps(out), flush=True)
    os._exit(0)


def _run_phase(name, timeout_s, extra_env=None):
    """Run `bench.py --phase name` in a new session; return the last JSON
    line it printed (or None)."""
    global _child
    env = dict(os.environ)
    env["BENCH_PHASE"] = name
    env.update(extra_env or {})
    _child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        env=env,
        start_new_session=True,
    )
    try:
        out, _ = _child.communicate(timeout=timeout_s)
        rc = _child.returncode
    except subprocess.TimeoutExpired:
        try:
            os.killpg(os.getpgid(_child.pid), signal.SIGKILL)
        except Exception:
            pass
        out, _ = _child.communicate()
        rc = "timeout"
    _child = None
    result = None
    for line in (out or "").strip().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
            except Exception:
                pass
    print(f"bench phase {name}: rc={rc} parsed={result is not None}",
          file=sys.stderr)
    if result is not None:
        # keep every phase's numbers on record (stdout carries only the
        # final best line for the driver)
        print(f"bench phase {name} result: {json.dumps(result)}",
              file=sys.stderr)
    return result


def orchestrate():
    global _best
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)
    budget = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    t_end = time.time() + budget

    steps_timeout = min(900.0, 0.4 * budget)
    r = _run_phase("steps", steps_timeout)
    if r:
        _best = r

    mpc_timeout = max(60.0, t_end - time.time() - 30.0)
    r = _run_phase(
        "mpc", mpc_timeout,
        {"BENCH_PHASE_DEADLINE": str(time.time() + mpc_timeout - 20.0)},
    )
    if r:
        _best = r
    _emit_and_exit()


if __name__ == "__main__":
    phase = os.environ.get("BENCH_PHASE")
    if phase == "steps":
        phase_steps()
    elif phase == "mpc":
        phase_mpc()
    else:
        orchestrate()
