"""Hardware walking-tuning harness over the SAME compiled executable as
bench.py phase_mpc.

The r5 bench vmaps params AND gains per-lane, so a "sweep" is just feeding
a DIFFERENT tuning config to every lane of one batched control_step — the
full closed loop over the candidate grid costs exactly one benchmark run,
and when the bench's AOT blob exists it costs zero compilation too.

Swept per lane (all runtime data): kff (gait feedforward gain), weight
schedule (swing/stance scales), joint_w, reg, springs/dampers.

Usage (TPU relay):
  BENCH_MPC_MODE=rt TUNE_K=30 python scripts/tune_walk.py
Env: TUNE_B (default 32 — must match the AOT blob's batch), TUNE_K
(closed-loop control steps, default 30 = 1.5 s).
"""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from dojo_tpu.aot import load_aot, save_aot
from dojo_tpu.cachedir import enable_compile_cache

enable_compile_cache()


def lane_configs(B):
    """B tuning configs: (kff, swing_scale, stance_scale, joint_w, reg,
    springs, dampers)."""
    grid = list(itertools.product(
        (0.0, 5.0, 10.0, 20.0),        # kff
        ((1.0, 1.0), (1.5, 0.3)),      # (swing, stance) weight schedule
        (1.0, 4.0),                    # joint_w
        (10.0, 3.0),                   # reg
    ))  # 4*2*2*2 = 32
    cfgs = []
    for kff, (sw, st), jw, reg in grid:
        cfgs.append(dict(kff=kff, swing=sw, stance=st, joint_w=jw, reg=reg,
                         springs=40.0, dampers=4.0))
    while len(cfgs) < B:
        cfgs.append(cfgs[-1])
    return cfgs[:B]


def main():
    B = int(os.environ.get("TUNE_B", "32"))
    K = int(os.environ.get("TUNE_K", "30"))
    MODE = os.environ.get("BENCH_MPC_MODE", "rt")
    os.environ["BENCH_MPC_K"] = str(max(K, 10))

    from dojo_tpu import models
    from dojo_tpu.mpc import TrotSpec, trot_gains, trot_spring_params, \
        trot_weight_schedule
    H, DT = 40, 0.05
    spec = TrotSpec()
    mech = models.get_mechanism("quadruped", timestep=DT).cast(jnp.float32)

    # per-lane gains/params
    cfgs = lane_configs(B)
    g_lanes, p_lanes = [], []
    for c in cfgs:
        g = trot_gains(mech, joint_w=c["joint_w"], reg=c["reg"],
                       kff=c["kff"], dtype=jnp.float32)
        Qs = trot_weight_schedule(mech, jnp.float32(0.0), H, DT, spec,
                                  g.Qd, swing_scale=c["swing"],
                                  stance_scale=c["stance"])
        g_lanes.append(g._replace(Qd=Qs.astype(jnp.float32)))
        p_lanes.append(trot_spring_params(mech, springs=c["springs"],
                                          dampers=c["dampers"]))
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    gains_b = stack(g_lanes)
    params_b = stack(p_lanes)

    # executable + example args (shared with the bench)
    config = bench._mpc_config(B)
    name = f"mpc_{MODE}_b{B}"
    aot = load_aot(name, config)
    if aot is not None and aot.example_args is not None:
        stored_args, stored_aux = aot.example_args
        _, ys, ctrl, w_plant, _, _ = jax.tree.map(jnp.asarray, stored_args)
        goals_all = jnp.asarray(stored_aux["goals_all"])
        y0 = jnp.asarray(stored_aux["y0"])
        fn = aot
    else:
        control_step, args, aux = bench._build_mpc(B)
        _, ys, ctrl, w_plant, goals0, _ = args
        goals_all, y0 = aux["goals_all"], aux["y0"]
        t0 = time.perf_counter()
        compiled = jax.jit(control_step).lower(*args).compile()
        print(f"compile: {time.perf_counter() - t0:.0f}s", flush=True)
        if os.environ.get("BENCH_SAVE_AOT"):
            aux_np = {
                "goals_all": np.asarray(goals_all),
                "y0": np.asarray(y0),
                "vx_cmd": aux["vx_cmd"],
                "steps_per_solve": aux["steps_per_solve"],
            }
            save_aot(name, compiled, config, example_args=(args, aux_np))
        fn = compiled

    # goals for K steps (recompute beyond the stored window)
    from dojo_tpu.mpc.trot import trot_reference
    ts = jnp.arange(K + 1, dtype=jnp.float32) * DT
    goals_all = jax.jit(jax.vmap(
        lambda t: trot_reference(mech, t, H, DT, spec)
    ))(ts)

    okfs, oks = [], []
    t0 = time.perf_counter()
    for k in range(K):
        ys, ctrl, w_plant, c, okf, ok = fn(
            params_b, ys, ctrl, w_plant, goals_all[k], gains_b
        )
        okfs.append(np.asarray(okf))
        oks.append(np.asarray(ok))
    jax.block_until_ready(ys)
    dt_all = time.perf_counter() - t0
    print(f"{K} control steps in {dt_all:.1f}s "
          f"({B * K / dt_all:.1f} solves/s)", flush=True)

    ys_np = np.asarray(ys)
    okf_m = np.mean(okfs, axis=0)
    ok_m = np.mean(oks, axis=0)
    adv = ys_np[:, 0] - float(y0[0])
    cmd = spec.vx * K * DT
    z = ys_np[:, 2]
    order = np.argsort(-adv)
    print(f"{'lane':>4} {'kff':>5} {'sw/st':>9} {'jw':>4} {'reg':>5} "
          f"{'adv_frac':>8} {'z':>5} {'okf':>5} {'okp':>5}")
    for i in order:
        c = cfgs[i]
        print(f"{i:>4} {c['kff']:>5.0f} "
              f"{c['swing']:.1f}/{c['stance']:.1f}   {c['joint_w']:>4.0f} "
              f"{c['reg']:>5.0f} {adv[i] / cmd:>8.3f} {z[i]:>5.2f} "
              f"{okf_m[i]:>5.2f} {ok_m[i]:>5.2f}")


if __name__ == "__main__":
    main()
