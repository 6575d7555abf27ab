"""Sequential broadcast-config walking probe over the bench's AOT blob.

scripts/tune_walk.py sweeps configs PER-LANE, but a heterogeneous batch
pays the worst lane's solver cost in every one of the ~81 sequential inner
solves — measured >140 s per control step vs ~4 s for a healthy broadcast
batch (the aggressive lanes drive every solve to max_iter + rescue).  This
probe instead runs each candidate as a BROADCAST batch (all 32 lanes the
same config, the exact shipped configuration), sequentially, on the one
loaded executable: a healthy candidate costs ~45 s, an unhealthy one is
visible (and abortable) after the first step.

Run on TPU: `python scripts/walk_probe.py`
Env: PROBE_K (control steps, default 12), PROBE_CONFIGS (semicolon list of
comma k=v sets, e.g. "kff=5;kff=10,swing=1.5,stance=0.3"), BENCH_MPC_B.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from dojo_tpu.aot import load_aot
from dojo_tpu.cachedir import enable_compile_cache

enable_compile_cache()

DEFAULTS = dict(kff=0.0, swing=1.0, stance=1.0, joint_w=1.0, reg=10.0,
                springs=40.0, dampers=4.0, r_mul=1.0, du_max=1e9,
                # gait-geometry fields (TrotSpec) — runtime data through
                # `goals`, so the spec sweeps on the same executable too
                vx=0.25, period=0.6, sweep=0.25, thigh_swing=0.30,
                calf_swing=0.30)

SPEC_KEYS = ("vx", "period", "sweep", "thigh_swing", "calf_swing")


def parse_configs():
    s = os.environ.get(
        "PROBE_CONFIGS",
        "kff=2;kff=5;kff=10;swing=1.5,stance=0.3;"
        "kff=5,swing=1.5,stance=0.3;kff=10,swing=1.5,stance=0.3",
    )
    out = []
    for part in s.split(";"):
        c = dict(DEFAULTS)
        if part.strip():
            for kv in part.split(","):
                k, v = kv.split("=")
                c[k.strip()] = float(v)
        out.append(c)
    return out


def main():
    B = int(os.environ.get("BENCH_MPC_B", "32"))
    K = int(os.environ.get("PROBE_K", "12"))
    MODE = os.environ.get("BENCH_MPC_MODE", "rt")
    H, DT = 40, 0.05

    from dojo_tpu import models
    from dojo_tpu.mpc import (
        TrotSpec, trot_gains, trot_spring_params, trot_weight_schedule,
    )
    from dojo_tpu.mpc.trot import trot_reference

    mech = models.get_mechanism("quadruped", timestep=DT).cast(jnp.float32)

    config = bench._mpc_config(B)
    name = f"mpc_{MODE}_b{B}"
    aot = load_aot(name, config)
    assert aot is not None and aot.example_args is not None, name
    stored_args, stored_aux = aot.example_args
    _, ys0, ctrl0, w_plant0, _, _ = jax.tree.map(jnp.asarray, stored_args)
    y0 = jnp.asarray(stored_aux["y0"])
    fn = aot

    ts = jnp.arange(K + 1, dtype=jnp.float32) * DT
    goals_fn = jax.jit(jax.vmap(
        lambda t, spec_v: trot_reference(
            mech, t, H, DT, TrotSpec(*spec_v)
        ),
        in_axes=(0, None),
    ))

    def spec_of(c):
        return TrotSpec(**{
            f: c[f] for f in SPEC_KEYS if f in TrotSpec._fields
        })

    bcast = lambda tree: jax.tree.map(
        lambda a: jnp.broadcast_to(jnp.asarray(a), (B,) + jnp.shape(a)), tree
    )
    print(f"{'config':44s} {'adv_frac':>8} {'adv_m':>6} {'z':>5} {'okf':>5} "
          f"{'okp':>5} {'s/step':>7}")
    for c in parse_configs():
        spec = spec_of(c)
        goals_all = goals_fn(ts, tuple(
            jnp.float32(getattr(spec, f)) for f in TrotSpec._fields
        ))
        cmd = c["vx"] * K * DT
        g = trot_gains(mech, joint_w=c["joint_w"], reg=c["reg"],
                       kff=c["kff"], r_mul=c["r_mul"], du_max=c["du_max"],
                       dtype=jnp.float32)
        Qs = trot_weight_schedule(mech, jnp.float32(0.0), H, DT, spec,
                                  g.Qd, swing_scale=c["swing"],
                                  stance_scale=c["stance"])
        g = g._replace(Qd=Qs.astype(jnp.float32))
        p = trot_spring_params(mech, springs=c["springs"],
                               dampers=c["dampers"])
        params_b, gains_b = bcast(p), bcast(g)
        ys, ctrl, w_plant = ys0, ctrl0, w_plant0
        okfs, oks = [], []
        t0 = time.perf_counter()
        for k in range(K):
            ys, ctrl, w_plant, cost, okf, ok = fn(
                params_b, ys, ctrl, w_plant, goals_all[k], gains_b
            )
            okfs.append(np.asarray(okf))
            oks.append(np.asarray(ok))
        jax.block_until_ready(ys)
        dt_all = time.perf_counter() - t0
        ys_np = np.asarray(ys)
        adv = float(np.mean(ys_np[:, 0]) - float(y0[0]))
        label = ",".join(
            f"{k}={v:g}" for k, v in c.items() if v != DEFAULTS[k]
        ) or "defaults"
        print(f"{label:44s} {adv / cmd:>8.3f} {adv:>6.3f} "
              f"{float(np.mean(ys_np[:, 2])):>5.2f} "
              f"{float(np.mean(okfs)):>5.2f} {float(np.mean(oks)):>5.2f} "
              f"{dt_all / K:>7.1f}", flush=True)


if __name__ == "__main__":
    main()
