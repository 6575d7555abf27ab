"""Bake a tuned runtime configuration into the MPC AOT blob's stored
example args — zero recompilation.

The bench's AOT path runs the blob with its STORED inputs (bench.py
phase_mpc), so the gains/spring-params the driver measures are whatever
this script last wrote.  After scripts/tune_walk.py finds a winning lane,
rerun with the winning knobs, e.g.:

  BENCH_JW=4 BENCH_REG=3 BENCH_KFF=10 BENCH_SCHED=1.5,0.3 \
  BENCH_SPRINGS=40 BENCH_DAMPERS=4 python scripts/aot_set_gains.py

Env: AOT_NAME (default mpc_rt_b32), BENCH_MPC_B (default 32), plus the
bench's tuning knobs (BENCH_JW, BENCH_REG, BENCH_DU_MAX, BENCH_KFF,
BENCH_SCHED, BENCH_SPRINGS, BENCH_DAMPERS).  Pure CPU — builds the
mechanism only to lay out the gain vectors; never touches the TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from dojo_tpu import models
from dojo_tpu.aot import update_example_args
from dojo_tpu.mpc import (
    TrotSpec,
    trot_gains,
    trot_spring_params,
    trot_weight_schedule,
)


def main():
    B = int(os.environ.get("BENCH_MPC_B", "32"))
    name = os.environ.get("AOT_NAME", f"mpc_rt_b{B}")
    H, DT = 40, 0.05
    spec = TrotSpec()
    mech = models.get_mechanism("quadruped", timestep=DT).cast(jnp.float32)

    gains = trot_gains(
        mech,
        joint_w=float(os.environ.get("BENCH_JW", "1")),
        reg=float(os.environ.get("BENCH_REG", "10")),
        du_max=float(os.environ.get("BENCH_DU_MAX", "1e9")),
        kff=float(os.environ.get("BENCH_KFF", "0")),
        dtype=jnp.float32,
    )
    sched = os.environ.get("BENCH_SCHED")
    if sched:
        swing_s, stance_s = (float(x) for x in sched.split(","))
        Qs = trot_weight_schedule(
            mech, jnp.float32(0.0), H, DT, spec, gains.Qd,
            swing_scale=swing_s, stance_scale=stance_s,
        )
    else:
        Qs = jnp.broadcast_to(gains.Qd, (H + 1, mech.topo.minimal_dim))
    gains = gains._replace(Qd=Qs.astype(jnp.float32))
    params_run = trot_spring_params(
        mech,
        springs=float(os.environ.get("BENCH_SPRINGS", "40")),
        dampers=float(os.environ.get("BENCH_DAMPERS", "4")),
    )
    bcast = lambda tree: jax.tree.map(
        lambda a: np.broadcast_to(np.asarray(a), (B,) + np.shape(a)).copy(),
        tree,
    )
    params_b, gains_b = bcast(params_run), bcast(gains)

    def rewrite(old):
        (o_params, ys, ctrl, w_plant, goals0, o_gains), aux = old
        chk = jax.tree.map(
            lambda new, o: (np.shape(new), np.asarray(o).dtype),
            (params_b, gains_b), (o_params, o_gains),
        )
        del chk  # shape/dtype sanity: tree structures must match
        return ((params_b, ys, ctrl, w_plant, goals0, gains_b), aux)

    update_example_args(name, rewrite)


if __name__ == "__main__":
    main()
