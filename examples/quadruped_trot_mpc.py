"""Quadruped trot MPC — the north-star task as a runnable example: a
receding-horizon iLQR trot controller (mpc.make_trot_mpc) runs closed-loop
against a tighter-tolerance plant and writes an HTML trajectory player.

This is the single-lane version of bench.py's batched benchmark; on the
1-core CPU host use small K (compile dominates).  Reference behavior
analog: DojoEnvironments/src/environments/quadruped_waypoint.jl trot gait.

Usage: python examples/quadruped_trot_mpc.py [K_control_steps] [out.html]
       python examples/quadruped_trot_mpc.py --resume ...   # continue a run

With --resume the controller state (y, warm-started input sequence, plant
solver solution, step counter) is checkpointed every control step via
dojo_tpu.checkpoint and restored on restart (SURVEY §5 checkpoint/resume).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

CKPT = os.environ.get("TROT_CKPT", "/tmp/dojo_tpu_trot_ckpt")


def main(K=20, out="quadruped_trot.html", H=40, DT=0.05, resume=False):
    from dojo_tpu import models, visuals
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.gradients import make_rollout_linearize_minimal
    from dojo_tpu.minimal import maximal_to_minimal, minimal_to_maximal
    from dojo_tpu.mpc import ILQRConfig, TrotSpec, make_trot_mpc
    from dojo_tpu.mpc.trot import actuated_indices

    mech = models.get_mechanism("quadruped", timestep=DT)
    f32 = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        t,
    )
    mech.params = f32(mech.params)
    state0 = f32(models.initialize(mech, "quadruped"))
    y = maximal_to_minimal(mech.topo, mech.params, state0)

    spec = TrotSpec()
    mpc, ref_fn = make_trot_mpc(
        mech, horizon=H, spec=spec,
        config=ILQRConfig(iterations=1, alphas=(1.0, 0.5)),
        opts=SolverOptions(rtol=1e-4, btol=1e-3, max_iter=12, rescue=False),
        dt=DT,
    )
    plant_step, _, plant_seed = make_rollout_linearize_minimal(
        mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
    )
    act = jnp.asarray(actuated_indices(mech))
    n_packed = mech.topo.input_dim

    @jax.jit
    def control_step(params, y, us_warm, w, goals):
        u0, us_next, c, okf = mpc(params, y, us_warm, goals)
        u_full = jnp.zeros(n_packed, u0.dtype).at[act].set(u0)
        y2, w2, _, ok = plant_step(params, y, u_full, w)
        return y2, us_next, w2, c, okf, ok

    us_warm = jnp.zeros((H, 12), dtype=jnp.float32)
    w = plant_seed(mech.params, y)
    k0 = 0
    run_state = {"y": y, "us_warm": us_warm, "w": w, "k": jnp.asarray(0)}
    if resume:
        from dojo_tpu import checkpoint as ckpt

        try:
            run_state = ckpt.restore(CKPT, run_state)
            y, us_warm, w = run_state["y"], run_state["us_warm"], run_state["w"]
            k0 = int(np.asarray(run_state["k"]))
            print(f"resumed from {CKPT} at control step {k0}")
        except Exception as e:  # first run: nothing to resume
            print(f"no checkpoint at {CKPT} ({e}); starting fresh")

    traj = [np.asarray(y)]
    for k in range(k0, K):
        y, us_warm, w, c, okf, ok = control_step(
            mech.params, y, us_warm, w, ref_fn(jnp.float32(k * DT))
        )
        traj.append(np.asarray(y))
        print(f"k={k:3d} cost={float(c):9.3f} mpc_ok={float(okf):.2f} "
              f"plant_ok={bool(ok)} x={float(y[0]):.3f}")
        if resume:
            from dojo_tpu import checkpoint as ckpt

            ckpt.save(
                CKPT,
                {"y": y, "us_warm": us_warm, "w": w,
                 "k": jnp.asarray(k + 1)},
            )

    states = [minimal_to_maximal(mech.topo, mech.params, jnp.asarray(t))
              for t in traj]
    xs = np.stack([np.asarray(s.x) for s in states])
    qs = np.stack([np.asarray(s.q) for s in states])
    visuals.visualize(mech, xs, qs, out, title="quadruped trot MPC")
    print("wrote", out, "forward progress:", float(traj[-1][0] - traj[0][0]), "m")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--resume"]
    resume = "--resume" in sys.argv[1:]
    K = int(args[0]) if args else 20
    out = args[1] if len(args) > 1 else "quadruped_trot.html"
    main(K=K, out=out, resume=resume)
