"""Closed-loop quadruped trot-MPC (the north-star task), CPU f64 replica of
the bench.py phase_mpc unit: the runtime-tunable iLQR controller
(make_trot_rt) over the spring-held stance (trot_spring_params, gravity-
biased offsets) against the tight plant.

What is asserted — the hardware-validated r4 state (BASELINE.md r4 notes):
the quadruped STANDS at the corrected geometry (z≈0.30) under MPC with
fully healthy solver stats and no floor penetration, matching the
reference's own quadruped behavior anchor (spring-stabilized stance,
SDF ≥ 0 — test/behaviors.jl:1-19), and does not slide backward (the r3
failure mode).  Forward WALKING (progress ≥ 0.5 of commanded) is the open
north-star item: the single-iteration iLQR tracks the gait reference too
slowly to locomote within the horizon (tuning evidence in BASELINE.md);
the infrastructure to close it (runtime-data gains/springs/gait sweeps)
ships this round.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dojo_tpu as dt
from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.gradients import make_rollout_linearize_minimal
from dojo_tpu.minimal import maximal_to_minimal, minimal_to_maximal
from dojo_tpu.mpc import (
    TrotSpec,
    make_trot_rt,
    trot_spring_params,
)
from dojo_tpu.mpc.trot import actuated_indices


@pytest.mark.slow
def test_trot_mpc_stands_and_tracks():
    H, DT, K = 40, 0.05, 30  # 1.5 s closed loop
    mech = models.get_mechanism("quadruped", timestep=DT)
    # corrected standing height for the gait's joint angles (z ≈ 0.30,
    # scripts/rest_pose_probe.py) — z=0.43 drops the robot into impact
    state0 = models.initialize(
        mech, "quadruped", body_position=(0, 0, -0.13)
    )
    y = maximal_to_minimal(mech.topo, mech.params, state0)
    x0 = float(np.asarray(y)[0])

    spec = TrotSpec()
    mpc, ref_fn, gains = make_trot_rt(
        mech, horizon=H, spec=spec,
        opts=SolverOptions(rtol=1e-4, btol=1e-3, max_iter=16, rescue=True),
        dt=DT,
    )
    params = trot_spring_params(mech)  # spring-held stance, biased offsets
    plant_step, _, plant_seed = make_rollout_linearize_minimal(
        mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
    )
    act = jnp.asarray(actuated_indices(mech))
    n_packed = mech.topo.input_dim

    @jax.jit
    def control_step(params, y, us_warm, w, goals, gains):
        u0, us_next, c, okf = mpc(params, y, us_warm, goals, *gains)
        u_full = jnp.zeros(n_packed, u0.dtype).at[act].set(u0)
        y2, w2, _, ok = plant_step(params, y, u_full, w)
        return y2, us_next, w2, c, okf, ok

    us_warm = jnp.zeros((H, 12), dtype=y.dtype)
    w = plant_seed(params, y)
    okfs, oks, min_sdf, zs = [], [], np.inf, []
    for k in range(K):
        y, us_warm, w, c, okf, ok = control_step(
            params, y, us_warm, w,
            ref_fn(jnp.asarray(k * DT, y.dtype)), gains,
        )
        okfs.append(float(okf))
        oks.append(bool(ok))
        state = minimal_to_maximal(mech.topo, mech.params, y)
        min_sdf = min(
            min_sdf,
            float(np.asarray(
                dt.signed_distances(mech.topo, params, state)
            ).min()),
        )
        zs.append(float(np.asarray(y)[2]))
        assert np.isfinite(np.asarray(y)).all(), k

    adv = float(np.asarray(y)[0]) - x0
    # solver health on both the controller's relaxed solves and the tight
    # plant solves (the VERDICT bar)
    assert np.mean(okfs) >= 0.9, np.mean(okfs)
    assert np.mean(oks) >= 0.9, np.mean(oks)
    # stands at the spring-held stance (no collapse: r3/r4 failure was
    # z → 0.13), no floor penetration beyond solver slack
    assert min(zs[-10:]) >= 0.25, zs[-10:]
    assert min_sdf >= -1e-3, min_sdf
    # no backward slide (r3 recorded forward_progress_frac = −0.5)
    assert adv >= -0.02, adv
