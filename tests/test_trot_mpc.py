"""Closed-loop quadruped trot MPC locomotion (the north-star task): the
receding-horizon iLQR trot controller must actually make the quadruped WALK
— forward progress, solver health, and no foot penetration over a ≥2 s
closed loop (reference behavior anchor: quadruped walks 5 s with SDF ≥ 0,
test/behaviors.jl:1-19; driver config BASELINE.json H=40 dt=0.05).

CPU float64 version of the benchmark unit in bench.py phase_mpc."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dojo_tpu as dt
from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.gradients import make_rollout_linearize_minimal
from dojo_tpu.minimal import maximal_to_minimal, minimal_to_maximal
from dojo_tpu.mpc import ILQRConfig, TrotSpec, make_trot_mpc
from dojo_tpu.mpc.trot import actuated_indices


@pytest.mark.slow
def test_trot_mpc_walks():
    H, DT, K = 40, 0.05, 40  # 2 s closed loop
    mech = models.get_mechanism("quadruped", timestep=DT)
    state0 = models.initialize(mech, "quadruped")
    y = maximal_to_minimal(mech.topo, mech.params, state0)
    x0 = float(np.asarray(y)[0])

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

    us_warm = jnp.zeros((H, 12), dtype=y.dtype)
    w = plant_seed(mech.params, y)
    okfs, oks, min_sdf = [], [], np.inf
    for k in range(K):
        y, us_warm, w, c, okf, ok = control_step(
            mech.params, y, us_warm, w, ref_fn(jnp.asarray(k * DT, y.dtype))
        )
        okfs.append(float(okf))
        oks.append(bool(ok))
        state = minimal_to_maximal(mech.topo, mech.params, y)
        sdf = float(
            np.asarray(
                dt.signed_distances(mech.topo, mech.params, state)
            ).min()
        )
        min_sdf = min(min_sdf, sdf)
        assert np.isfinite(np.asarray(y)).all(), k

    adv = float(np.asarray(y)[0]) - x0
    cmd = spec.vx * K * DT
    # ≥ half the commanded forward distance (the controller tracks a
    # procedural gait, not a contact-scheduled plan — 0.5× is the walking
    # threshold, parity with the reference's "walks without penetration")
    assert adv >= 0.5 * cmd, (adv, cmd)
    # solver health: ≥90% success on both the controller's relaxed solves
    # and the tight plant solves
    assert np.mean(okfs) >= 0.9, np.mean(okfs)
    assert np.mean(oks) >= 0.9, np.mean(oks)
    # no foot penetration beyond solver slack (behaviors.jl SDF ≥ 0)
    assert min_sdf >= -1e-3, min_sdf


@pytest.mark.slow
def test_trot_rti_walks():
    """RTI variant of the north-star closed loop (bench.py MODE=rti): the
    real-time-iteration controller — shifted linearization + one forward
    pass per control step — must also make the quadruped walk forward."""
    from dojo_tpu.mpc import make_trot_rti

    H, DT, K = 40, 0.05, 40  # 2 s closed loop
    mech = models.get_mechanism("quadruped", timestep=DT)
    state0 = models.initialize(mech, "quadruped")
    y = maximal_to_minimal(mech.topo, mech.params, state0)
    x0 = float(np.asarray(y)[0])

    spec = TrotSpec()
    init, mpc, ref_fn = make_trot_rti(
        mech, horizon=H, spec=spec,
        config=ILQRConfig(alphas=(1.0,)),
        opts=SolverOptions(rtol=1e-4, btol=1e-3, max_iter=12, rescue=False),
        dt=DT,
    )
    plant_step, _, plant_seed = make_rollout_linearize_minimal(
        mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
    )
    act = jnp.asarray(actuated_indices(mech))
    n_packed = mech.topo.input_dim

    @jax.jit
    def control_step(params, y, st, w, goals):
        u0, st2, c, okf = mpc(params, y, st, goals)
        u_full = jnp.zeros(n_packed, u0.dtype).at[act].set(u0)
        y2, w2, _, ok = plant_step(params, y, u_full, w)
        return y2, st2, w2, c, okf, ok

    st = jax.jit(init)(
        mech.params, y, jnp.zeros((H, 12), dtype=y.dtype),
        ref_fn(jnp.asarray(0.0, y.dtype)),
    )
    w = plant_seed(mech.params, y)
    okfs, oks, min_sdf = [], [], np.inf
    for k in range(K):
        y, st, w, c, okf, ok = control_step(
            mech.params, y, st, w, ref_fn(jnp.asarray(k * DT, y.dtype))
        )
        okfs.append(float(okf))
        oks.append(bool(ok))
        state = minimal_to_maximal(mech.topo, mech.params, y)
        min_sdf = min(
            min_sdf,
            float(np.asarray(
                dt.signed_distances(mech.topo, mech.params, state)
            ).min()),
        )
        assert np.isfinite(np.asarray(y)).all(), k

    adv = float(np.asarray(y)[0]) - x0
    cmd = spec.vx * K * DT
    assert adv >= 0.5 * cmd, (adv, cmd)
    assert np.mean(okfs) >= 0.9, np.mean(okfs)
    assert np.mean(oks) >= 0.9, np.mean(oks)
    assert min_sdf >= -1e-3, min_sdf
