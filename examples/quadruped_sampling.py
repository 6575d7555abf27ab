"""Sampling-based gait search on the quadruped — parity with the reference
example (examples/learning/quadruped_sampling.jl): random search over 5 gait
parameters [freq, thigh_amp, thigh_offset, calf_amp, calf_offset] driving a
per-leg PD controller (Kp=[100,80,60], Kd=[5,4,3], diagonal legs in
antiphase), scored by forward walking distance.

TPU-native twist: where the reference evaluates ONE perturbed candidate per
iteration in a Python loop, the whole population rolls out batched under
vmap(lax.scan) — one compiled program evaluates P candidates per round, so
the search is population-based (the reference's explore_factor schedule maps
to the perturbation scale).

Run knobs are small by default so the example executes on CPU; scale
steps/pop/rounds up on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np


def main(steps=300, pop=8, rounds=3, timestep=0.005, seed=1):
    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.minimal import _joint_slices
    from dojo_tpu.simulate import make_step
    from dojo_tpu.residual import pad_inputs

    mech = models.get_mechanism(
        "quadruped", timestep=timestep, limits=False, contact_body=False,
        parse_dampers=False, dampers=0.0,
    )
    topo, params = mech.topo, mech.params
    slices, _ = _joint_slices(topo)
    dtype = jnp.asarray(params.timestep).dtype

    # (joint, velocity) offsets into the minimal vector per leg joint, and
    # packed-input offsets (leg order FR, FL, RR, RL as in the reference)
    legs = []
    uoff, uidx = 0, {}
    for j in range(topo.nj):
        uidx[j] = uoff
        uoff += topo.tra_nfree[j] + topo.rot_nfree[j]
    for g in models.quadruped.GROUPS:
        row = []
        for nm in (f"{g}_hip_joint", f"{g}_thigh_joint", f"{g}_calf_joint"):
            j = mech.joint_index[nm]
            row.append((slices[j][0], uidx[j]))
        legs.append(row)
    KP = jnp.asarray([100.0, 80.0, 60.0], dtype)
    KD = jnp.asarray([5.0, 4.0, 3.0], dtype)
    phase = jnp.asarray([0.0, jnp.pi, jnp.pi, 0.0], dtype)  # trot pairing

    step = make_step(topo, SolverOptions(rtol=1e-4, btol=1e-3, max_iter=15,
                                         rescue=False))
    from dojo_tpu.minimal import maximal_to_minimal, minimal_to_maximal

    def init_y(p):
        """Host-side (numpy) initial pose from candidate params — evaluated
        per candidate before the traced rollout (reference reset_state!)."""
        st = models.initialize(mech, "quadruped", thigh_angle=float(p[2]),
                               calf_angle=float(p[4]))
        return np.asarray(maximal_to_minimal(topo, params, st))

    def leg_targets(p, k, ph):
        """Reference legmovement(): a*cos(k*b*0.01*2π + offset) + c."""
        arg = k * p[0] * 0.01 * 2.0 * jnp.pi + ph
        thigh = p[1] * jnp.cos(arg) + p[2]
        calf = p[3] * jnp.cos(arg) + p[4]
        return thigh, calf

    def rollout(p, y0):
        def body(carry, k):
            y, st = carry, minimal_to_maximal(topo, params, carry)
            u = jnp.zeros(topo.input_dim, dtype)
            for i, row in enumerate(legs):
                thigh_t, calf_t = leg_targets(p, k.astype(dtype), phase[i])
                for (yo, uo), tgt, kp, kd in zip(
                    row, (jnp.asarray(0.0, dtype), thigh_t, calf_t), KP, KD
                ):
                    u = u.at[uo].set(
                        kp * (tgt - y[yo]) + kd * (0.0 - y[yo + 1])
                    )
            st2, info = step(params, st, pad_inputs(topo, u))
            y2 = maximal_to_minimal(topo, params, st2)
            ok = info.success
            return jnp.where(ok, y2, y), (ok, y2[2])

        yT, (oks, hs) = jax.lax.scan(body, y0, jnp.arange(steps))
        alive = jnp.all(hs > 0.1) & (jnp.mean(oks.astype(dtype)) > 0.9)
        return jnp.where(alive, yT[0] - y0[0], -1.0)  # forward distance

    score_pop = jax.jit(jax.vmap(rollout))

    def score(cand):
        y0s = jnp.asarray(np.stack([init_y(p) for p in cand]))
        return np.asarray(score_pop(jnp.asarray(cand), y0s))

    rng = np.random.default_rng(seed)
    best = np.array([0.1, 0.0, 1.0, 0.0, -1.5])  # reference paramcontainer
    best_d, scale = -np.inf, 0.1
    for r in range(rounds):
        cand = best[None] + np.concatenate(
            [np.zeros((1, 5)), scale * rng.normal(size=(pop - 1, 5))]
        )
        d = score(cand)
        i = int(np.argmax(d))
        if d[i] > best_d:
            best, best_d = cand[i], float(d[i])
            scale = 0.1
        else:
            scale *= 0.9  # reference explore_factor contraction
        print(f"round {r}: best forward distance {best_d:.3f} m, "
              f"params {np.round(best, 3)}")
    return best, best_d


if __name__ == "__main__":
    main()
