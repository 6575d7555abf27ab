"""One-step and rollout drivers (reference src/simulation/simulate.jl, step.jl).

``make_step(topo)`` returns the fully-traced one-step dynamics; rollouts are
``lax.scan`` over it.  Everything is a pure function of (params, state, u),
so vmap gives scenario batching and shard_map distributes over meshes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import lie
from .core import BodyState, Params, SolverOptions, Topology
from .residual import StepContext, make_context, pad_inputs
from .solver import SolveResult, make_solver


class StepInfo(NamedTuple):
    success: jax.Array
    iterations: jax.Array
    rvio: jax.Array
    bvio: jax.Array
    w: jax.Array  # full solver solution (velocities + impulses)
    rescued: jax.Array = np.False_  # dense rescue pass finished this lane


def make_step(topo: Topology, opts: SolverOptions = SolverOptions(),
              linsolve: str = "auto"):
    """Returns step(params, state, u_padded, fext, text) → (state', StepInfo).

    Semantics of one reference simulate! loop iteration
    (simulate.jl:25-33): input_impulse! → mehrotra! → update_state!.
    u_padded: (nj, 6) per-joint [force(3), torque(3)] in free-coordinate
    slots (see residual.pad_inputs); None for passive.

    w_prev (optional): previous step's solver solution (StepInfo.w) —
    warm-starts the interior-point solve (impulses + cone pairs re-centered
    into the interior), roughly halving steady-state Newton iterations.
    """
    init_w, solve, _ = make_solver(topo, linsolve=linsolve)

    def step(params: Params, state: BodyState, u=None, fext=None, text=None,
             w_prev=None):
        ctx = make_context(topo, state, params, u, fext, text)
        contact_reset = None
        if (
            w_prev is not None
            and topo.nc
            and opts.warm_onset_margin >= 0.0
        ):
            # contact-transition re-centering (SolverOptions.warm_onset_*):
            # a contact whose ACTIVITY is about to flip restarts from the
            # neutral cone init.  Activation: the carried (γ≈0, s≈gap) pair
            # is catastrophically off-center once the gap closes — this is
            # what broke the warm f32 chain at impact states (BENCH_r04:
            # dense rescue every step, 11× cost).  Separation: the carried
            # impact-scale γ is equally poisonous when the contact lifts
            # off (measured on the block toss: the rebound step fails
            # warm-started even at float64).  Activity prediction uses the
            # signed distance at the NEXT candidate configuration
            # (x+hv, q∘exp(hw) — where the contact rows are evaluated), so
            # fast approaches are detected a full step early regardless of
            # speed; persistent contact and ballistic flight keep the full
            # warm start (the ~2× Newton-iteration win).
            from .contacts import signed_distances

            state_pred = BodyState(
                x=lie.next_position(state.x, state.v, params.timestep),
                q=lie.next_orientation(state.q, state.w, params.timestep),
                v=state.v,
                w=state.w,
            )
            sdf = signed_distances(topo, params, state_pred)
            half = topo.cw // 2
            gam_prev = w_prev[topo.contact_off :].reshape(topo.nc, topo.cw)[
                :, half
            ]
            will_touch = sdf < opts.warm_onset_margin
            was_active = gam_prev > opts.warm_onset_gamma
            # any flip marks the whole step as an impact/liftoff TRANSIENT:
            # even the contacts that stay nominally active carry impulses
            # that change violently across a bounce, and keeping just those
            # warm still breaks the solve (block-toss step 39: partial
            # reset fails in 50 iters where the full reset — identical to
            # a cold start — converges in 5).  Steady stance and ballistic
            # flight have no flips and keep the full warm start.
            transient = jnp.any(will_touch != was_active)
            contact_reset = jnp.broadcast_to(transient, (topo.nc,))
        w0 = init_w(state.v, state.w, params, w_prev=w_prev,
                    warm_floor=opts.warm_floor,
                    contact_reset=contact_reset)
        res = solve(w0, ctx, params, opts)
        nb = topo.nb
        bv = res.w[: 6 * nb].reshape(nb, 6)
        v25, w25 = bv[:, :3], bv[:, 3:]
        h = params.timestep
        new_state = BodyState(
            x=lie.next_position(state.x, v25, h),
            q=lie.next_orientation(state.q, w25, h),
            v=v25,
            w=w25,
        )
        info = StepInfo(
            success=res.success,
            iterations=res.iterations,
            rvio=res.rvio,
            bvio=res.bvio,
            w=res.w,
            rescued=res.rescued,
        )
        return new_state, info

    step.init_w = init_w
    return step


class Trajectory(NamedTuple):
    """Recorded rollout (reference Storage, simulation/storage.jl:15-48).

    All arrays lead with the time axis; x/q/v/w are the *pre-step* state at
    each step (matching save_to_storage! before update_state!)."""

    x: jax.Array  # (T, nb, 3)
    q: jax.Array
    v: jax.Array
    w: jax.Array
    info: StepInfo  # per-step solver stats


def make_simulate(topo: Topology, opts: SolverOptions = SolverOptions()):
    """simulate(params, state0, us, fext, text) → (final_state, Trajectory).

    us: (T, nj, 6) padded inputs or None.  The per-step physics follows
    simulate.jl:25-33 with record=true.
    """
    step = make_step(topo, opts)

    def simulate(params, state0, us=None, horizon: int = None,
                 warm_start: bool = False):
        if us is None:
            assert horizon is not None
            us = jnp.zeros((horizon, topo.nj, 6), dtype=state0.x.dtype)

        if warm_start:
            # seed the carry with the cone-neutral init so the scan carry
            # keeps one pytree structure; the first step is then identical
            # to a cold solve up to the warm floor
            w_seed = step.init_w(state0.v, state0.w, params)

            def body(carry, u):
                state, w_prev = carry
                new_state, info = step(params, state, u, w_prev=w_prev)
                rec = (state.x, state.q, state.v, state.w, info)
                return (new_state, info.w), rec

            (final, _), (xs, qs, vs, ws, infos) = jax.lax.scan(
                body, (state0, w_seed), us
            )
        else:

            def body(state, u):
                new_state, info = step(params, state, u)
                rec = (state.x, state.q, state.v, state.w, info)
                return new_state, rec

            final, (xs, qs, vs, ws, infos) = jax.lax.scan(body, state0, us)
        return final, Trajectory(x=xs, q=qs, v=vs, w=ws, info=infos)

    return simulate
