"""Test helpers tuned for a slow-compile host: one jitted step per topology,
python-loop rollouts, shared solver options."""

import jax
import jax.numpy as jnp
import numpy as np

import dojo_tpu as dt
from dojo_tpu import mechanics
from dojo_tpu.core import SolverOptions
from dojo_tpu.residual import make_context
from dojo_tpu.simulate import make_step

# one option set per topology keeps the compile-cache hit rate high
OPTS = SolverOptions(rtol=1e-9, btol=1e-9)

_STEP_CACHE = {}


def jitted_step(mech, opts=OPTS):
    key = (mech.topo, opts)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = jax.jit(make_step(mech.topo, opts))
    return _STEP_CACHE[key]


def rollout(mech, state, n, opts=OPTS, u=None):
    """Python-loop rollout collecting pre-step states + solver info."""
    step = jitted_step(mech, opts)
    xs, qs, vs, ws, wsol, ok, iters = [], [], [], [], [], [], []
    for _ in range(n):
        xs.append(state.x)
        qs.append(state.q)
        vs.append(state.v)
        ws.append(state.w)
        state, info = step(mech.params, state, u)
        wsol.append(info.w)
        ok.append(info.success)
        iters.append(info.iterations)
    stack = lambda l: jnp.stack(l)
    return state, dict(
        x=stack(xs), q=stack(qs), v=stack(vs), w=stack(ws), wsol=stack(wsol),
        success=np.array(ok), iterations=np.array(iters),
    )


def energy_momentum(mech, tr):
    """Per-step mechanical energy + total momenta from a rollout record.

    Total angular momentum includes the orbital term about the COM
    (reference momentum.jl:57-75): L = Σ pa_i + (x_i−com) × m_i(v_i−v_com)."""
    mass = mech.params.mass

    def diag(x, q, v, w, wsol):
        st = dt.BodyState(x=x, q=q, v=v, w=w)
        ctx = make_context(mech.topo, st, mech.params)
        pl, pa = mechanics.momentum(mech.topo, mech.params, st, wsol, ctx)
        vl, wl = mechanics.momentum_consistent_velocities(mech.params, st, pl, pa)
        ke = mechanics.kinetic_energy(mech.params, vl, wl)
        pe = mechanics.potential_energy(mech.topo, mech.params, st)
        total_m = jnp.sum(mass)
        com = jnp.sum(mass[:, None] * x, axis=0) / total_m
        v_com = pl.sum(0) / total_m
        orbital = jnp.cross(
            x - com, mass[:, None] * (pl / mass[:, None] - v_com)
        ).sum(0)
        return ke + pe, pl.sum(0), pa.sum(0) + orbital

    return jax.jit(jax.vmap(diag))(tr["x"], tr["q"], tr["v"], tr["w"], tr["wsol"])
