"""Environment base: minimal-coordinate step + state/input maps
(reference DojoEnvironments/src/environments.jl:6-133)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import SolverOptions
from ..minimal import maximal_to_minimal, minimal_to_maximal
from ..residual import pad_inputs
from ..simulate import make_step


class Environment:
    """Wraps a Mechanism with an RL-style minimal-coordinate interface.

    Subclasses override state_map/input_map/reward/is_done.  step() is a
    jitted pure function of (y, u) and vmaps over batches.
    """

    def __init__(self, mech, horizon=100, opts=None):
        self.mech = mech
        self.horizon = horizon
        self.opts = opts or SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
        self._step_fn = None

    # -- override points ----------------------------------------------------
    def state_map(self, y):
        return y

    def input_map(self, u):
        """Map the env action to the mechanism's packed input vector."""
        if u is None:
            return jnp.zeros(self.mech.input_dim)
        return jnp.asarray(u)

    def reward(self, y, u, y_next, info, aux=None):
        return jnp.asarray(0.0)

    def is_done(self, y):
        return jnp.asarray(False)

    def external_forces(self, state):
        """Per-body external (fext world-frame (nb,3), text body-frame
        (nb,3)) as a pure traced function of the maximal state — the analog
        of the reference's per-step add_external_force! controller hooks
        (e.g. uuv_waypoint.jl:93 buoyancy!).  Return None for none."""
        return None

    # -- waypoint-progression aux state (reference waypoint envs) -----------
    # Aux state is traced data threaded through step()/make_scan_step() —
    # never Python attributes on the env — so envs with progression logic
    # (waypoint index) stay jit/vmap/scan-compatible.
    def aux_reset(self):
        """Initial auxiliary env state (e.g. waypoint index); None if unused."""
        return None

    def aux_update(self, aux, y2):
        return aux

    # -- API ------------------------------------------------------------------
    @property
    def state_dim(self):
        return self.mech.minimal_dim

    @property
    def input_dim(self):
        return self.mech.input_dim

    def reset(self, **kwargs):
        from .. import models

        name = getattr(self, "model_name", None)
        if name is not None:
            state = models.initialize(self.mech, name, **kwargs)
        else:
            state = self.mech.zero_state()
        return maximal_to_minimal(self.mech.topo, self.mech.params, state)

    def _raw_step(self):
        if self._step_fn is None:
            topo, params = self.mech.topo, self.mech.params
            inner = make_step(topo, self.opts)

            def fn(y, u_packed):
                state = minimal_to_maximal(topo, params, y)
                u = pad_inputs(topo, u_packed)
                ext = self.external_forces(state)
                fext, text = ext if ext is not None else (None, None)
                state2, info = inner(params, state, u, fext=fext, text=text)
                y2 = maximal_to_minimal(topo, params, state2)
                return y2, info

            self._step_fn = jax.jit(fn)
        return self._step_fn

    def step(self, y, u=None, aux=None):
        """One env step: (y_next, reward, done, info), plus the updated aux
        state appended when `aux` is passed (waypoint-progression envs)."""
        y = self.state_map(jnp.asarray(y))
        up = self.input_map(u)
        y2, info = self._raw_step()(y, up)
        if aux is None:
            return y2, self.reward(y, up, y2, info), self.is_done(y2), info
        aux2 = self.aux_update(aux, y2)
        r = self.reward(y, up, y2, info, aux2)
        return y2, r, self.is_done(y2), info, aux2

    def make_scan_step(self):
        """Pure (carry, u) → (carry2, (y2, r, done, ok)) with
        carry=(y, aux): the jit/vmap/lax.scan form of step().  Batch a
        rollout with jax.vmap over the carry; aux (e.g. waypoint index) is
        per-lane traced data."""
        topo, params = self.mech.topo, self.mech.params
        inner = make_step(topo, self.opts)

        def fn(carry, u):
            y, aux = carry
            y_m = self.state_map(y)
            up = self.input_map(u)
            state = minimal_to_maximal(topo, params, y_m)
            ext = self.external_forces(state)
            fext, text = ext if ext is not None else (None, None)
            state2, info = inner(
                params, state, pad_inputs(topo, up), fext=fext, text=text
            )
            y2 = maximal_to_minimal(topo, params, state2)
            aux2 = self.aux_update(aux, y2)
            r = self.reward(y_m, up, y2, info, aux2)
            return (y2, aux2), (y2, r, self.is_done(y2), info.success)

        return fn

    def simulate(self, y0, controller=None, horizon=None):
        """Host-loop rollout with an arbitrary Python controller(y, k) → u."""
        ys, rs = [], []
        y = jnp.asarray(y0)
        aux = self.aux_reset()
        for k in range(horizon or self.horizon):
            u = controller(y, k) if controller else None
            out = self.step(y, u, aux=aux)
            y, r = out[0], out[1]
            if aux is not None:
                aux = out[4]
            ys.append(y)
            rs.append(r)
        return jnp.stack(ys), jnp.stack(rs)
