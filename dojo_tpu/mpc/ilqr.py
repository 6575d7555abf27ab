"""iLQR / contact-implicit MPC over minimal coordinates, jit/vmap-native.

Dynamics come from the IFT-differentiable step (gradients at the relaxed
interior-point solution → smooth through contact, the property the reference
demonstrates for gradient-based control).  All control flow is lax.scan /
fori_loop so a full MPC solve jits once and vmaps across scenario batches —
the driver's north-star metric is solves/s/chip of exactly this function.

Structure per iteration:
  1. linearize dynamics along the trajectory (vmapped jacfwd of the step —
     one KKT factorization per knot, shared across tangent columns);
  2. backward Riccati pass with Levenberg regularization (lax.scan, reverse);
  3. forward rollout line search over a fixed α schedule (batched best-of).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import Params, SolverOptions, Topology
from ..gradients import make_diff_step_minimal


class QuadCost(NamedTuple):
    """Quadratic tracking cost  Σ (y−y*)ᵀQ(y−y*) + uᵀRu  + terminal Qf."""

    Q: jax.Array  # (ny,) diagonal or (ny,ny)
    R: jax.Array  # (nu,) diagonal or (nu,nu)
    Qf: jax.Array
    y_goal: jax.Array  # (ny,) or (H+1, ny) for tracking


class ILQRConfig(NamedTuple):
    iterations: int = 10
    reg_init: float = 1e-6
    reg_factor: float = 10.0
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)


def _mat(d, n):
    d = jnp.asarray(d)
    return jnp.diag(jnp.broadcast_to(d, (n,))) if d.ndim <= 1 else d


def make_ilqr(topo: Topology, cost: QuadCost, horizon: int,
              config: ILQRConfig = ILQRConfig(),
              opts: SolverOptions = SolverOptions(rtol=1e-6, btol=1e-4, max_iter=20)):
    """Build ilqr(params, y0, us_init) → (us, ys, total_cost).

    Jittable; vmap over (y0, us_init) for scenario batches.
    """
    step = make_diff_step_minimal(topo, opts)
    ny, nu = topo.minimal_dim, topo.input_dim
    H = horizon
    goal = jnp.asarray(cost.y_goal)
    goals = jnp.broadcast_to(goal, (H + 1, ny)) if goal.ndim == 1 else goal
    Qm, Rm, Qfm = _mat(cost.Q, ny), _mat(cost.R, nu), _mat(cost.Qf, ny)

    def stage_cost(y, u, t):
        dy = y - goals[t]
        return dy @ Qm @ dy + u @ Rm @ u

    def term_cost(y):
        dy = y - goals[H]
        return dy @ Qfm @ dy

    def rollout(params, y0, us):
        def body(y, u):
            y2 = step(params, y, u)
            return y2, y2

        yH, ys = jax.lax.scan(body, y0, us)
        ys = jnp.concatenate([y0[None], ys], axis=0)  # (H+1, ny)
        ts = jnp.arange(H)
        cost_run = jnp.sum(jax.vmap(stage_cost)(ys[:-1], us, ts))
        return ys, cost_run + term_cost(ys[-1])

    def linearize(params, ys, us):
        def ab(y, u):
            A = jax.jacfwd(step, argnums=1)(params, y, u)
            B = jax.jacfwd(step, argnums=2)(params, y, u)
            return A, B

        return jax.vmap(ab)(ys[:-1], us)

    def backward(As, Bs, ys, us, reg):
        ts = jnp.arange(H)
        dys = ys[:-1] - goals[:-1]
        lys = 2.0 * dys @ Qm  # (H, ny)
        lus = 2.0 * us @ Rm

        VH = 2.0 * Qfm
        vH = 2.0 * Qfm @ (ys[-1] - goals[-1])

        def bstep(carry, inp):
            V, v = carry
            A, B, ly, lu = inp
            Qx = ly + A.T @ v
            Qu = lu + B.T @ v
            Qxx = 2.0 * Qm + A.T @ V @ A
            Quu = 2.0 * Rm + B.T @ V @ B + reg * jnp.eye(nu)
            Qux = B.T @ V @ A
            L = jnp.linalg.cholesky(Quu + 1e-12 * jnp.eye(nu))
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            K = -jax.scipy.linalg.cho_solve((L, True), Qux)
            V2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            v2 = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            dV = k @ Qu + 0.5 * k @ Quu @ k
            return (V2, v2), (k, K, dV)

        (_, _), (ks, Ks, dVs) = jax.lax.scan(
            bstep, (VH, vH), (As, Bs, lys, lus), reverse=True
        )
        return ks, Ks, jnp.sum(dVs)

    def forward(params, ys, us, ks, Ks, alpha):
        def body(carry, inp):
            y = carry
            y_ref, u_ref, k, K = inp
            u = u_ref + alpha * k + K @ (y - y_ref)
            y2 = step(params, y, u)
            return y2, (y2, u)

        yH, (ys2, us2) = jax.lax.scan(body, ys[0], (ys[:-1], us, ks, Ks))
        ys2 = jnp.concatenate([ys[:1], ys2], axis=0)
        ts = jnp.arange(H)
        c = jnp.sum(jax.vmap(stage_cost)(ys2[:-1], us2, ts)) + term_cost(ys2[-1])
        return ys2, us2, c

    alphas = jnp.asarray(config.alphas)

    def ilqr(params: Params, y0, us_init):
        ys0, c0 = rollout(params, y0, us_init)

        def iteration(carry, _):
            ys, us, c, reg = carry
            As, Bs = linearize(params, ys, us)
            ks, Ks, dV = backward(As, Bs, ys, us, reg)

            cand = jax.vmap(lambda a: forward(params, ys, us, ks, Ks, a))(alphas)
            ys_c, us_c, cs = cand
            best = jnp.argmin(cs)
            improved = cs[best] < c
            ys2 = jnp.where(improved, ys_c[best], ys)
            us2 = jnp.where(improved, us_c[best], us)
            c2 = jnp.where(improved, cs[best], c)
            reg2 = jnp.where(
                improved,
                jnp.maximum(reg / config.reg_factor, 1e-9),
                jnp.minimum(reg * config.reg_factor, 1e4),
            )
            return (ys2, us2, c2, reg2), c2

        (ys, us, c, _), _ = jax.lax.scan(
            iteration, (ys0, us_init, c0, jnp.asarray(config.reg_init)),
            None, length=config.iterations,
        )
        return us, ys, c

    return ilqr


def make_mpc_controller(topo: Topology, cost: QuadCost, horizon: int,
                        config: ILQRConfig = ILQRConfig(iterations=3),
                        opts: SolverOptions = SolverOptions(rtol=1e-6, btol=1e-4, max_iter=20)):
    """Receding-horizon controller: warm-started iLQR resolve each step.

    Returns mpc(params, y, us_warm) → (u0, us_next) — jittable, vmappable
    across scenario batches (the solves/s/chip benchmark unit).
    """
    ilqr = make_ilqr(topo, cost, horizon, config, opts)

    def mpc(params, y, us_warm):
        us, ys, c = ilqr(params, y, us_warm)
        us_next = jnp.concatenate([us[1:], us[-1:]], axis=0)
        return us[0], us_next, c

    return mpc
