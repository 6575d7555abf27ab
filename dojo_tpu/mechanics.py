"""Physical diagnostics: discrete momentum and mechanical energy.

Reference: src/mechanics/momentum.jl:9-42 (discrete-Legendre momenta — the
exactly-conserved quantities of the variational integrator) and
src/mechanics/energy.jl:10-92.  Pure functions of (params, pre-step state,
solution velocities, impulses) so they vmap over trajectories.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import joints as jk
from . import lie
from .core import BodyState, Params, Topology
from .residual import StepContext, joint_params


def _vt(p3):
    return jnp.concatenate([jnp.zeros_like(p3[..., :1]), p3], axis=-1)


def _joint_wrench_sum(topo: Topology, params: Params, state: BodyState, w_sol):
    """Σ per-body joint wrenches (impulse_map·λ + spring + damper), at the
    current config and solution velocities (momentum.jl joint_impulses)."""
    nb, nj, ML, SW, JW = topo.nb, topo.nj, topo.maxlim, topo.sw, topo.jw
    dtype = state.x.dtype
    acc = jnp.zeros((nb + 1, 6), dtype)
    if nj == 0:
        return acc[1:]
    h = params.timestep
    z3 = jnp.zeros(3, dtype)
    qid = jnp.array([1.0, 0, 0, 0], dtype)
    xa = jnp.concatenate([z3[None], state.x])
    qa = jnp.concatenate([qid[None], state.q])
    bv = w_sol[: 6 * nb].reshape(nb, 6)
    va = jnp.concatenate([z3[None], bv[:, :3]])
    wa = jnp.concatenate([z3[None], bv[:, 3:]])
    pidx = jnp.asarray(np.asarray(topo.joint_parent, dtype=np.int32) + 1)
    cidx = jnp.asarray(np.asarray(topo.joint_child, dtype=np.int32) + 1)
    eta = w_sol[topo.joint_off : topo.joint_off + nj * JW].reshape(nj, JW)
    jp = joint_params(params)

    def one(jpj, etaj, xa2, qa2, xb2, qb2, vaj, waj, vbj, wbj):
        et, er = etaj[:SW], etaj[SW:]
        st_up, st_lo, gt_up, gt_lo, lam_t = jk.split_subjoint(et, ML)
        sr_up, sr_lo, gr_up, gr_lo, lam_r = jk.split_subjoint(er, ML)
        f_t = jk.subjoint_force(
            jpj["tra_cmask"], jpj["tra_nmask"], jpj["tra_lim_mask"],
            st_up, st_lo, gt_up, gt_lo, lam_t,
        )
        f_r = jk.subjoint_force(
            jpj["rot_cmask"], jpj["rot_nmask"], jpj["rot_lim_mask"],
            sr_up, sr_lo, gr_up, gr_lo, lam_r,
        )
        tp_t = jk.tra_impulse_transform(jpj, "parent", xa2, qa2, xb2, qb2)
        tc_t = jk.tra_impulse_transform(jpj, "child", xa2, qa2, xb2, qb2)
        tp_r = jk.rot_impulse_transform(jpj, "parent", xa2, qa2, xb2, qb2)
        tc_r = jk.rot_impulse_transform(jpj, "child", xa2, qa2, xb2, qb2)
        fp = tp_t @ f_t + tp_r @ f_r
        fc = tc_t @ f_t + tc_r @ f_r
        sp, sc = jk.tra_spring_impulses(jpj, xa2, qa2, xb2, qb2, h)
        sp2, sc2 = jk.rot_spring_impulses(jpj, xa2, qa2, xb2, qb2, h)
        dp, dc = jk.tra_damper_impulses(jpj, xa2, vaj, qa2, waj, xb2, vbj, qb2, wbj, h)
        dp2, dc2 = jk.rot_damper_impulses(jpj, qa2, waj, qb2, wbj, h)
        return fp + sp + sp2 + dp + dp2, fc + sc + sc2 + dc + dc2

    f_p, f_c = jax.vmap(one)(
        jp, eta, xa[pidx], qa[pidx], xa[cidx], qa[cidx],
        va[pidx], wa[pidx], va[cidx], wa[cidx],
    )
    acc = acc.at[pidx].add(f_p).at[cidx].add(f_c)
    return acc[1:]


def momentum(topo: Topology, params: Params, state: BodyState, w_sol,
             ctx: StepContext):
    """Per-body (p_linear_world, p_angular_world) after a solve
    (momentum.jl:17-42).  w_sol holds the accepted v25/ω25 + impulses."""
    nb = topo.nb
    h = params.timestep
    bv = w_sol[: 6 * nb].reshape(nb, 6)
    v25, w25 = bv[:, :3], bv[:, 3:]
    x3 = lie.next_position(state.x, v25, h)
    q3 = lie.next_orientation(state.q, w25, h)
    m = params.mass[:, None]
    d2x = m / h * (x3 - state.x) - 0.5 * h * (m * params.gravity + ctx.fext)

    def d2q_one(q2, q3, Jb, text):
        # D2q = −2/h · V L(q2)ᵀ T R(q3)ᵀ Vᵀ (J V L(q2)ᵀ q3) − h/2 τext
        w2 = lie.qmul(lie.qconj(q2), q3)[1:]
        tq = lie.qmul(_vt(Jb @ w2), lie.qconj(q3))
        tq = tq * jnp.array([1.0, -1.0, -1.0, -1.0], q2.dtype)
        return -2.0 / h * lie.qmul(lie.qconj(q2), tq)[1:] - 0.5 * h * text

    d2q = jax.vmap(d2q_one)(state.q, q3, params.inertia, ctx.text)
    f_joint = _joint_wrench_sum(topo, params, state, w_sol)
    p_lin = d2x - 0.5 * ctx.jf2 - 0.5 * f_joint[:, :3]
    p_ang_body = d2q - 0.5 * ctx.jt2 - 0.5 * f_joint[:, 3:]
    p_ang = jax.vmap(lie.rotate)(p_ang_body, state.q)
    return p_lin, p_ang


def momentum_consistent_velocities(params: Params, state: BodyState, p_lin, p_ang):
    """vl (world) and ωl (body) from momenta (storage.jl:57-64)."""
    vl = p_lin / params.mass[:, None]
    pq_body = jax.vmap(lie.rotate_inv)(p_ang, state.q)
    wl = jnp.linalg.solve(params.inertia, pq_body[..., None])[..., 0]
    return vl, wl


def kinetic_energy(params: Params, vl, wl):
    """½ m vlᵀvl + ½ ωlᵀ J ωl (energy.jl:25-44)."""
    ke_lin = 0.5 * jnp.sum(params.mass * jnp.sum(vl * vl, axis=-1))
    ke_rot = 0.5 * jnp.sum(wl * jnp.einsum("bij,bj->bi", params.inertia, wl))
    return ke_lin + ke_rot


def potential_energy(topo: Topology, params: Params, state: BodyState):
    """Gravity + joint-spring potential (energy.jl:56-92)."""
    pe = -jnp.sum(params.mass * (state.x @ params.gravity))
    nj = topo.nj
    if nj == 0:
        return pe
    dtype = state.x.dtype
    z3 = jnp.zeros(3, dtype)
    qid = jnp.array([1.0, 0, 0, 0], dtype)
    xa = jnp.concatenate([z3[None], state.x])
    qa = jnp.concatenate([qid[None], state.q])
    pidx = jnp.asarray(np.asarray(topo.joint_parent, dtype=np.int32) + 1)
    cidx = jnp.asarray(np.asarray(topo.joint_child, dtype=np.int32) + 1)
    jp = joint_params(params)

    def one(jpj, xa2, qa2, xb2, qb2):
        dist_t = jpj["tra_spring_offset"] - jk.tra_minimal_coordinates(
            jpj, xa2, qa2, xb2, qb2
        )
        f_t = jpj["tra_spring"] * (jpj["tra_nmask"].T @ dist_t)
        pe_t = jnp.where(
            jpj["tra_spring"] > 0, 0.5 * f_t @ f_t / jnp.maximum(jpj["tra_spring"], 1e-30), 0.0
        )
        dist_r = jpj["rot_spring_offset"] - jk.rot_minimal_coordinates(
            jpj, xa2, qa2, xb2, qb2
        )
        f_r = jpj["rot_spring"] * (jpj["rot_nmask"].T @ dist_r)
        pe_r = jnp.where(
            jpj["rot_spring"] > 0, 0.5 * f_r @ f_r / jnp.maximum(jpj["rot_spring"], 1e-30), 0.0
        )
        return pe_t + pe_r

    return pe + jnp.sum(jax.vmap(one)(jp, xa[pidx], qa[pidx], xa[cidx], qa[cidx]))
