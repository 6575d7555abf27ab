"""Minimal ↔ maximal coordinate conversions, fully traced.

Reference: src/mechanism/state.jl:9-66 (minimal_to_maximal /
maximal_to_minimal) and src/joints/minimal.jl (set_minimal_coordinates_
velocities!, get_child_velocity).  The reference deep-copies and mutates the
mechanism; here both directions are pure functions usable inside jit/vmap
(the root→leaves propagation unrolls statically over the topology).

Minimal state layout (reference convention): per joint, in joint-id order,
[Δx(nu_tra); Δθ(nu_rot); Δv(nu_tra); Δω(nu_rot)].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import joints as jk
from . import lie
from .core import BodyState, Params, Topology
from .residual import joint_params


def _joint_slices(topo: Topology):
    """Static per-joint offsets into the minimal vector."""
    sl = []
    off = 0
    for j in range(topo.nj):
        nt, nr = topo.tra_nfree[j], topo.rot_nfree[j]
        sl.append((off, nt, nr))
        off += 2 * (nt + nr)
    return sl, off


@partial(jax.jit, static_argnums=0)
def minimal_to_maximal(topo: Topology, params: Params, y) -> BodyState:
    """Root-to-leaves forward kinematics from minimal coordinates+velocities.

    jit-wrapped with static topology: the body unrolls ~40 ops per joint, so
    an eager call would dispatch hundreds of tiny device ops (minutes over a
    TPU relay), and tracing it once per enclosing jit wastes trace time —
    the nested-jit cache makes every later trace a cheap call."""
    nb = topo.nb
    dtype = y.dtype
    h = params.timestep
    x = jnp.zeros((nb, 3), dtype)
    q = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (nb, 1))
    v = jnp.zeros((nb, 3), dtype)
    w = jnp.zeros((nb, 3), dtype)
    slices, total = _joint_slices(topo)
    jp_all = joint_params(params)

    for j in topo.root_to_leaves:
        if j in topo.loop_joints:
            continue  # loop-closing joints don't place bodies
        off, nt, nr = slices[j]
        dx = y[off : off + nt]
        dth = y[off + nt : off + nt + nr]
        dv = y[off + nt + nr : off + 2 * nt + nr]
        dw = y[off + 2 * nt + nr : off + 2 * (nt + nr)]
        p, c = topo.joint_parent[j], topo.joint_child[j]
        if p < 0:
            xa = jnp.zeros(3, dtype)
            qa = jnp.array([1.0, 0, 0, 0], dtype)
            va = jnp.zeros(3, dtype)
            wa = jnp.zeros(3, dtype)
        else:
            xa, qa, va, wa = x[p], q[p], v[p], w[p]
        jpj = {k: a[j] for k, a in jp_all.items()}
        At = jpj["tra_nmask"].T
        Ar = jpj["rot_nmask"].T
        pa, pb = jpj["tra_vertex_parent"], jpj["tra_vertex_child"]
        offq = jpj["rot_offset"]
        dx3 = jnp.zeros(3, dtype).at[:nt].set(dx)
        dth3 = jnp.zeros(3, dtype).at[:nr].set(dth)
        dv3 = jnp.zeros(3, dtype).at[:nt].set(dv)
        dw3 = jnp.zeros(3, dtype).at[:nr].set(dw)

        dq = lie.axis_angle_to_quaternion(Ar @ dth3)
        qb = lie.qmul(qa, lie.qmul(offq, dq))
        xb = xa + lie.rotate(pa + At @ dx3, qa) - lie.rotate(pb, qb)

        # velocities via one-step finite difference (joints/minimal.jl:113-141)
        xa1 = lie.next_position(xa, -va, h)
        qa1 = lie.next_orientation(qa, -wa, h)
        dx1 = dx3 - dv3 * h
        dq1 = lie.qmul(dq, lie.qconj(lie.axis_angle_to_quaternion(Ar @ (dw3 * h))))
        qb1 = lie.qmul(qa1, lie.qmul(offq, dq1))
        xb1 = xa1 + lie.rotate(pa + At @ dx1, qa1) - lie.rotate(pb, qb1)
        vb = (xb - xb1) / h
        wb = lie.angular_velocity(qb1, qb, h)

        x, q = x.at[c].set(xb), q.at[c].set(qb)
        v, w = v.at[c].set(vb), w.at[c].set(wb)
    return BodyState(x=x, q=q, v=v, w=w)


@partial(jax.jit, static_argnums=0)
def maximal_to_minimal(topo: Topology, params: Params, state: BodyState):
    """Per-joint relative coordinates/velocities (state.jl:44-66)."""
    dtype = state.x.dtype
    h = params.timestep
    z3 = jnp.zeros(3, dtype)
    qid = jnp.array([1.0, 0, 0, 0], dtype)
    xa = jnp.concatenate([z3[None], state.x])
    qa = jnp.concatenate([qid[None], state.q])
    va = jnp.concatenate([z3[None], state.v])
    wa = jnp.concatenate([z3[None], state.w])
    jp_all = joint_params(params)
    parts = []
    for j in range(topo.nj):
        p, c = topo.joint_parent[j] + 1, topo.joint_child[j] + 1
        nt, nr = topo.tra_nfree[j], topo.rot_nfree[j]
        jpj = {k: a[j] for k, a in jp_all.items()}
        args = (jpj, xa[p], qa[p], xa[c], qa[c])
        dx = jk.tra_minimal_coordinates(*args)[:nt]
        dth = jk.rot_minimal_coordinates(*args)[:nr]
        vargs = (
            jpj,
            xa[p], va[p], qa[p], wa[p],
            xa[c], va[c], qa[c], wa[c],
            h,
        )
        dv = jk.tra_minimal_velocities(*vargs)[:nt]
        dw = jk.rot_minimal_velocities(*vargs)[:nr]
        parts.extend([dx, dth, dv, dw])
    if not parts:
        return jnp.zeros((0,), dtype)
    return jnp.concatenate(parts)


def set_joint_minimal(topo, params, state, joint_index, coords=None, velocities=None):
    """Convenience: overwrite one joint's minimal coords/velocities, keeping
    all others (reference set_minimal_coordinates!/velocities! per joint,
    including the recursive downstream update — achieved by round-tripping
    through the full minimal vector)."""
    y = maximal_to_minimal(topo, params, state)
    slices, _ = _joint_slices(topo)
    off, nt, nr = slices[joint_index]
    if coords is not None:
        coords = jnp.asarray(coords, dtype=y.dtype).reshape(-1)
        y = y.at[off : off + nt + nr].set(coords)
    if velocities is not None:
        velocities = jnp.asarray(velocities, dtype=y.dtype).reshape(-1)
        y = y.at[off + nt + nr : off + 2 * (nt + nr)].set(velocities)
    return minimal_to_maximal(topo, params, y)
