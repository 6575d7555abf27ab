"""The one-step feasibility residual r(w; z2, θ, μ) and its context.

This single pure function replaces the reference's distributed residual
assembly (set_entries!, src/solver/linear_system.jl:1-17; body rows:
src/integrators/constraint.jl:1-34; joint rows: src/joints/constraints.jl:
114-132 + impulses.jl; contact rows: src/contacts/constraints.jl:72-76).

Design: the solver variables w are *velocities and impulses only* —
quaternions are never decision variables — so the exact Newton matrix of the
reference (including every attitude-Jacobian correction) is simply
``jax.jacfwd(residual, argnums=0)``.  That eliminates the reference's
~2,000 LoC of hand-written configuration Jacobians.

Sign/layout conventions match core.Topology.  The residual r is defined so
that the reference's system vector entries equal −r and Newton solves
J Δ = −r.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import contacts as ct
from . import joints as jk
from . import lie
from .core import CONTACT_WIDTH, BodyState, Params, Topology

_JOINT_FIELDS = [
    "tra_cmask", "tra_nmask", "tra_lam_mask", "tra_free_mask",
    "tra_vertex_parent", "tra_vertex_child", "tra_spring", "tra_damper",
    "tra_spring_offset", "tra_lim_lo", "tra_lim_hi", "tra_lim_mask",
    "rot_cmask", "rot_nmask", "rot_lam_mask", "rot_free_mask", "rot_offset",
    "rot_spring", "rot_damper", "rot_spring_offset", "rot_lim_lo",
    "rot_lim_hi", "rot_lim_mask",
]

_CONTACT_FIELDS = [
    "contact_friction", "contact_normal", "contact_tangent",
    "contact_origin", "contact_radius", "contact_offset",
    "contact_child_origin", "contact_child_radius", "contact_aux",
]


def joint_params(params: Params) -> dict:
    return {f: getattr(params, f) for f in _JOINT_FIELDS}


def contact_params(params: Params) -> dict:
    return {f: getattr(params, f) for f in _CONTACT_FIELDS}


class StepContext(NamedTuple):
    """Quantities frozen during one solve (reference State fields x1..τext)."""

    x1: jax.Array  # (nb,3) previous position
    q1: jax.Array  # (nb,4)
    x2: jax.Array  # (nb,3) current position
    q2: jax.Array  # (nb,4)
    jf2: jax.Array  # (nb,3) control force impulses (world frame)
    jt2: jax.Array  # (nb,3) control torque impulses (body frame)
    fext: jax.Array  # (nb,3) external force (world frame)
    text: jax.Array  # (nb,3) external torque (body frame)


def make_context(
    topo: Topology, state: BodyState, params: Params, u=None, fext=None, text=None
) -> StepContext:
    """Previous config from midpoint velocities (bodies/set.jl:8-12) and
    control impulses from inputs (mechanism/set.jl set_input! + input_impulse!).

    u: padded per-joint inputs (nj, 6) = [u_tra(3), u_rot(3)] rows.
    """
    h = params.timestep
    x1 = lie.next_position(state.x, -state.v, h)
    q1 = lie.next_orientation(state.q, -state.w, h)
    nb = state.x.shape[0]
    dtype = state.x.dtype
    jf2 = jnp.zeros((nb, 3), dtype)
    jt2 = jnp.zeros((nb, 3), dtype)
    if u is not None:
        jf2, jt2 = input_impulses(topo, state, params, u)
    if fext is None:
        fext = jnp.zeros((nb, 3), dtype)
    if text is None:
        text = jnp.zeros((nb, 3), dtype)
    return StepContext(x1, q1, state.x, state.q, jf2, jt2, fext, text)


def _aug(arr, origin_row):
    """Prepend the origin pseudo-body row (reference Origin, id 0)."""
    return jnp.concatenate([origin_row[None], arr], axis=0)


def _aug_configs(ctx: StepContext):
    dtype = ctx.x2.dtype
    z3 = jnp.zeros(3, dtype)
    qid = jnp.array([1.0, 0, 0, 0], dtype)
    return _aug(ctx.x2, z3), _aug(ctx.q2, qid)


def input_impulses(topo: Topology, state: BodyState, params: Params, u):
    """Map padded per-joint inputs u (nj, 6) → per-body (JF2, Jτ2).

    u rows are [u_tra(3), u_rot(3)] with zeros in non-free slots
    (reference set_input! + input_impulse!, joints/*/input.jl).
    """
    import numpy as np

    h = params.timestep
    nb, nj = topo.nb, topo.nj
    dtype = state.x.dtype
    jf2 = jnp.zeros((nb + 1, 3), dtype)
    jt2 = jnp.zeros((nb + 1, 3), dtype)
    if nj == 0:
        return jf2[1:], jt2[1:]
    u = u.reshape(nj, 6)
    pidx = jnp.asarray(np.asarray(topo.joint_parent, dtype=np.int32) + 1)
    cidx = jnp.asarray(np.asarray(topo.joint_child, dtype=np.int32) + 1)
    xa_all = _aug(state.x, jnp.zeros(3, dtype))
    qa_all = _aug(state.q, jnp.array([1.0, 0, 0, 0], dtype))
    jp = joint_params(params)

    def one(jpj, xa, qa, xb, qb, uj):
        ut3 = jpj["tra_nmask"].T @ uj[:3]
        ur3 = jpj["rot_nmask"].T @ uj[3:]
        return jk.input_impulses(jpj, xa, qa, xb, qb, ut3, ur3, h)

    (jfa, jta), (jfb, jtb) = jax.vmap(one)(
        jp, xa_all[pidx], qa_all[pidx], xa_all[cidx], qa_all[cidx], u
    )
    jf2 = jf2.at[pidx].add(jfa).at[cidx].add(jfb)
    jt2 = jt2.at[pidx].add(jta).at[cidx].add(jtb)
    return jf2[1:], jt2[1:]


def pad_inputs(topo: Topology, u_packed):
    """Packed input vector (input_dim,) → padded (nj, 6) rows.

    Packed order per joint: translational free coords then rotational free
    coords (reference minimal_index convention)."""
    import numpy as np

    rows, cols = [], []
    for j in range(topo.nj):
        for i in range(topo.tra_nfree[j]):
            rows.append(j)
            cols.append(i)
        for i in range(topo.rot_nfree[j]):
            rows.append(j)
            cols.append(3 + i)
    pad = jnp.zeros((topo.nj, 6), dtype=u_packed.dtype)
    if rows:
        pad = pad.at[np.asarray(rows), np.asarray(cols)].set(u_packed)
    return pad


def body_rows(mass_i, inertia_i, x1, q1, x2, q2, jf2, jt2, fext, text,
              v25, w25, g, h):
    """One body's 6 dynamics rows (integrators/constraint.jl:1-34), as a
    function of its candidate velocities.  Shared by the residual and the
    per-node block assembler (blocks.py)."""
    x3 = lie.next_position(x2, v25, h)
    q3 = lie.next_orientation(q2, w25, h)
    d1x = -mass_i / h * (x2 - x1) - 0.5 * h * (mass_i * g + fext)
    d2x = mass_i / h * (x3 - x2) - 0.5 * h * (mass_i * g + fext)
    w1 = lie.qmul(lie.qconj(q1), q2)[1:]
    t1 = lie.qmul(lie.qconj(q2), lie.qmul(q1, _vt(inertia_i @ w1)))[1:]
    w2 = lie.qmul(lie.qconj(q2), q3)[1:]
    t2 = lie.qmul(
        lie.qconj(q2), _tconj(lie.qmul(_vt(inertia_i @ w2), lie.qconj(q3)))
    )[1:]
    dyn_r = -2.0 / h * (t1 + t2) - h * text
    return jnp.concatenate([d1x + d2x - jf2, dyn_r - jt2])


_PAIR_GEOMETRY = {
    "sphere": "sphere_sphere_geometry",
    "capsule": "sphere_capsule_geometry",
    "box": "sphere_box_geometry",
    "string": "string_geometry",
}


def contact_terms(cpj, kind, geom, wcj, xp2, qp2, vp, wp, xc2, qc2, vc, wcv,
                  h, mu, nh):
    """One contact's body wrenches + residual rows, as a function of its
    impulses and the adjacent bodies' candidate velocities (contact rows
    evaluated at next config, contacts/constraints.jl:72-76).

    geom selects the collision pair: 'halfspace' (world) or one of the
    body-body pairs (reference src/contacts/collisions/)."""
    dtype = wcj.dtype
    xp3 = lie.next_position(xp2, vp, h)
    qp3 = lie.next_orientation(qp2, wp, h)
    xc3 = lie.next_position(xc2, vc, h)
    qc3 = lie.next_orientation(qc2, wcv, h)
    # nh is the padded half-width (topo.cw // 2, the max over the
    # mechanism's contact kinds); nk is this kind's true half-width.  Pad
    # slots are anchored at 1 by the identity rows appended below (and
    # excluded from the cone index sets), so mixed kinds coexist in one
    # fixed-shape contact array (reference freely mixes kinds,
    # contacts/constructor.jl:66-105).
    nk = CONTACT_WIDTH[kind] // 2
    s_full, g_full = wcj[:nh], wcj[nh:]
    s, gam = s_full[:nk], g_full[:nk]
    if geom != "halfspace":
        geometry = getattr(ct, _PAIR_GEOMETRY[geom])
        dist, cpp, cpc, normal, tangent = geometry(cpj, xp3, qp3, xc3, qc3)
    else:
        dist, cpp, normal, tangent = ct.halfspace_geometry(cpj, xp3, qp3)
        cpc = cpp
    vt = (
        ct.pair_tangential_velocity(
            tangent, cpp, cpc, xp3, qp3, vp, wp, xc3, qc3, vc, wcv
        )
        if kind != "impact"
        else jnp.zeros(2, dtype)
    )
    wr_p, wr_c = ct.pair_wrenches(
        cpj, kind, normal, tangent, cpp, cpc, xp3, qp3, xc3, qc3, gam
    )
    comp = ct.complementarity(kind, s, gam)
    neutral = ct.neutral_vector(kind, nk, dtype)
    cons = ct.pair_constraint_rows(cpj, kind, dist, vt, s, gam)
    comp_rows = comp - mu * neutral
    if nh > nk:  # pad-slot anchors: s_pad = 1, γ_pad = 1
        one = jnp.ones(nh - nk, dtype)
        comp_rows = jnp.concatenate([comp_rows, s_full[nk:] - one])
        cons = jnp.concatenate([cons, g_full[nk:] - one])
    rows = jnp.concatenate([comp_rows, cons])
    return wr_p, wr_c, rows


def joint_terms(jp, eta, xa2, qa2, xb2, qb2, va, wa, vb, wb, h, mu, ML, SW):
    """One joint's impulse wrenches + residual rows as a function of its
    impulses and the adjacent bodies' candidate velocities (next configs
    recomputed internally so jacfwd sees the full v-dependence)."""
    xa3 = lie.next_position(xa2, va, h)
    qa3 = lie.next_orientation(qa2, wa, h)
    xb3 = lie.next_position(xb2, vb, h)
    qb3 = lie.next_orientation(qb2, wb, h)
    return _joint_terms(
        jp, eta, xa2, qa2, xb2, qb2, xa3, qa3, xb3, qb3,
        va, wa, vb, wb, h, mu, ML, SW,
    )


def make_residual(topo: Topology):
    """Returns residual(w, ctx, params, mu) -> r, shaped (topo.dim,)."""
    import numpy as np

    nb, nj, nc, ML = topo.nb, topo.nj, topo.nc, topo.maxlim
    SW, JW, CW = topo.sw, topo.jw, topo.cw
    jparent = jnp.asarray(np.asarray(topo.joint_parent, dtype=np.int32) + 1)
    jchild = jnp.asarray(np.asarray(topo.joint_child, dtype=np.int32) + 1)
    cparent = jnp.asarray(np.asarray(topo.contact_parent, dtype=np.int32) + 1)
    kinds = topo.contact_kind

    def residual(w, ctx: StepContext, params: Params, mu):
        h = params.timestep
        dtype = w.dtype
        z3 = jnp.zeros(3, dtype)
        qid = jnp.array([1.0, 0, 0, 0], dtype)

        bv = w[: 6 * nb].reshape(nb, 6)
        v25, w25 = bv[:, :3], bv[:, 3:]

        # augmented (origin row 0) arrays for gathers
        x2a, q2a = _aug(ctx.x2, z3), _aug(ctx.q2, qid)
        v25a, w25a = _aug(v25, z3), _aug(w25, z3)

        # ---- body dynamics rows (integrators/constraint.jl:1-34) ----------
        g = params.gravity
        r_body = jax.vmap(
            lambda m_i, J_i, x1, q1, x2, q2, jf, jt, fe, te, v, om: body_rows(
                m_i, J_i, x1, q1, x2, q2, jf, jt, fe, te, v, om, g, h
            )
        )(
            params.mass, params.inertia, ctx.x1, ctx.q1, ctx.x2, ctx.q2,
            ctx.jf2, ctx.jt2, ctx.fext, ctx.text, v25, w25,
        )

        imp_acc = jnp.zeros((nb + 1, 6), dtype)
        r_joint = jnp.zeros((nj, JW), dtype)

        if nj:
            jp = joint_params(params)
            eta = w[topo.joint_off : topo.joint_off + nj * JW].reshape(nj, JW)

            imp_p, imp_c, rows = jax.vmap(
                lambda jpj, etaj, xa2, qa2, xb2, qb2, va, wa, vb, wb: joint_terms(
                    jpj, etaj, xa2, qa2, xb2, qb2, va, wa, vb, wb, h, mu, ML, SW
                )
            )(
                jp, eta,
                x2a[jparent], q2a[jparent], x2a[jchild], q2a[jchild],
                v25a[jparent], w25a[jparent], v25a[jchild], w25a[jchild],
            )
            imp_acc = imp_acc.at[jparent].add(imp_p).at[jchild].add(imp_c)
            r_joint = rows

        r_contact = jnp.zeros((nc, CW), dtype)
        if nc:
            cp_all = contact_params(params)
            wc_all = w[topo.contact_off :].reshape(nc, CW)
            nh = CW // 2

            cchild = jnp.asarray(
                np.asarray(topo.contact_child, dtype=np.int32) + 1
            )
            geoms = topo.contact_geom or tuple(
                "halfspace" if topo.contact_child[c] < 0 else "sphere"
                for c in range(nc)
            )
            for kind, geom in sorted(set(zip(kinds, geoms))):
                ids = [
                    c for c in range(nc)
                    if geoms[c] == geom and kinds[c] == kind
                ]
                idx = np.asarray(ids)
                cp = {k: a[idx] for k, a in cp_all.items()}
                p_sel, c_sel = cparent[idx], cchild[idx]
                wr_p, wr_c, rows = jax.vmap(
                    lambda cpj, wcj, xp2, qp2, vp, wp, xc2, qc2, vc, wcv,
                    kind=kind, geom=geom: contact_terms(
                        cpj, kind, geom, wcj,
                        xp2, qp2, vp, wp, xc2, qc2, vc, wcv, h, mu, nh,
                    )
                )(
                    cp, wc_all[idx],
                    x2a[p_sel], q2a[p_sel], v25a[p_sel], w25a[p_sel],
                    x2a[c_sel], q2a[c_sel], v25a[c_sel], w25a[c_sel],
                )
                imp_acc = imp_acc.at[p_sel].add(wr_p)
                if geom != "halfspace":
                    imp_acc = imp_acc.at[c_sel].add(wr_c)
                r_contact = r_contact.at[idx].set(rows)

        r_body = r_body - imp_acc[1:]
        return jnp.concatenate(
            [r_body.reshape(-1), r_joint.reshape(-1), r_contact.reshape(-1)]
        )

    return residual


def _vt(p3):
    """Vᵀ p — embed 3-vector at positions 1:4 of a quaternion."""
    return jnp.concatenate([jnp.zeros_like(p3[..., :1]), p3], axis=-1)


def _tconj(q4):
    """Tmat @ q — quaternion conjugation as used in D2q."""
    return q4 * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q4.dtype)


def _joint_terms(jp, eta, xa2, qa2, xb2, qb2, xa3, qa3, xb3, qb3,
                 va, wa, vb, wb, h, mu, ML, SW):
    """Single-joint impulse wrenches (current config) + residual rows (next
    config).  Mirrors impulses! (joints/constraints.jl:150-155) and
    constraint (joints/impulses.jl constraint:1-17)."""
    eta_t, eta_r = eta[:SW], eta[SW:]
    st_up, st_lo, gt_up, gt_lo, lam_t = jk.split_subjoint(eta_t, ML)
    sr_up, sr_lo, gr_up, gr_lo, lam_r = jk.split_subjoint(eta_r, ML)

    # ---- impulse wrenches at current config --------------------------------
    f_tra = jk.subjoint_force(
        jp["tra_cmask"], jp["tra_nmask"], jp["tra_lim_mask"],
        st_up, st_lo, gt_up, gt_lo, lam_t,
    )
    f_rot = jk.subjoint_force(
        jp["rot_cmask"], jp["rot_nmask"], jp["rot_lim_mask"],
        sr_up, sr_lo, gr_up, gr_lo, lam_r,
    )
    tp_t = jk.tra_impulse_transform(jp, "parent", xa2, qa2, xb2, qb2)
    tc_t = jk.tra_impulse_transform(jp, "child", xa2, qa2, xb2, qb2)
    tp_r = jk.rot_impulse_transform(jp, "parent", xa2, qa2, xb2, qb2)
    tc_r = jk.rot_impulse_transform(jp, "child", xa2, qa2, xb2, qb2)
    imp_p = tp_t @ f_tra + tp_r @ f_rot
    imp_c = tc_t @ f_tra + tc_r @ f_rot

    # springs (current config) + dampers (current config, candidate velocities)
    sp_p, sp_c = jk.tra_spring_impulses(jp, xa2, qa2, xb2, qb2, h, tp_t, tc_t)
    sr_p, sr_c = jk.rot_spring_impulses(jp, xa2, qa2, xb2, qb2, h)
    dp_p, dp_c = jk.tra_damper_impulses(
        jp, xa2, va, qa2, wa, xb2, vb, qb2, wb, h, tp_t, tc_t
    )
    dr_p, dr_c = jk.rot_damper_impulses(jp, qa2, wa, qb2, wb, h)
    imp_p = imp_p + sp_p + sr_p + dp_p + dr_p
    imp_c = imp_c + sp_c + sr_c + dp_c + dr_c

    # ---- residual rows at next config --------------------------------------
    def sub_rows(which):
        if which == "tra":
            e1 = jp["tra_cmask"] @ jk.tra_displacement(jp, xa3, qa3, xb3, qb3)
            e2 = jk.tra_minimal_coordinates(jp, xa3, qa3, xb3, qb3)
            lmask, lam_mask = jp["tra_lim_mask"], jp["tra_lam_mask"]
            lo, hi = jp["tra_lim_lo"], jp["tra_lim_hi"]
            s_up, s_lo, g_up, g_lo, lam = st_up, st_lo, gt_up, gt_lo, lam_t
        else:
            e1 = jp["rot_cmask"] @ lie.rotation_vector(
                jk.rot_displacement_quat(jp, qa3, qb3)
            )
            e2 = jk.rot_minimal_coordinates(jp, xa3, qa3, xb3, qb3)
            lmask, lam_mask = jp["rot_lim_mask"], jp["rot_lam_mask"]
            lo, hi = jp["rot_lim_lo"], jp["rot_lim_hi"]
            s_up, s_lo, g_up, g_lo, lam = sr_up, sr_lo, gr_up, gr_lo, lam_r
        s2, g2 = jnp.concatenate([s_up, s_lo]), jnp.concatenate([g_up, g_lo])
        act2 = jnp.concatenate([lmask, lmask])
        r_comp = act2 * (s2 * g2 - mu) + (1.0 - act2) * (s2 - 1.0)
        e2l = e2[:ML]
        r_up = lmask * (s_up - (hi - e2l)) + (1.0 - lmask) * (g_up - 1.0)
        r_lo = lmask * (s_lo - (e2l - lo)) + (1.0 - lmask) * (g_lo - 1.0)
        r_e1 = e1 + (1.0 - lam_mask) * lam
        return jnp.concatenate([r_comp, r_up, r_lo, r_e1])

    rows = jnp.concatenate([sub_rows("tra"), sub_rows("rot")])
    return imp_p, imp_c, rows
