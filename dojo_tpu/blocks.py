"""Direct per-node KKT block assembly (no dense Jacobian).

Replaces ``jacfwd(residual)`` + block extraction with vmapped *local*
jacfwds of the shared per-node functions in residual.py (body_rows,
joint_terms, contact_terms).  This is the TPU translation of the
reference's hand-written analytic Jacobians feeding set_entries!
(src/solver/linear_system.jl:1-17; body diag: integrators/constraint.jl:
36-66; joint/contact diag + off-diagonals: src/joints/constraints.jl:
114-293, src/contacts/constraints.jl:34-90) — except the ~2,000 LoC of
hand-derived matrices are produced by forward-mode AD of the same code
that evaluates the residual, so they can never diverge from it.

Cost: each node differentiates only its own ~(width + 12) local variables
instead of the full KKT dimension, and the resulting blocks are born in
(slots, W, W) layout — no giant gather from a dense matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core import REG, Params, Topology
from .ldu import bmm
from .graph import Schedule
from .residual import (
    StepContext,
    body_rows,
    contact_params,
    contact_terms,
    joint_params,
    joint_terms,
)


def make_assembler(topo: Topology, sched: Schedule):
    """Returns assemble(w, ctx, params, mu) -> (S+1, W, W) block array.

    Slot S is a trash slot absorbing blocks that involve the origin
    pseudo-body (its velocities are not decision variables).
    """
    nb, nj, nc, ML = topo.nb, topo.nj, topo.nc, topo.maxlim
    SW, JW, CW = topo.sw, topo.jw, topo.cw
    W, S = sched.width, sched.n_slots
    slot = dict(sched.slot)
    TRASH = S

    def slot_of(a, b):
        if a is None or b is None:
            return TRASH
        return slot[(a, b)]

    # ---- static slot tables -------------------------------------------------
    # joints are amalgamated into their CHILD body supernode: joint 'j'
    # rows/cols live at a static offset inside the child node's block
    jp_body = [topo.joint_parent[j] if topo.joint_parent[j] >= 0 else None
               for j in range(nj)]
    jc_body = [topo.joint_child[j] for j in range(nj)]

    def jslots(role):
        out = []
        for j in range(nj):
            a, b = role
            pick = {
                "j": int(sched.joint_node[j]),
                "p": jp_body[j],
                "c": jc_body[j],
            }
            out.append(slot_of(pick[a], pick[b]))
        return np.asarray(out, dtype=np.int32)

    J_ROLES = ["jj", "jp", "jc", "pj", "pp", "pc", "cj", "cp", "cc"]
    j_slot_tab = {r: jslots(r) for r in J_ROLES}
    # one-hot row/col placement of the joint block inside its child supernode
    Pj = np.zeros((nj, W, JW))
    for j in range(nj):
        off = int(sched.joint_offset[j])
        for i in range(JW):
            Pj[j, off + i, i] = 1.0

    # contacts are amalgamated into their parent body supernode: contact 'k'
    # rows/cols live at a static offset inside the parent node's block
    cp_body = [topo.contact_parent[c] for c in range(nc)]
    cc_body = [topo.contact_child[c] if topo.contact_child[c] >= 0 else None
               for c in range(nc)]

    def cslots(role):
        out = []
        for c in range(nc):
            a, b = role
            pick = {"k": cp_body[c], "p": cp_body[c], "c": cc_body[c]}
            out.append(slot_of(pick[a], pick[b]))
        return np.asarray(out, dtype=np.int32)

    C_ROLES = ["kk", "kp", "kc", "pk", "pp", "pc", "ck", "cp", "cc"]
    c_slot_tab = {r: cslots(r) for r in C_ROLES}
    # one-hot row/col placement of the contact block inside its supernode
    Pk = np.zeros((nc, W, CW)) if nc else np.zeros((0, W, CW))
    for c in range(nc):
        off = int(sched.contact_offset[c])
        for i in range(CW):
            Pk[c, off + i, i] = 1.0

    body_diag_slots = np.arange(nb, dtype=np.int32)

    jparent_a = np.asarray([p + 1 if p is not None else 0
                            for p in jp_body], dtype=np.int32)
    jchild_a = np.asarray(jc_body, dtype=np.int32) + 1
    cparent_a = np.asarray(cp_body, dtype=np.int32) + 1
    cchild_a = np.asarray([c + 1 if c is not None else 0
                           for c in cc_body], dtype=np.int32)

    kinds = topo.contact_kind
    geoms = topo.contact_geom or tuple(
        "halfspace" if topo.contact_child[c] < 0 else "sphere"
        for c in range(nc)
    )
    group_ids = {
        kg: np.asarray(
            [c for c in range(nc) if (kinds[c], geoms[c]) == kg]
        )
        for kg in sorted(set(zip(kinds, geoms)))
    }

    pad_eye = jnp.asarray(sched.pad_eye)  # (S, W, W)

    def _pad(M, r, c):
        """Zero-pad a (r_real, c_real) block to (W, W)."""
        return jnp.pad(M, ((0, W - M.shape[0]), (0, W - M.shape[1])))

    def assemble(w, ctx: StepContext, params: Params, mu):
        h = params.timestep
        dtype = w.dtype
        z3 = jnp.zeros(3, dtype)
        qid = jnp.array([1.0, 0, 0, 0], dtype)
        aug = lambda arr, row: jnp.concatenate([row[None], arr], axis=0)

        bv = w[: 6 * nb].reshape(nb, 6)
        v25, w25 = bv[:, :3], bv[:, 3:]
        x2a, q2a = aug(ctx.x2, z3), aug(ctx.q2, qid)
        v25a, w25a = aug(v25, z3), aug(w25, z3)

        blocks = jnp.zeros((S + 1, W, W), dtype)
        g = params.gravity

        # ---- body diagonal: ∂(dyn rows)/∂(v,ω) ------------------------------
        def body_jac(m_i, J_i, x1, q1, x2, q2, jf, jt, fe, te, vw):
            f = lambda u: body_rows(
                m_i, J_i, x1, q1, x2, q2, jf, jt, fe, te, u[:3], u[3:], g, h
            )
            return jax.jacfwd(f)(vw)  # (6,6)

        Db = jax.vmap(body_jac)(
            params.mass, params.inertia, ctx.x1, ctx.q1, ctx.x2, ctx.q2,
            ctx.jf2, ctx.jt2, ctx.fext, ctx.text, bv,
        )
        Db = jax.vmap(lambda M: _pad(M, 6, 6))(Db)
        blocks = blocks.at[body_diag_slots].add(Db)

        # ---- joints ---------------------------------------------------------
        if nj:
            jp = joint_params(params)
            eta = w[topo.joint_off : topo.joint_off + nj * JW].reshape(nj, JW)

            def joint_jac(jpj, etaj, xa2, qa2, xb2, qb2, va, wa, vb, wb):
                def f(u):
                    e = u[:JW]
                    vap, wap = u[JW : JW + 3], u[JW + 3 : JW + 6]
                    vbp, wbp = u[JW + 6 : JW + 9], u[JW + 9 : JW + 12]
                    imp_p, imp_c, rows = joint_terms(
                        jpj, e, xa2, qa2, xb2, qb2, vap, wap, vbp, wbp,
                        h, mu, ML, SW,
                    )
                    return jnp.concatenate([rows, -imp_p, -imp_c])

                u0 = jnp.concatenate([etaj, va, wa, vb, wb])
                return jax.jacfwd(f)(u0)  # (JW+12, JW+12)

            JJ = jax.vmap(joint_jac)(
                jp, eta,
                x2a[jparent_a], q2a[jparent_a], x2a[jchild_a], q2a[jchild_a],
                v25a[jparent_a], w25a[jparent_a],
                v25a[jchild_a], w25a[jchild_a],
            )
            # row groups: rows(JW), -imp_p(6), -imp_c(6); col groups: eta(JW),
            # v_p(6), v_c(6)
            rg = {"j": (0, JW), "p": (JW, JW + 6), "c": (JW + 6, JW + 12)}
            Pj_d = jnp.asarray(Pj, dtype)
            for role in J_ROLES:
                ra, cb = role[0], role[1]
                r0, r1 = rg[ra]
                c0, c1 = rg[cb]
                sub = JJ[:, r0:r1, c0:c1]
                # 'j' rows/cols sit at the joint's offset inside its child
                # supernode; 'p'/'c' body velocities sit at offset 0
                if ra == "j":
                    sub = bmm(Pj_d, sub)
                else:
                    sub = jnp.pad(sub, ((0, 0), (0, W - sub.shape[1]), (0, 0)))
                if cb == "j":
                    sub = bmm(sub, jnp.swapaxes(Pj_d, -1, -2))
                else:
                    sub = jnp.pad(sub, ((0, 0), (0, 0), (0, W - sub.shape[2])))
                blocks = blocks.at[j_slot_tab[role]].add(sub)

        # ---- contacts --------------------------------------------------------
        if nc:
            cp_all = contact_params(params)
            wc_all = w[topo.contact_off :].reshape(nc, CW)
            nh = CW // 2

            for (kind, geom), ids in group_ids.items():
                if ids.size == 0:
                    continue
                cpd = {k: a[ids] for k, a in cp_all.items()}
                p_sel, c_sel = cparent_a[ids], cchild_a[ids]

                def contact_jac(cpj, wcj, xp2, qp2, vp, wp, xc2, qc2, vc, wcv,
                                kind=kind, geom=geom):
                    def f(u):
                        wc_ = u[:CW]
                        vpp, wpp = u[CW : CW + 3], u[CW + 3 : CW + 6]
                        vcp, wcp = u[CW + 6 : CW + 9], u[CW + 9 : CW + 12]
                        wr_p, wr_c, rows = contact_terms(
                            cpj, kind, geom, wc_,
                            xp2, qp2, vpp, wpp, xc2, qc2, vcp, wcp, h, mu, nh,
                        )
                        return jnp.concatenate([rows, -wr_p, -wr_c])

                    u0 = jnp.concatenate([wcj, vp, wp, vc, wcv])
                    return jax.jacfwd(f)(u0)

                CJ = jax.vmap(contact_jac)(
                    cpd, wc_all[ids],
                    x2a[p_sel], q2a[p_sel], v25a[p_sel], w25a[p_sel],
                    x2a[c_sel], q2a[c_sel], v25a[c_sel], w25a[c_sel],
                )
                rg = {"k": (0, CW), "p": (CW, CW + 6), "c": (CW + 6, CW + 12)}
                Pk_ids = jnp.asarray(Pk[ids], dtype)
                roles = (
                    ["kk", "kp", "pk", "pp"] if geom == "halfspace" else C_ROLES
                )
                for role in roles:
                    ra, cb = role[0], role[1]
                    r0, r1 = rg[ra]
                    c0, c1 = rg[cb]
                    sub = CJ[:, r0:r1, c0:c1]
                    # 'k' rows/cols sit at the contact's offset inside its
                    # parent supernode; 'p'/'c' body velocities sit at 0
                    if ra == "k":
                        sub = bmm(Pk_ids, sub)
                    else:
                        sub = jnp.pad(sub, ((0, 0), (0, W - sub.shape[1]), (0, 0)))
                    if cb == "k":
                        sub = bmm(sub, jnp.swapaxes(Pk_ids, -1, -2))
                    else:
                        sub = jnp.pad(sub, ((0, 0), (0, 0), (0, W - sub.shape[2])))
                    blocks = blocks.at[c_slot_tab[role][ids]].add(sub)

        # REG on real diagonal dims + identity on pad dims (matches the dense
        # path's J + REG·I exactly)
        reg_eye = jnp.asarray(sched.pad_eye, dtype) + REG * jnp.asarray(
            sched.real_diag, dtype
        )
        blocks = blocks.at[:S].add(reg_eye)
        return blocks[:S]

    return assemble
