"""Unified masked joint kernel (single-joint functions, vmapped by the residual).

One code path covers all 16 reference joint prototypes
(src/joints/prototypes.jl): a joint = translational + rotational sub-joint,
each defined by a constraint mask (constrained axes) and nullspace mask
(free axes), zero-padded to 3x3 (reference masks: src/joints/joint.jl:56-64).

Functions here operate on a single joint's scalars/3-vectors/quaternions;
the residual vmaps them over the joint axis.  Impulse transforms are the
attitude-Jacobian-corrected transposes of displacement Jacobians
(reference src/joints/impulses.jl:4-9) and are obtained by AD through the
tangent-space perturbation ``lie.quat_perturb`` instead of hand-written
matrix calculus.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie


# ---------------------------------------------------------------------------
# displacements (reference: translational/minimal.jl:4-12, rotational/minimal.jl:4-11)
# ---------------------------------------------------------------------------


def tra_displacement(jp, xa, qa, xb, qb):
    """Anchor-point displacement expressed in the parent frame."""
    d = xb + lie.rotate(jp["tra_vertex_child"], qb) - (
        xa + lie.rotate(jp["tra_vertex_parent"], qa)
    )
    return lie.rotate_inv(d, qa)


def rot_displacement_quat(jp, qa, qb):
    """Relative orientation q = offset⁻¹ ∘ qa⁻¹ ∘ qb."""
    return lie.qmul(lie.qconj(jp["rot_offset"]), lie.qmul(lie.qconj(qa), qb))


def rot_displacement(jp, qa, qb):
    return rot_displacement_quat(jp, qa, qb)[1:]


# ---------------------------------------------------------------------------
# minimal coordinates / velocities (reference: joints/*/minimal.jl)
# ---------------------------------------------------------------------------


def tra_minimal_coordinates(jp, xa, qa, xb, qb):
    return jp["tra_nmask"] @ tra_displacement(jp, xa, qa, xb, qb)


def rot_minimal_coordinates(jp, xa, qa, xb, qb):
    return jp["rot_nmask"] @ lie.rotation_vector(rot_displacement_quat(jp, qa, qb))


def tra_minimal_velocities(jp, xa, va, qa, wa, xb, vb, qb, wb, h):
    """Finite-difference minimal velocity (translational/minimal.jl:108-131)."""
    xa1 = lie.next_position(xa, -va, h)
    qa1 = lie.next_orientation(qa, -wa, h)
    xb1 = lie.next_position(xb, -vb, h)
    qb1 = lie.next_orientation(qb, -wb, h)
    dx = jp["tra_nmask"] @ tra_displacement(jp, xa, qa, xb, qb)
    dx1 = jp["tra_nmask"] @ tra_displacement(jp, xa1, qa1, xb1, qb1)
    return (dx - dx1) / h


def rot_minimal_velocities(jp, xa, va, qa, wa, xb, vb, qb, wb, h):
    """(rotational/minimal.jl:146-166)."""
    qa1 = lie.next_orientation(qa, -wa, h)
    qb1 = lie.next_orientation(qb, -wb, h)
    q = rot_displacement_quat(jp, qa, qb)
    q1 = lie.qmul(
        lie.qconj(jp["rot_offset"]), lie.qmul(lie.qconj(qa1), qb1)
    )
    return jp["rot_nmask"] @ lie.rotation_vector(lie.qmul(lie.qconj(q1), q)) / h


# ---------------------------------------------------------------------------
# impulse transforms: 6x3 maps from constraint-space force to body wrench
# (reference: joints/impulses.jl:4-9 — Diag([1,1,1,.5,.5,.5]) [X Q·LVᵀ]ᵀ)
# ---------------------------------------------------------------------------


def _transform_from(f):
    """AD fallback: 6x3 impulse transform from a displacement fn of (dx, φ).

    Kept as the test oracle for the closed forms below."""
    z3 = jnp.zeros(3)
    jx = jax.jacfwd(lambda dx: f(dx, z3))(z3)  # (3,3)
    jq = jax.jacfwd(lambda p: f(z3, p))(z3)  # (3,3) attitude-corrected
    return jnp.concatenate([jx.T, 0.5 * jq.T], axis=0)  # (6,3)


def tra_impulse_transform_ad(jp, relative, xa, qa, xb, qb):
    if relative == "parent":
        f = lambda dx, p: tra_displacement(jp, xa + dx, lie.quat_perturb(qa, p), xb, qb)
    else:
        f = lambda dx, p: tra_displacement(jp, xa, qa, xb + dx, lie.quat_perturb(qb, p))
    return _transform_from(f)


def rot_impulse_transform_ad(jp, relative, xa, qa, xb, qb):
    if relative == "parent":
        f = lambda dx, p: rot_displacement(jp, lie.quat_perturb(qa, p), qb)
    else:
        f = lambda dx, p: rot_displacement(jp, qa, lie.quat_perturb(qb, p))
    return _transform_from(f)


def tra_impulse_transform(jp, relative, xa, qa, xb, qb):
    """Closed form of Diag(1,½)·[X Q·LVᵀ]ᵀ for the translational sub-joint.

    With d_a = displacement in the parent frame:
      parent: [−R(qa); −skew(d_a + p_a)]
      child:  [ R(qa);  skew(p_b) R(qb)ᵀ R(qa)]
    (equals the AD transform through quat_perturb; see tests/test_joints.py)
    """
    Ra = lie.rotation_matrix(qa)
    if relative == "parent":
        d = tra_displacement(jp, xa, qa, xb, qb)
        return jnp.concatenate(
            [-Ra, -lie.skew(d + jp["tra_vertex_parent"])], axis=0
        )
    Rb = lie.rotation_matrix(qb)
    return jnp.concatenate(
        [Ra, lie.skew(jp["tra_vertex_child"]) @ Rb.T @ Ra], axis=0
    )


def rot_impulse_transform(jp, relative, xa, qa, xb, qb):
    """Closed form for the rotational sub-joint: [0; ½·Jφᵀ] with
      parent: Jφ = −V L(off⁻¹) R(qa⁻¹qb) Vᵀ
      child:  Jφ =  V L(off⁻¹ qa⁻¹ qb) Vᵀ
    """
    z = jnp.zeros((3, 3), dtype=qa.dtype)
    if relative == "parent":
        s = lie.qmul(lie.qconj(qa), qb)
        m = lie.qmul_jac_right(lie.qconj(jp["rot_offset"]), s)  # L(off⁻¹)R(s)
        jphi = -m[1:, 1:]
    else:
        q_rel = lie.qmul(lie.qconj(jp["rot_offset"]), lie.qmul(lie.qconj(qa), qb))
        jphi = lie.Lmat(q_rel)[1:, 1:]
    return jnp.concatenate([z, 0.5 * jphi.T], axis=0)


# ---------------------------------------------------------------------------
# constraint-space forces from the padded impulse block
# (reference impulse_projector, joints/joint.jl:93-99)
# ---------------------------------------------------------------------------


def subjoint_force(cmask, nmask, lim_mask, s_up, s_lo, g_up, g_lo, lam):
    """force(3) = cmaskᵀ λ + nmaskᵀ (γ_lo − γ_up) on limited coordinates."""
    ml = g_up.shape[-1]
    dg = lim_mask * (g_lo - g_up)  # (ML,)
    dg3 = jnp.zeros(3, dtype=lam.dtype).at[:ml].set(dg) if ml else jnp.zeros(3, lam.dtype)
    return cmask.T @ lam + nmask.T @ dg3


def split_subjoint(eta, ml):
    """η = [s_up(ML); s_lo(ML); γ_up(ML); γ_lo(ML); λ(3)]."""
    return (
        eta[0:ml],
        eta[ml : 2 * ml],
        eta[2 * ml : 3 * ml],
        eta[3 * ml : 4 * ml],
        eta[4 * ml : 4 * ml + 3],
    )


# ---------------------------------------------------------------------------
# springs (reference: translational/springs.jl, rotational/springs.jl)
# ---------------------------------------------------------------------------


def tra_spring_impulses(jp, xa, qa, xb, qb, h, tp=None, tc=None):
    """Returns (parent 6-impulse, child 6-impulse)."""
    dist = jp["tra_spring_offset"] - tra_minimal_coordinates(jp, xa, qa, xb, qb)
    force = jp["tra_spring"] * (jp["tra_nmask"].T @ dist)  # parent-frame
    if tp is None:
        tp = tra_impulse_transform(jp, "parent", xa, qa, xb, qb)
    if tc is None:
        tc = tra_impulse_transform(jp, "child", xa, qa, xb, qb)
    return h * (tp @ force), h * (tc @ force)


def rot_spring_impulses(jp, xa, qa, xb, qb, h):
    dist = jp["rot_spring_offset"] - rot_minimal_coordinates(jp, xa, qa, xb, qb)
    force = -jp["rot_spring"] * (jp["rot_nmask"].T @ dist)  # offset-frame
    zero = jnp.zeros(3, dtype=force.dtype)
    fp = lie.rotate(force, jp["rot_offset"])
    q_ba = lie.qmul(lie.qconj(qb), lie.qmul(qa, jp["rot_offset"]))
    fc = lie.rotate(-force, q_ba)
    return h * jnp.concatenate([zero, fp]), h * jnp.concatenate([zero, fc])


# ---------------------------------------------------------------------------
# dampers — implicit in candidate velocities
# (reference: translational/dampers.jl, rotational/dampers.jl)
# ---------------------------------------------------------------------------


def tra_damper_impulses(jp, xa, va, qa, wa, xb, vb, qb, wb, h, tp=None, tc=None):
    vel = tra_minimal_velocities(jp, xa, va, qa, wa, xb, vb, qb, wb, h)
    force = jp["tra_damper"] * (jp["tra_nmask"].T @ (-vel))  # parent-frame
    if tp is None:
        tp = tra_impulse_transform(jp, "parent", xa, qa, xb, qb)
    if tc is None:
        tc = tra_impulse_transform(jp, "child", xa, qa, xb, qb)
    return h * (tp @ force), h * (tc @ force)


def rot_damper_impulses(jp, qa, wa, qb, wb, h):
    z = jnp.zeros(3, dtype=qa.dtype)
    vel = rot_minimal_velocities(jp, z, z, qa, wa, z, z, qb, wb, h)
    force = jp["rot_damper"] * (jp["rot_nmask"].T @ vel)  # offset-frame
    fp = lie.rotate(force, jp["rot_offset"])
    q_ba = lie.qmul(lie.qconj(qb), lie.qmul(qa, jp["rot_offset"]))
    fc = lie.rotate(-force, q_ba)
    return h * jnp.concatenate([z, fp]), h * jnp.concatenate([z, fc])


# ---------------------------------------------------------------------------
# control inputs → body impulses (reference: translational/input.jl:5-30,
# rotational/input.jl:5-18; input_scaling = timestep, constructor.jl:47)
# ---------------------------------------------------------------------------


def input_impulses(jp, xa, qa, xb, qb, u_tra3, u_rot3, h):
    """Per-joint control impulses.  u_*3: force/torque premapped by nmaskᵀ.

    Returns ((JFa, Jτa), (JFb, Jτb)) — world-frame force impulses, local-frame
    torque impulses, exactly the reference's JF2/Jτ2 accumulation.
    """
    # translational (input.jl: JF += T[:3]u, Jτ += T[3:]u/2)
    ut = u_tra3 * h
    tp = tra_impulse_transform(jp, "parent", xa, qa, xb, qb)
    tc = tra_impulse_transform(jp, "child", xa, qa, xb, qb)
    jfa, jta = tp[:3] @ ut, 0.5 * (tp[3:] @ ut)
    jfb, jtb = tc[:3] @ ut, 0.5 * (tc[3:] @ ut)
    # rotational (input.jl: Jτa += R(off)(−τ), Jτb += R(qb⁻¹qa off) τ)
    tau = u_rot3 * h
    jta = jta + lie.rotate(-tau, jp["rot_offset"])
    q_ba = lie.qmul(lie.qconj(qb), lie.qmul(qa, jp["rot_offset"]))
    jtb = jtb + lie.rotate(tau, q_ba)
    return (jfa, jta), (jfb, jtb)
