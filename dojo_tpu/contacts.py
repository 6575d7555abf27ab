"""Contact models: sphere–halfspace collision, impact / linear / nonlinear cones.

Reference: src/contacts/ (contact.jl, impact.jl, linear.jl, nonlinear.jl,
velocity.jl, collisions/sphere_halfspace.jl).  Single-contact functions,
vmapped by the residual.

Contact block layout in w (width CW): [s(CW/2); γ(CW/2)] —
s = impulses_dual, γ = impulses (reference constructor.jl:14-43).
  nonlinear (CW=8): s = [s_d, s_ψ, s_t1, s_t2], γ = [γ_n, γ_ψ, β1, β2]
    cones: (s_d, γ_n) positive orthant; (s[1:4], γ[1:4]) second-order cones.
  impact (CW=2): single orthant pair.
  linear (CW=12): 6 orthant pairs (pyramidal cone).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import lie

# friction parameterization of the linearized cone (reference linear.jl:181-186)
LINEAR_PARAM = jnp.array([[0.0, 1.0], [0.0, -1.0], [1.0, 0.0], [-1.0, 0.0]])


def halfspace_distance(cp, x, q):
    """Signed distance (collisions/sphere_halfspace.jl:34-36)."""
    world = x + lie.rotate(cp["contact_origin"], q) - cp["contact_offset"]
    return cp["contact_normal"] @ world - cp["contact_radius"]


def halfspace_contact_point(cp, x, q):
    """World contact point on the parent body (sphere_halfspace.jl:57-63)."""
    return (
        x
        + lie.rotate(cp["contact_origin"], q)
        - cp["contact_offset"]
        - cp["contact_normal"] * cp["contact_radius"]
    )


def contact_point_velocity(x, q, v, w, c):
    """v + ω_world × (c − x) (velocity.jl:2-4)."""
    return v + jnp.cross(lie.rotate(w, q), c - x)


def tangential_velocity(cp, x, q, v, w):
    """Relative tangential velocity vs. the static halfspace (velocity.jl:29-41)."""
    c = halfspace_contact_point(cp, x, q)
    return cp["contact_tangent"] @ contact_point_velocity(x, q, v, w, c)


def impulse_wrench(cp, kind, x3, q3, gamma):
    """Body wrench from contact impulses γ, evaluated at the *next* config
    (reference contact.jl impulse_map:86-105, called with next_configuration).

    Returns a 6-vector [F_world; τ_body] applied to the parent body.
    """
    n = cp["contact_normal"]
    if kind == "impact":
        force = n * gamma[0]
    elif kind == "nonlinear":
        force = n * gamma[0] + cp["contact_tangent"].T @ gamma[2:4]
    elif kind == "linear":
        force = n * gamma[0] + cp["contact_tangent"].T @ (LINEAR_PARAM.T @ gamma[2:6])
    else:
        raise ValueError(kind)
    c = halfspace_contact_point(cp, x3, q3)
    torque = lie.rotate_inv(jnp.cross(c - x3, force), q3)
    return jnp.concatenate([force, torque])


def constraint_rows(cp, kind, x3, q3, v25, w25, s, gamma):
    """The CW/2 'constraint' rows of the contact residual.

    nonlinear (nonlinear.jl:56-79): [d − s₀; μγ₀ − γ₁; P vt − s₂₃]
    impact    (impact.jl:48-62):    [d − s₀]
    linear    (linear.jl:224-256):  [d − s₀; μγ₀ − Σβ − s₁; P vt + ψ𝟙 − s₂:₅]
    """
    d = halfspace_distance(cp, x3, q3)
    if kind == "impact":
        return jnp.stack([d - s[0]])
    vt = tangential_velocity(cp, x3, q3, v25, w25)
    mu = cp["contact_friction"]
    if kind == "nonlinear":
        return jnp.concatenate(
            [jnp.stack([d - s[0], mu * gamma[0] - gamma[1]]), vt - s[2:4]]
        )
    # linear
    psi = gamma[1]
    beta = gamma[2:6]
    return jnp.concatenate(
        [
            jnp.stack([d - s[0], mu * gamma[0] - jnp.sum(beta) - s[1]]),
            LINEAR_PARAM @ vt + psi - s[2:6],
        ]
    )


def complementarity(kind, s, gamma):
    """Cone products (complementarity.jl:16-25): elementwise for orthants,
    SOC product for the nonlinear friction cone."""
    if kind == "nonlinear":
        soc = cone_product(gamma[1:4], s[1:4])
        return jnp.concatenate([jnp.stack([gamma[0] * s[0]]), soc])
    return s * gamma


def neutral_vector(kind, nhalf, dtype):
    """Cone-neutral reset point (contact.jl:197, nonlinear.jl:99)."""
    if kind == "nonlinear":
        return jnp.array([1.0, 1.0, 0.0, 0.0], dtype=dtype)
    return jnp.ones((nhalf,), dtype=dtype)


def cone_product(u, v):
    """Second-order cone product [uᵀv; u₀v₁: + v₀u₁:] (cone.jl:2-8)."""
    return jnp.concatenate(
        [jnp.sum(u * v, keepdims=True), u[0] * v[1:] + v[0] * u[1:]]
    )


# ---------------------------------------------------------------------------
# body–body collisions (reference collisions/sphere_sphere.jl + the generic
# normal/tangent construction of collisions/collision.jl:30-180)
# ---------------------------------------------------------------------------


def sphere_sphere_geometry(cp, xp, qp, xc, qc):
    """Distance, world contact points, normal (child→parent), tangents.

    The normal is always child→parent (NO reference-style sign flip at
    dist<0, collision.jl:44-48): the flip creates a spurious mirrored
    solution branch (s₀<0, γ₀<0, force signs cancel) that Newton converges
    to on impact while the cone line search stalls at the boundary.  An
    unflipped normal keeps the residual continuous across dist=0 and makes
    transient penetration self-restoring."""
    cop = xp + lie.rotate(cp["contact_origin"], qp)
    coc = xc + lie.rotate(cp["contact_child_origin"], qc)
    return _sphere_point_geometry(cp, cop, coc, cp["contact_child_radius"])


def halfspace_geometry(cp, xp, qp):
    dist = halfspace_distance(cp, xp, qp)
    cpp = halfspace_contact_point(cp, xp, qp)
    return dist, cpp, cp["contact_normal"], cp["contact_tangent"]


def _tangent_frame(n):
    """Orthogonal tangent pair for a unit normal (collision.jl
    contact_tangent, with axis fallback)."""
    w1 = jnp.array([1.0, 0.0, 0.0], dtype=n.dtype)
    t1a = jnp.cross(w1, n)
    use_alt = jnp.linalg.norm(t1a) <= 1e-6
    w2 = jnp.array([0.0, 1.0, 0.0], dtype=n.dtype)
    t1 = jnp.where(use_alt, jnp.cross(w2, n), t1a)
    t2 = jnp.cross(t1, n)
    return jnp.stack([t1, t2])


def _sphere_point_geometry(cp, cop, coc, child_radius):
    """Shared sphere-vs-closest-point construction: distance, world contact
    points, child→parent normal, tangents."""
    d = cop - coc
    dist = jnp.linalg.norm(d) - (cp["contact_radius"] + child_radius)
    n = lie.safe_normalize(d)
    cpp = cop - cp["contact_radius"] * n
    cpc = coc + child_radius * n
    return dist, cpp, cpc, n, _tangent_frame(n)


def sphere_capsule_geometry(cp, xp, qp, xc, qc):
    """Sphere (parent) vs. capsule (child): closest point on the capsule
    segment (collisions/sphere_capsule.jl + point_to_segment.jl:1-26).

    Capsule segment endpoints (child frame) in contact_aux[:3], [3:6];
    capsule radius in contact_child_radius."""
    cop = xp + lie.rotate(cp["contact_origin"], qp)
    ca = xc + lie.rotate(cp["contact_aux"][:3], qc)
    cb = xc + lie.rotate(cp["contact_aux"][3:6], qc)
    dab = cb - ca
    t = jnp.clip((cop - ca) @ dab / (dab @ dab + 1e-20), 0.0, 1.0)
    coc = ca + t * dab
    return _sphere_point_geometry(cp, cop, coc, cp["contact_child_radius"])


def sphere_box_geometry(cp, xp, qp, xc, qc):
    """Sphere (parent) vs. box (child): clamped closest point in the box
    frame (collisions/sphere_box.jl + point_to_box_v2.jl contact_point_box).

    Box full sizes (width, depth, height) in contact_aux[:3]."""
    cop = xp + lie.rotate(cp["contact_origin"], qp)
    half = 0.5 * cp["contact_aux"][:3]
    p_box = lie.rotate_inv(cop - xc, qc)
    coc = xc + lie.rotate(jnp.clip(p_box, -half, half), qc)
    return _sphere_point_geometry(cp, cop, coc, cp["contact_child_radius"])


def string_geometry(cp, xp, qp, xc, qc):
    """Taut-string constraint (collisions/string.jl): 'distance' is the
    remaining slack  length − ‖cop − coc‖  (≥ 0 while the string is slack),
    and the impulse direction is ∂distance/∂xp = −(cop−coc)/‖·‖, i.e. the
    string PULLS the attachment points together when taut.

    Maximum length in contact_aux[0]."""
    cop = xp + lie.rotate(cp["contact_origin"], qp)
    coc = xc + lie.rotate(cp["contact_child_origin"], qc)
    d = cop - coc
    dist = cp["contact_aux"][0] - jnp.linalg.norm(d)
    n = -lie.safe_normalize(d)
    return dist, cop, coc, n, _tangent_frame(n)


def pair_constraint_rows(cp, kind, dist, vt, s, gamma):
    """Constraint rows from precomputed distance + tangential velocity."""
    if kind == "impact":
        return jnp.stack([dist - s[0]])
    mu = cp["contact_friction"]
    if kind == "nonlinear":
        return jnp.concatenate(
            [jnp.stack([dist - s[0], mu * gamma[0] - gamma[1]]), vt - s[2:4]]
        )
    psi = gamma[1]
    beta = gamma[2:6]
    return jnp.concatenate(
        [
            jnp.stack([dist - s[0], mu * gamma[0] - jnp.sum(beta) - s[1]]),
            LINEAR_PARAM @ vt + psi - s[2:6],
        ]
    )


def pair_wrenches(cp, kind, normal, tangent, cpp, cpc, xp3, qp3, xc3, qc3, gamma):
    """Parent and child 6-wrenches from contact impulses γ at next config."""
    if kind == "impact":
        force = normal * gamma[0]
    elif kind == "nonlinear":
        force = normal * gamma[0] + tangent.T @ gamma[2:4]
    else:
        force = normal * gamma[0] + tangent.T @ (LINEAR_PARAM.T @ gamma[2:6])
    tq_p = lie.rotate_inv(jnp.cross(cpp - xp3, force), qp3)
    tq_c = lie.rotate_inv(jnp.cross(cpc - xc3, -force), qc3)
    return (
        jnp.concatenate([force, tq_p]),
        jnp.concatenate([-force, tq_c]),
    )


def pair_tangential_velocity(tangent, cpp, cpc, xp, qp, vp, wp, xc, qc, vc, wc):
    """Relative tangential velocity between the two contact points
    (velocity.jl relative_tangential_velocity:29-41)."""
    v_p = contact_point_velocity(xp, qp, vp, wp, cpp)
    v_c = contact_point_velocity(xc, qc, vc, wc, cpc)
    return tangent @ (v_p - v_c)


# ---------------------------------------------------------------------------
# diagnostics (reference src/contacts/utilities.jl get_sdf:10-23,
# contact_location:25-56) — vectorized over contacts, all collision pairs
# ---------------------------------------------------------------------------


def _geometry_groups(topo):
    geoms = topo.contact_geom or tuple(
        "halfspace" if topo.contact_child[c] < 0 else "sphere"
        for c in range(topo.nc)
    )
    groups = {}
    for c, g in enumerate(geoms):
        groups.setdefault(g, []).append(c)
    return groups


def signed_distances(topo, params, state):
    """(nc,) signed distance per contact at the current configuration
    (get_sdf; the quadruped never-penetrates oracle, test/behaviors.jl:1-19)."""
    import jax
    import numpy as np

    from .residual import contact_params

    cp_all = contact_params(params)
    dtype = state.x.dtype
    xa = jnp.concatenate([jnp.zeros((1, 3), dtype), state.x])
    qa = jnp.concatenate(
        [jnp.asarray([[1.0, 0, 0, 0]], dtype), state.q]
    )
    p_sel = np.asarray(topo.contact_parent, dtype=np.int32) + 1
    c_sel = np.asarray(topo.contact_child, dtype=np.int32) + 1
    out = jnp.zeros((topo.nc,), dtype)
    for geom, ids in _geometry_groups(topo).items():
        idx = np.asarray(ids)
        cp = {k: a[idx] for k, a in cp_all.items()}
        if geom == "halfspace":
            d = jax.vmap(halfspace_distance)(cp, xa[p_sel[idx]], qa[p_sel[idx]])
        else:
            fn = {
                "sphere": sphere_sphere_geometry,
                "capsule": sphere_capsule_geometry,
                "box": sphere_box_geometry,
                "string": string_geometry,
            }[geom]
            d = jax.vmap(lambda cpj, xp, qp, xc, qc: fn(cpj, xp, qp, xc, qc)[0])(
                cp, xa[p_sel[idx]], qa[p_sel[idx]], xa[c_sel[idx]], qa[c_sel[idx]]
            )
        out = out.at[idx].set(d)
    return out


def contact_locations(topo, params, state):
    """(nc, 3) world contact point per contact (contact_location)."""
    import jax
    import numpy as np

    from .residual import contact_params

    cp_all = contact_params(params)
    dtype = state.x.dtype
    xa = jnp.concatenate([jnp.zeros((1, 3), dtype), state.x])
    qa = jnp.concatenate(
        [jnp.asarray([[1.0, 0, 0, 0]], dtype), state.q]
    )
    p_sel = np.asarray(topo.contact_parent, dtype=np.int32) + 1
    c_sel = np.asarray(topo.contact_child, dtype=np.int32) + 1
    out = jnp.zeros((topo.nc, 3), dtype)
    for geom, ids in _geometry_groups(topo).items():
        idx = np.asarray(ids)
        cp = {k: a[idx] for k, a in cp_all.items()}
        if geom == "halfspace":
            loc = jax.vmap(halfspace_contact_point)(
                cp, xa[p_sel[idx]], qa[p_sel[idx]]
            )
        else:
            fn = {
                "sphere": sphere_sphere_geometry,
                "capsule": sphere_capsule_geometry,
                "box": sphere_box_geometry,
                "string": string_geometry,
            }[geom]
            loc = jax.vmap(
                lambda cpj, xp, qp, xc, qc: fn(cpj, xp, qp, xc, qc)[1]
            )(cp, xa[p_sel[idx]], qa[p_sel[idx]], xa[c_sel[idx]], qa[c_sel[idx]])
        out = out.at[idx].set(loc)
    return out
