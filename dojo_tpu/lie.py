"""Quaternion / rotation math kernels (L0 layer).

TPU-native re-design of the reference engine's orientation layer
(reference: src/orientation/quaternion.jl, mapping.jl, rotate.jl, mrp.jl,
axis_angle.jl, src/utilities/normalize.jl).  Quaternions are plain ``(..., 4)``
arrays in ``[w, x, y, z]`` order; every op broadcasts over leading batch dims
so the same kernels serve single mechanisms, vmapped scenario batches and
sharded meshes.

Unlike the reference, no hand-written Jacobian matrices
(``∂VLmat∂q`` etc., quaternion.jl:126-211) are needed: solver variables are
velocities/impulses and all Jacobians come from JAX AD.  The only explicit
"attitude Jacobian" artifact we keep is the tangent-space perturbation
``quat_perturb`` (== LVᵀmat action, quaternion.jl:104-111), used for
impulse transforms and minimal-coordinate Jacobians.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# identity quaternion
QUAT_ID = jnp.array([1.0, 0.0, 0.0, 0.0])


def qmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ∘ b for (..., 4) arrays."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def qconj(q: jax.Array) -> jax.Array:
    """Conjugate [w, -v]. Inverse for unit quaternions (reference uses inv)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


qinv = qconj


def qvec(v: jax.Array) -> jax.Array:
    """Embed a 3-vector as a pure quaternion [0, v]."""
    return jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)


def Lmat(q: jax.Array) -> jax.Array:
    """Left multiplication matrix: Lmat(q) @ p == qmul(q, p). (...,4,4)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack([w, -x, -y, -z], axis=-1)
    r1 = jnp.stack([x, w, -z, y], axis=-1)
    r2 = jnp.stack([y, z, w, -x], axis=-1)
    r3 = jnp.stack([z, -y, x, w], axis=-1)
    return jnp.stack([r0, r1, r2, r3], axis=-2)


def Rmat(q: jax.Array) -> jax.Array:
    """Right multiplication matrix: Rmat(q) @ p == qmul(p, q). (...,4,4)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack([w, -x, -y, -z], axis=-1)
    r1 = jnp.stack([x, w, z, -y], axis=-1)
    r2 = jnp.stack([y, -z, w, x], axis=-1)
    r3 = jnp.stack([z, y, -x, w], axis=-1)
    return jnp.stack([r0, r1, r2, r3], axis=-2)


def qmul_jac_right(a: jax.Array, s: jax.Array) -> jax.Array:
    """Jacobian of p ↦ a ∘ p ∘ s, i.e. Lmat(a) @ Rmat(s). (...,4,4)."""
    return Lmat(a) @ Rmat(s)


def rotate(v: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q: V(q ∘ [0,v] ∘ q⁻¹).

    reference: vector_rotate (src/orientation/rotate.jl:5).
    """
    return qmul(qmul(q, qvec(v)), qconj(q))[..., 1:]


def rotate_inv(v: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate v by q⁻¹ (world → body for body-to-world q)."""
    return qmul(qmul(qconj(q), qvec(v)), q)[..., 1:]


def rotation_matrix(q: jax.Array) -> jax.Array:
    """3x3 rotation matrix of unit quaternion q. (...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
        axis=-1,
    )
    r1 = jnp.stack(
        [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
        axis=-1,
    )
    r2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
        axis=-1,
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def skew(p: jax.Array) -> jax.Array:
    """Skew-symmetric matrix: skew(p) @ v == cross(p, v). (...,3,3)."""
    z = jnp.zeros_like(p[..., 0])
    r0 = jnp.stack([z, -p[..., 2], p[..., 1]], axis=-1)
    r1 = jnp.stack([p[..., 2], z, -p[..., 0]], axis=-1)
    r2 = jnp.stack([-p[..., 1], p[..., 0], z], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def quat_perturb(q: jax.Array, phi: jax.Array) -> jax.Array:
    """Tangent-space perturbation q ⊞ φ = q ∘ [1, φ].

    d/dφ at φ=0 equals the reference's attitude Jacobian LVᵀmat(q)
    (quaternion.jl:104-111).  Differentiating any f(quat_perturb(q, φ)) at
    φ=0 reproduces all `attjac=true` Jacobians of the reference by AD.
    """
    one = jnp.ones_like(phi[..., :1])
    return qmul(q, jnp.concatenate([one, phi], axis=-1))


# ---------------------------------------------------------------------------
# variational-integrator maps (reference: src/orientation/mapping.jl,
# src/integrators/integrator.jl)
# ---------------------------------------------------------------------------


def quaternion_map(w: jax.Array, timestep) -> jax.Array:
    """φ(ω) = [sqrt(4/h² − ‖ω‖²), ω]  (mapping.jl:1-3).

    ‖φ‖·h/2 = 1, so next_orientation stays unit.  The sqrt argument is
    clamped for AD safety; the solver's ω-clamp (3.9/h², line_search.jl:141)
    keeps it positive in practice.
    """
    w2 = jnp.sum(w * w, axis=-1, keepdims=True)
    arg = jnp.maximum(4.0 / timestep**2 - w2, 1e-12 / timestep**2)
    return jnp.concatenate([jnp.sqrt(arg), w], axis=-1)


def next_position(x2: jax.Array, v25: jax.Array, timestep) -> jax.Array:
    """x3 = x2 + v25 h (integrator.jl:14)."""
    return x2 + v25 * timestep


def next_orientation(q2: jax.Array, w25: jax.Array, timestep) -> jax.Array:
    """q3 = q2 ∘ φ(ω25) · h/2 (integrator.jl:15)."""
    return qmul(q2, quaternion_map(w25, timestep)) * (timestep / 2.0)


def angular_velocity(q1: jax.Array, q2: jax.Array, timestep) -> jax.Array:
    """ω = 2/h · V(q1⁻¹ ∘ q2) (integrator.jl:23-25)."""
    return 2.0 / timestep * qmul(qconj(q1), q2)[..., 1:]


def cayley(w: jax.Array) -> jax.Array:
    """Cayley map ω → unit quaternion (mapping.jl:10-12)."""
    one = jnp.ones_like(w[..., :1])
    q = jnp.concatenate([one, w], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# attitude parameterizations (reference: mrp.jl, axis_angle.jl)
# ---------------------------------------------------------------------------


def mrp(q: jax.Array) -> jax.Array:
    """Modified Rodrigues parameters v/(1+w) (mrp.jl:1-8)."""
    return q[..., 1:] / (q[..., :1] + 1.0)


def rotation_vector(q: jax.Array) -> jax.Array:
    """Axis-angle vector θ·n of q, via MRP: 4·atan(‖m‖)·m/‖m‖.

    reference: rotation_vector (axis_angle... mrp.jl:70-73).  Taylor-safe at
    the identity so AD matches drotation_vectordq's [0 2I] limit.
    """
    m = mrp(q)
    r2 = jnp.sum(m * m, axis=-1, keepdims=True)
    r = jnp.sqrt(jnp.maximum(r2, 1e-36))
    small = r2 < 1e-12
    # 4*atan(r)/r ;  series: 4*(1 - r²/3 + r⁴/5)
    exact = 4.0 * jnp.arctan(jnp.where(small, 1.0, r)) / jnp.where(small, 1.0, r)
    series = 4.0 * (1.0 - r2 / 3.0 + r2 * r2 / 5.0)
    return jnp.where(small, series, exact) * m


def axis_angle_to_quaternion(x: jax.Array) -> jax.Array:
    """Rotation-vector → quaternion (axis_angle.jl:1-12), Taylor-safe."""
    t2 = jnp.sum(x * x, axis=-1, keepdims=True)
    t = jnp.sqrt(jnp.maximum(t2, 1e-36))
    small = t2 < 1e-12
    half = 0.5 * t
    # sin(θ/2)/θ; series: 1/2 − θ²/48
    exact = jnp.sin(jnp.where(small, 0.0, half)) / jnp.where(small, 1.0, t)
    series = 0.5 - t2 / 48.0
    sc = jnp.where(small, series, exact)
    w = jnp.cos(half)
    return jnp.concatenate([w, sc * x], axis=-1)


def safe_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    """normalize with zero-guard (utilities/normalize.jl:1-8)."""
    n2 = jnp.sum(x * x, axis=axis, keepdims=True)
    good = n2 > 0.0
    inv = jax.lax.rsqrt(jnp.where(good, n2, 1.0))
    fallback = jnp.ones_like(x) / x.shape[axis]
    return jnp.where(good, x * inv, fallback)


def orthogonal_rows(axis):
    """Orthogonal complement rows of an axis (joints/orthogonal.jl:1-17).

    Build-time helper (NumPy, not traced): returns (V1, V2, V3) with
    V3 == normalized axis, V1 ⟂ V2 ⟂ V3.
    """
    import numpy as np

    a = np.asarray(axis, dtype=np.float64)
    n = np.linalg.norm(a)
    if n > 0:
        a = a / n
    sk = np.array(
        [[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]], dtype=np.float64
    )
    _, _, vt = np.linalg.svd(sk)
    return vt[0], vt[1], a
