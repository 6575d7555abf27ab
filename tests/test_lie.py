"""L0 math kernel tests: quaternion algebra vs. first principles + FD.

Mirrors the reference's test/mrp.jl and test/integrator.jl strategy: analytic
maps checked against finite differences and against independent constructions
(scipy-free; pure numpy oracles).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import lie


def rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


RNG = np.random.default_rng(0)


def test_qmul_matches_matrices():
    a, b = rand_quat(RNG), rand_quat(RNG)
    ab = lie.qmul(a, b)
    assert np.allclose(lie.Lmat(a) @ b, ab, atol=1e-12)
    assert np.allclose(lie.Rmat(b) @ a, ab, atol=1e-12)


def test_rotation_matrix_consistent():
    q = rand_quat(RNG, (7,))
    v = RNG.normal(size=(7, 3))
    r1 = lie.rotate(v, q)
    r2 = jnp.einsum("...ij,...j->...i", lie.rotation_matrix(q), v)
    assert np.allclose(r1, r2, atol=1e-12)
    # orthonormality
    R = lie.rotation_matrix(q)
    assert np.allclose(
        jnp.einsum("...ij,...ik->...jk", R, R), np.broadcast_to(np.eye(3), (7, 3, 3)),
        atol=1e-12,
    )
    # inverse rotation
    assert np.allclose(lie.rotate_inv(r1, q), v, atol=1e-12)


def test_quaternion_map_unit():
    h = 0.013
    w = RNG.normal(size=(5, 3))
    q2 = rand_quat(RNG, (5,))
    q3 = lie.next_orientation(q2, w, h)
    assert np.allclose(np.linalg.norm(q3, axis=-1), 1.0, atol=1e-12)
    # angular_velocity is the exact inverse of next_orientation
    w_rec = lie.angular_velocity(q2, q3, h)
    assert np.allclose(w_rec, w, atol=1e-9)


def test_rotation_vector_roundtrip():
    x = RNG.normal(size=(9, 3))
    q = lie.axis_angle_to_quaternion(x)
    assert np.allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-12)
    x_rec = lie.rotation_vector(q)
    assert np.allclose(x_rec, x, atol=1e-9)
    # identity-safe
    q0 = jnp.array([1.0, 0.0, 0.0, 0.0])
    assert np.allclose(lie.rotation_vector(q0), 0.0)
    g = jax.jacobian(lie.rotation_vector)(q0)
    expect = np.zeros((3, 4))
    expect[:, 1:] = 2 * np.eye(3)  # reference drotation_vectordq limit
    assert np.allclose(g, expect, atol=1e-12)
    assert np.all(np.isfinite(jax.jacobian(lie.axis_angle_to_quaternion)(jnp.zeros(3))))


def test_rotation_vector_fd_gradient():
    q = rand_quat(RNG)
    J = jax.jacobian(lie.rotation_vector)(jnp.asarray(q))
    eps = 1e-7
    Jfd = np.zeros((3, 4))
    for i in range(4):
        dq = np.zeros(4)
        dq[i] = eps
        Jfd[:, i] = (
            np.asarray(lie.rotation_vector(q + dq)) - np.asarray(lie.rotation_vector(q - dq))
        ) / (2 * eps)
    assert np.allclose(J, Jfd, atol=1e-5)


def test_quat_perturb_is_attitude_jacobian():
    q = rand_quat(RNG)
    # d(q ⊞ φ)/dφ == L(q) Vᵀ (the reference LVᵀmat)
    J = jax.jacobian(lambda p: lie.quat_perturb(jnp.asarray(q), p))(jnp.zeros(3))
    LVt = np.asarray(lie.Lmat(q))[:, 1:]
    assert np.allclose(J, LVt, atol=1e-12)


def test_orthogonal_rows():
    for axis in ([1, 0, 0], [0, 0, 1], [1.0, 2.0, -0.5]):
        v1, v2, v3 = lie.orthogonal_rows(axis)
        A = np.stack([v1, v2, v3])
        assert np.allclose(A @ A.T, np.eye(3), atol=1e-12)
        assert np.allclose(np.cross(v1, v2) @ v3, 1.0, atol=1e-9) or np.allclose(
            np.cross(v1, v2) @ v3, -1.0, atol=1e-9
        )


def test_safe_normalize():
    x = RNG.normal(size=(4, 3))
    n = lie.safe_normalize(x)
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-12)
    z = lie.safe_normalize(jnp.zeros(3))
    assert np.allclose(z, np.ones(3) / 3)
    assert np.all(np.isfinite(jax.jacobian(lie.safe_normalize)(jnp.zeros(3))))
