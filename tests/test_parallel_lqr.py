"""Parallel-in-time LQR backward pass (mpc/parallel_lqr.py) vs the
sequential Riccati recursion: identical value functions and gains."""

import jax
import jax.numpy as jnp
import numpy as np

from dojo_tpu.mpc.parallel_lqr import lqr_backward_parallel


def _sequential(As, Bs, Qs, Rs, qs, rs, Qf, qf, cs):
    H, n, m = Bs.shape
    V, v = Qf, qf
    ks, Ks, Vs, vs = [], [], [V], [v]
    for k in reversed(range(H)):
        A, B, c = As[k], Bs[k], cs[k]
        Quu = Rs[k] + B.T @ V @ B
        Qu = rs[k] + B.T @ (v + V @ c)
        Qux = B.T @ V @ A
        k_ff = -np.linalg.solve(Quu, Qu)
        K = -np.linalg.solve(Quu, Qux)
        Qx = qs[k] + A.T @ (v + V @ c)
        Qxx = Qs[k] + A.T @ V @ A
        V2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
        v2 = Qx + K.T @ Quu @ k_ff + K.T @ Qu + Qux.T @ k_ff
        ks.append(k_ff)
        Ks.append(K)
        Vs.append(V2)
        vs.append(v2)
        V, v = V2, v2
    return (np.stack(ks[::-1]), np.stack(Ks[::-1]),
            np.stack(Vs[::-1]), np.stack(vs[::-1]))


def _rand_psd(rng, n, scale=1.0):
    M = rng.normal(size=(n, n))
    return scale * (M @ M.T / n + np.eye(n))


def test_parallel_matches_sequential():
    rng = np.random.default_rng(3)
    H, n, m = 13, 5, 2  # non-power-of-two horizon
    As = rng.normal(size=(H, n, n)) * 0.4 + np.eye(n)
    Bs = rng.normal(size=(H, n, m)) * 0.3
    cs = rng.normal(size=(H, n)) * 0.1
    Qs = np.stack([_rand_psd(rng, n, 0.5) for _ in range(H)])
    Rs = np.stack([_rand_psd(rng, m, 0.2) for _ in range(H)])
    qs = rng.normal(size=(H, n)) * 0.2
    rs = rng.normal(size=(H, m)) * 0.2
    Qf, qf = _rand_psd(rng, n, 2.0), rng.normal(size=n)

    ks, Ks, Vs, vs = jax.jit(lqr_backward_parallel)(
        *(jnp.asarray(a) for a in (As, Bs, Qs, Rs, qs, rs, Qf, qf, cs))
    )
    ks_r, Ks_r, Vs_r, vs_r = _sequential(As, Bs, Qs, Rs, qs, rs, Qf, qf, cs)
    np.testing.assert_allclose(np.asarray(Vs), Vs_r, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vs), vs_r, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ks), Ks_r, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ks), ks_r, rtol=1e-8, atol=1e-8)


def test_parallel_lqr_sharded():
    """The element arrays shard over an hz mesh axis and the scan still
    matches (the composition tree becomes ICI collectives on hardware)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs >=4 virtual devices")
    rng = np.random.default_rng(5)
    H, n, m = 16, 4, 2
    As = rng.normal(size=(H, n, n)) * 0.3 + np.eye(n)
    Bs = rng.normal(size=(H, n, m)) * 0.3
    cs = np.zeros((H, n))
    Qs = np.stack([_rand_psd(rng, n, 0.5) for _ in range(H)])
    Rs = np.stack([_rand_psd(rng, m, 0.2) for _ in range(H)])
    qs = np.zeros((H, n))
    rs = np.zeros((H, m))
    Qf, qf = _rand_psd(rng, n), np.zeros(n)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("hz",))
    sh = NamedSharding(mesh, P("hz"))
    args = [jnp.asarray(a) for a in (As, Bs, Qs, Rs, qs, rs)]
    args = [jax.device_put(a, sh) for a in args]
    out = jax.jit(lqr_backward_parallel)(
        *args, jnp.asarray(Qf), jnp.asarray(qf), jnp.asarray(cs)
    )
    ref = _sequential(As, Bs, Qs, Rs, qs, rs, Qf, qf, cs)
    np.testing.assert_allclose(np.asarray(out[1]), ref[1], rtol=1e-8, atol=1e-8)
