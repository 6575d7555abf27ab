"""Gradient correctness: IFT Jacobians vs. central finite differences.

Reference strategy: test/jacobian.jl + test/data.jl (analytic vs FD).  Here
the solver matrix is AD-exact by construction, so the FD check targets the
end-to-end differentiable step (IFT through the solver + coordinate maps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dojo_tpu as dt
from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.gradients import make_diff_step_minimal

TIGHT = SolverOptions(rtol=1e-12, btol=1e-12)

_CACHE = {}


def pendulum_step():
    if "p" not in _CACHE:
        mech = models.get_mechanism("pendulum", timestep=0.01)
        _CACHE["p"] = (mech, jax.jit(make_diff_step_minimal(mech.topo, TIGHT)))
    return _CACHE["p"]


def fd_jacobian(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    cols = []
    for i in range(x.size):
        dx = np.zeros_like(x)
        dx[i] = eps
        cols.append((np.asarray(f(x + dx)) - np.asarray(f(x - dx))) / (2 * eps))
    return np.stack(cols, axis=-1)


def test_minimal_jacobians_vs_fd():
    mech, step = pendulum_step()
    y0 = jnp.asarray([0.4, 0.7])
    u0 = jnp.asarray([0.3])

    jac = jax.jit(
        lambda p, y, u: (
            jax.jacfwd(step, argnums=1)(p, y, u),
            jax.jacfwd(step, argnums=2)(p, y, u),
        )
    )
    fy, fu = jac(mech.params, y0, u0)
    fy_fd = fd_jacobian(lambda y: step(mech.params, jnp.asarray(y), u0), y0)
    fu_fd = fd_jacobian(lambda u: step(mech.params, y0, jnp.asarray(u)), u0)
    assert np.allclose(fy, fy_fd, atol=5e-5), np.abs(fy - fy_fd).max()
    assert np.allclose(fu, fu_fd, atol=5e-5), np.abs(fu - fu_fd).max()


def test_reverse_mode_matches_forward():
    """custom_jvp transposes correctly: reverse-mode grad equals
    forward-mode Jacobian contraction."""
    mech, step = pendulum_step()
    y0 = jnp.array([0.4, 0.7])
    u0 = jnp.array([0.3])

    def loss(u):
        y = step(mech.params, y0, u)
        return jnp.sum(y**2)

    g_rev = jax.grad(loss)(u0)
    g_fwd = jax.jacfwd(loss)(u0)
    assert np.allclose(g_rev, g_fwd, atol=1e-10)


def test_param_gradients_flow():
    """System-identification path: gradients w.r.t. model parameters (mass)
    match finite differences (reference gradients/contact.jl analog)."""
    mech, step = pendulum_step()
    y0 = jnp.array([0.4, 0.7])
    u0 = jnp.array([0.0])

    def loss(mass):
        params = mech.params._replace(mass=mass)
        y = step(params, y0, u0)
        return jnp.sum(y**2)

    g = jax.grad(loss)(mech.params.mass)
    assert np.all(np.isfinite(g))
    eps = 1e-6
    m = np.asarray(mech.params.mass)
    fd = (loss(jnp.asarray(m + eps)) - loss(jnp.asarray(m - eps))) / (2 * eps)
    assert np.allclose(np.asarray(g).sum(), float(fd), atol=1e-4)


@pytest.mark.slow
def test_contact_gradients_fd():
    """Gradients through contact at the relaxed solution are smooth and
    FD-consistent (sphere drop, reference contact-gradient semantics)."""
    opts = SolverOptions(rtol=1e-8, btol=1e-8)
    mech = models.get_mechanism("sphere", timestep=0.01)
    from dojo_tpu.gradients import make_diff_step

    step = jax.jit(make_diff_step(mech.topo, opts))
    state = models.initialize(mech, "sphere", position=(0, 0, 0.52), velocity=(1, 0, 0))
    u = jnp.zeros((mech.topo.nj, 6))

    def out(v0):
        s = state._replace(v=state.v.at[0, 0].set(v0))
        return step(mech.params, s, u).pack()

    g = jax.jit(jax.jacfwd(out))(jnp.asarray(1.0))
    eps = 1e-5
    fd = (np.asarray(out(1.0 + eps)) - np.asarray(out(1.0 - eps))) / (2 * eps)
    assert np.allclose(np.asarray(g), fd, atol=1e-4), np.abs(np.asarray(g) - fd).max()


def test_maximal_jacobians_attjac():
    """12Nb attitude-tangent Jacobians (reference gradients/state.jl:102-123):
    consistent with the 13Nb form under the attitude-Jacobian projection and
    FD-consistent along a tangent direction."""
    from dojo_tpu.gradients import (
        attitude_jacobian, make_diff_step, maximal_jacobians_attjac,
    )
    from dojo_tpu.residual import pad_inputs

    mech = models.get_mechanism("pendulum", timestep=0.01)
    nb = mech.topo.nb
    state = models.initialize(mech, "pendulum", angle=0.6, angular_velocity=0.5)
    z = state.pack()
    u = jnp.zeros(mech.input_dim)
    A, B = jax.jit(maximal_jacobians_attjac(mech.topo, TIGHT))(mech.params, z, u)
    assert A.shape == (12 * nb, 12 * nb)
    assert B.shape == (12 * nb, mech.input_dim)

    # FD check: perturb along an attitude-tangent direction
    step = jax.jit(make_diff_step(mech.topo, TIGHT))
    up = pad_inputs(mech.topo, u)

    def out(dz_att):
        G = attitude_jacobian(z, nb)
        s = dt.BodyState.unpack(z + G @ dz_att, nb)
        s = s._replace(q=s.q / jnp.linalg.norm(s.q, axis=-1, keepdims=True))
        z2 = step(mech.params, s, up).pack()
        return z2

    eps = 1e-6
    for i in (0, 7, 11):  # x, attitude, ω directions
        d = np.zeros(12 * nb)
        d[i] = eps
        fd13 = (np.asarray(out(jnp.asarray(d)))
                - np.asarray(out(jnp.asarray(-d)))) / (2 * eps)
        z2 = np.asarray(out(jnp.zeros(12 * nb)))
        Gout = np.asarray(attitude_jacobian(jnp.asarray(z2), nb))
        fd_att = Gout.T @ fd13
        np.testing.assert_allclose(np.asarray(A)[:, i], fd_att, atol=2e-5)


def test_rollout_linearize_ldu_vs_dense():
    """make_rollout_linearize_minimal: the graph-LDU linearization path
    (shared factorization across tangent columns) matches the dense-LU
    path exactly at float64."""
    from dojo_tpu.gradients import make_rollout_linearize_minimal

    mech = models.get_mechanism("pendulum", timestep=0.01)
    step_w, lin_ldu, _ = make_rollout_linearize_minimal(mech.topo, TIGHT)
    _, lin_dense, _ = make_rollout_linearize_minimal(
        mech.topo, TIGHT, linsolve="dense"
    )
    y = jnp.asarray([0.6, 0.3])
    u = jnp.zeros(mech.input_dim)
    y2, w, mu, ok = jax.jit(step_w)(mech.params, y, u)
    assert bool(ok)
    A1, B1 = jax.jit(lin_ldu)(mech.params, y, u, w, mu)
    A2, B2 = jax.jit(lin_dense)(mech.params, y, u, w, mu)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=1e-9)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), atol=1e-9)


def test_data_vector_roundtrip_and_grad():
    """Mechanism.get_data/with_data (reference data.jl get_data/set_data!):
    exact round trip, and gradients of a rollout loss flow through the whole
    flat parameter vector (mass entry FD-checked)."""
    mech, step = pendulum_step()
    vec = mech.get_data()
    p2 = mech.with_data(vec)
    for f in mech._DATA_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(p2, f)), np.asarray(getattr(mech.params, f)), f
        )

    y0 = jnp.asarray([0.6, 0.2])
    u = jnp.asarray([0.3])

    def loss(v):
        p = mech.with_data(v)
        y = y0
        for _ in range(3):
            y = step(p, y, u)
        return jnp.sum(y**2)

    g = np.asarray(jax.grad(loss)(vec))
    assert np.isfinite(g).all()
    # FD check on the mass coordinate (index 0 in _DATA_FIELDS order)
    eps = 1e-6
    e = np.zeros(vec.shape)
    e[0] = eps
    fd = (float(loss(vec + e)) - float(loss(vec - e))) / (2 * eps)
    np.testing.assert_allclose(g[0], fd, rtol=1e-5, atol=1e-8)
