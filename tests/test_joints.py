"""Joint kernel unit tests: closed-form impulse transforms vs AD oracle
(reference test/impulse_map.jl strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import joints as jk

RNG = np.random.default_rng(3)


def rand_jp():
    q = RNG.normal(size=4)
    off = q / np.linalg.norm(q)
    return {
        "tra_vertex_parent": jnp.asarray(RNG.normal(size=3)),
        "tra_vertex_child": jnp.asarray(RNG.normal(size=3)),
        "rot_offset": jnp.asarray(off),
    }


def rand_q():
    q = RNG.normal(size=4)
    return jnp.asarray(q / np.linalg.norm(q))


@pytest.mark.parametrize("relative", ["parent", "child"])
def test_tra_impulse_transform_closed_form(relative):
    jp = rand_jp()
    xa, xb = jnp.asarray(RNG.normal(size=3)), jnp.asarray(RNG.normal(size=3))
    qa, qb = rand_q(), rand_q()
    T_ad = jk.tra_impulse_transform_ad(jp, relative, xa, qa, xb, qb)
    T_cf = jk.tra_impulse_transform(jp, relative, xa, qa, xb, qb)
    assert np.allclose(T_ad, T_cf, atol=1e-10), np.abs(T_ad - T_cf).max()


@pytest.mark.parametrize("relative", ["parent", "child"])
def test_rot_impulse_transform_closed_form(relative):
    jp = rand_jp()
    xa, xb = jnp.zeros(3), jnp.zeros(3)
    qa, qb = rand_q(), rand_q()
    T_ad = jk.rot_impulse_transform_ad(jp, relative, xa, qa, xb, qb)
    T_cf = jk.rot_impulse_transform(jp, relative, xa, qa, xb, qb)
    assert np.allclose(T_ad, T_cf, atol=1e-10), np.abs(T_ad - T_cf).max()
