"""checkpoint.py round-trips (SURVEY §5 checkpoint/resume): orbax and npz
paths, including zero-size masked leaves (the (nj, 0) limit-slot pads that
orbax rejects and restore() must rebuild from the template)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import checkpoint as ckpt
from dojo_tpu import models


def _tree_allclose(a, b):
    import jax

    la, _ = jax.tree.flatten(a)
    lb, _ = jax.tree.flatten(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.shape == y.shape, (x.shape, y.shape)
        assert x.dtype == y.dtype, (x.dtype, y.dtype)
        np.testing.assert_allclose(x, y)


def _sample_tree():
    """Mechanism params (real masked pytree with zero-size leaves for a
    limit-free mechanism) + run state."""
    mech = models.get_mechanism("pendulum")
    y = jnp.asarray([0.3, -0.1])
    us = jnp.zeros((5, 1))
    tree = {"params": mech.params, "y": y, "us": us, "k": jnp.asarray(3)}
    sizes = [np.asarray(l).size for l in __import__("jax").tree.flatten(tree)[0]]
    assert 0 in sizes, "expected at least one zero-size masked leaf"
    return tree


def test_npz_roundtrip(tmp_path):
    tree = _sample_tree()
    # force the npz path regardless of orbax availability
    import dojo_tpu.checkpoint as c

    orig = c._orbax
    c._orbax = lambda: None
    try:
        p = ckpt.save(str(tmp_path / "run"), tree)
        assert p.endswith(".npz") and os.path.exists(p)
        restored = ckpt.restore(p, tree)
    finally:
        c._orbax = orig
    _tree_allclose(tree, restored)


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    tree = _sample_tree()
    p = ckpt.save(str(tmp_path / "run_orbax"), tree)
    restored = ckpt.restore(p, tree)
    _tree_allclose(tree, restored)


def test_orbax_restore_differs_from_template(tmp_path):
    """restore() must return the SAVED values, not the template's."""
    pytest.importorskip("orbax.checkpoint")
    tree = _sample_tree()
    p = ckpt.save(str(tmp_path / "run2"), tree)
    import jax

    # template with different values but same structure
    like = jax.tree.map(lambda a: jnp.zeros_like(a), tree)
    restored = ckpt.restore(p, like)
    np.testing.assert_allclose(np.asarray(restored["y"]), [0.3, -0.1])
    assert int(np.asarray(restored["k"])) == 3
