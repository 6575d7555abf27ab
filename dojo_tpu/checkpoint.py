"""Checkpoint / resume for long runs (SURVEY §5: the reference has no
checkpointing — its clean get/set state-vector discipline is the property
we preserve; here every run artifact is already a pytree, so checkpointing
is orbax on (Params, BodyState/minimal state, controller state).

    from dojo_tpu import checkpoint as ckpt
    ckpt.save("/tmp/run42", {"params": mech.params, "y": y, "us": us_warm})
    restored = ckpt.restore("/tmp/run42", {"params": mech.params, "y": y,
                                           "us": us_warm})  # shapes/dtypes

Falls back to a numpy .npz flat-leaf format if orbax is unavailable.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def _drop_empty(tree):
    """Orbax rejects zero-size arrays (masked-pytree pads like (nj, 0) limit
    slots) — replace them with None; restore() rebuilds them from `like`."""
    return jax.tree.map(
        lambda a: None if np.asarray(a).size == 0 else a, tree
    )


def save(path: str, tree) -> str:
    """Write a pytree checkpoint (orbax if available, else .npz)."""
    ocp = _orbax()
    path = os.path.abspath(path)
    if ocp is not None:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, _drop_empty(tree), force=True)
        return path
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(
        path + ".npz",
        *[np.asarray(l) for l in leaves],
        __treedef__=np.asarray(str(treedef)),
    )
    return path + ".npz"


def restore(path: str, like):
    """Read a checkpoint written by save(); `like` supplies the pytree
    structure (and target shardings/dtypes under orbax)."""
    ocp = _orbax()
    path = os.path.abspath(path)
    if ocp is not None and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=_drop_empty(like))
        # refill zero-size leaves from the template
        is_none = lambda x: x is None
        r_leaves, _ = jax.tree.flatten(restored, is_leaf=is_none)
        l_leaves, l_def = jax.tree.flatten(like)
        return jax.tree.unflatten(
            l_def,
            [l if r is None else r for r, l in zip(r_leaves, l_leaves)],
        )
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    leaves, treedef = jax.tree.flatten(like)
    arrs = [data[f"arr_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(
        treedef,
        [np.asarray(a, dtype=np.asarray(l).dtype) for a, l in zip(arrs, leaves)],
    )
