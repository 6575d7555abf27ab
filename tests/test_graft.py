"""Driver entry-point contracts: entry() compiles single-chip; the
multi-chip dryrun builds a mesh and executes one sharded training step."""

import sys

import numpy as np
import pytest


sys.path.insert(0, "/root/repo")


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts finite loss internally


@pytest.mark.slow
def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    z, iters = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(z)))
