"""Per-prototype minimal-coordinate map verification.

Reference test/minimal.jl:5-80 checks minimal_coordinates/velocities and
their Jacobians against ForwardDiff across all non-floating joint prototypes
× random orientation offsets; test/impulse_map.jl:1-292 sweeps the impulse
maps per joint type.  Here the masked unified joint kernel makes the sweep
one parametrized test: for every joint kind (all 16, floating included) with
a random axis / vertices / orientation offset,

  1. the minimal→maximal→minimal round-trip is exact;
  2. the Jacobian of maximal_to_minimal w.r.t. the packed maximal state
     matches central finite differences (AD-vs-FD, the reference's
     ForwardDiff-vs-FiniteDiff pattern);
  3. the joint impulse transforms (closed form) match their AD oracle at
     many random configurations (test_joints.py checks one).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import builder as bd
from dojo_tpu import joints as jk
from dojo_tpu.core import BodyState
from dojo_tpu.gradients import finite_difference_jacobian
from dojo_tpu.minimal import maximal_to_minimal, minimal_to_maximal

KINDS = list(bd.KIND_NLAM)


def _rand_unit(rng, n):
    v = rng.normal(size=n)
    return v / np.linalg.norm(v)


def _mech_for(kind, seed):
    """Single-joint mechanism: origin → box via `kind` with random axis,
    vertices, and orientation offset (the reference's random-offset sweep)."""
    rng = np.random.default_rng(seed)
    body = bd.box_body("b1", 0.1, 0.2, 0.3, 1.0)
    jd = bd.JointDef(
        kind=kind,
        parent="origin",
        child="b1",
        axis=_rand_unit(rng, 3),
        parent_vertex=0.2 * rng.normal(size=3),
        child_vertex=0.2 * rng.normal(size=3),
        orientation_offset=_rand_unit(rng, 4),
    )
    return bd.build([body], [jd], timestep=0.01)


def _rand_y(mech, seed, cscale=0.3, vscale=0.5):
    rng = np.random.default_rng(seed + 1000)
    topo = mech.topo
    nt, nr = topo.tra_nfree[0], topo.rot_nfree[0]
    y = np.concatenate(
        [
            cscale * rng.normal(size=nt + nr),  # Δx, Δθ
            vscale * rng.normal(size=nt + nr),  # Δv, Δω
        ]
    )
    return jnp.asarray(y)


@pytest.mark.parametrize("kind", KINDS)
def test_minimal_roundtrip_per_kind(kind):
    for seed in (0, 1):
        mech = _mech_for(kind, seed)
        y = _rand_y(mech, seed)
        state = minimal_to_maximal(mech.topo, mech.params, y)
        y2 = maximal_to_minimal(mech.topo, mech.params, state)
        assert np.allclose(np.asarray(y2), np.asarray(y), atol=1e-8), (
            kind,
            seed,
            np.abs(np.asarray(y2) - np.asarray(y)).max(),
        )


@pytest.mark.slow
@pytest.mark.parametrize("kind", KINDS)
def test_minimal_map_jacobian_fd(kind):
    """∂(minimal)/∂(maximal state) via AD matches central FD — the
    reference's minimal-Jacobian-vs-ForwardDiff check (minimal.jl:35-80)."""
    mech = _mech_for(kind, 7)
    if mech.topo.minimal_dim == 0:  # fixed joint: no minimal coordinates
        return
    y = _rand_y(mech, 7)
    state = minimal_to_maximal(mech.topo, mech.params, y)
    z0 = np.asarray(state.pack())

    def f(z):
        st = BodyState.unpack(jnp.asarray(z), mech.topo.nb)
        return maximal_to_minimal(mech.topo, mech.params, st)

    J_ad = np.asarray(jax.jacfwd(lambda z: f(z))(jnp.asarray(z0)))
    J_fd = finite_difference_jacobian(lambda z: f(z), z0, eps=1e-6)
    scale = max(1.0, np.abs(J_fd).max())
    assert np.allclose(J_ad, J_fd, atol=2e-5 * scale), (
        kind,
        np.abs(J_ad - J_fd).max() / scale,
    )


def test_impulse_transform_random_sweep():
    """Closed-form impulse transforms match the AD oracle across many random
    configurations (reference impulse_map.jl breadth; masks are applied
    downstream, so kind coverage reduces to configuration coverage)."""
    rng = np.random.default_rng(11)
    for trial in range(8):
        q = rng.normal(size=4)
        jp = {
            "tra_vertex_parent": jnp.asarray(rng.normal(size=3)),
            "tra_vertex_child": jnp.asarray(rng.normal(size=3)),
            "rot_offset": jnp.asarray(q / np.linalg.norm(q)),
        }
        xa, xb = jnp.asarray(rng.normal(size=3)), jnp.asarray(rng.normal(size=3))
        qa = jnp.asarray(_rand_unit(rng, 4))
        qb = jnp.asarray(_rand_unit(rng, 4))
        for relative in ("parent", "child"):
            T_ad = jk.tra_impulse_transform_ad(jp, relative, xa, qa, xb, qb)
            T_cf = jk.tra_impulse_transform(jp, relative, xa, qa, xb, qb)
            assert np.allclose(T_ad, T_cf, atol=1e-9), (trial, relative)
            R_ad = jk.rot_impulse_transform_ad(jp, relative, xa, qa, xb, qb)
            R_cf = jk.rot_impulse_transform(jp, relative, xa, qa, xb, qb)
            assert np.allclose(R_ad, R_cf, atol=1e-9), (trial, relative)
