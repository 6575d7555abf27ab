"""Behavior tests (reference test/behaviors.jl + joint_limits.jl):
fourbar loop-closure consistency, joint limits bounce, linear-contact rest,
mixed contact kinds in one mechanism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dojo_tpu as dt
from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.minimal import _joint_slices, maximal_to_minimal
from dojo_tpu.simulate import make_step

from util import jitted_step, rollout


@pytest.mark.slow
def test_fourbar_loop_closure():
    """Loop coordinates stay consistent over a driven 2.5 s rollout
    (reference behaviors.jl:58-80: parallelogram relations to 1e-5)."""
    mech = models.get_mechanism("fourbar", parse_dampers=False)
    state = models.initialize(mech, "fourbar", inner_angle=0.25)
    step = jitted_step(mech, SolverOptions(rtol=1e-8, btol=1e-8))
    rng = np.random.default_rng(1)
    slices, _ = _joint_slices(mech.topo)
    idx = {n: slices[j][0] for n, j in mech.joint_index.items()}

    u = np.zeros((mech.topo.nj, 6))
    worst = 0.0
    for k in range(250):
        # drive the two base cranks with random torque (reference ctrl!)
        u[:] = 0.0
        u[mech.joint_index["jointb1"], 3] = 1.0 * rng.random()
        u[mech.joint_index["joint12"], 3] = -1.0 * rng.random()
        state, info = step(mech.params, state, jnp.asarray(u))
        assert bool(info.success), k
        y = np.asarray(maximal_to_minimal(mech.topo, mech.params, state))
        th = {n: y[idx[n]] for n in idx}  # all-revolute: angle at offset 0
        # parallelogram loop relations (behaviors.jl:76-79)
        worst = max(
            worst,
            abs(th["joint24"] - th["joint34"]),
            abs(th["joint24"] + th["joint12"]),
            abs(th["joint24"] - (th["jointb1"] - th["jointb3"])),
        )
    assert worst < 1e-5, worst
    assert np.all(np.isfinite(np.asarray(state.pack())))


def test_joint_limits_bounce():
    """A gravity-driven pendulum with rotational limits stays inside them
    and actually reaches the lower limit (reference test/joint_limits.jl)."""
    lim = 0.2
    bodies = [dt.box_body("rod", 0.05, 0.05, 1.0, 1.0)]
    joints = [
        dt.JointDef(kind="revolute", parent="origin", child="rod",
                    axis=[0, 1, 0], child_vertex=[0, 0, 0.5],
                    rot_limits=([-lim], [lim]), name="pivot"),
    ]
    mech = dt.build(bodies, joints, [], timestep=0.01)
    # start inside the limits with enough speed that the free swing would
    # pass −0.2 by a wide margin — the lower stop must engage
    state = mech.maximal_state(jnp.asarray([0.1, -2.0]))
    step = jitted_step(mech, SolverOptions(rtol=1e-8, btol=1e-8))
    angles = []
    for k in range(150):
        state, info = step(mech.params, state, None)
        assert bool(info.success), k
        y = np.asarray(maximal_to_minimal(mech.topo, mech.params, state))
        angles.append(y[0])
    angles = np.asarray(angles)
    assert angles.min() >= -lim - 1e-3, angles.min()
    assert angles.max() <= lim + 1e-3, angles.max()
    # the swing actually engages the lower stop
    assert angles.min() < -lim + 2e-2, angles.min()


def test_linear_contact_rest():
    """Block dropped on linear (pyramidal) friction cone rests at the
    correct height (reference behaviors.jl box-toss oracle, linear.jl)."""
    mech = models.get_mechanism(
        "block", contact_type="linear", edge_length=0.5,
        friction_coefficient=0.8,
    )
    state = models.initialize(
        mech, "block", position=(0, 0, 1.0), velocity=(0.5, 0.3, 0.0),
        angular_velocity=(0.1, -0.2, 0.3),
    )
    # btol=1e-6 as the reference rest oracle (behaviors.jl:21-40) — at
    # btol=1e-4 the relaxed cone slack leaves the block ~1e-3 high
    opts = SolverOptions(rtol=1e-6, btol=1e-6)
    final, tr = rollout(mech, state, 150, opts=opts)
    z = float(np.asarray(final.x)[0, 2])
    assert abs(z - 0.25) < 1e-3, z
    assert float(jnp.abs(final.v).max()) < 1e-4
    assert tr["success"].mean() > 0.95


def test_mixed_contact_kinds():
    """One mechanism mixing nonlinear + impact + linear contacts simulates
    (reference freely mixes kinds, contacts/constructor.jl:66-105)."""
    bodies = [
        dt.sphere_body("s1", 0.1, 1.0),
        dt.sphere_body("s2", 0.1, 1.0),
        dt.sphere_body("s3", 0.1, 1.0),
    ]
    joints = [
        dt.JointDef(kind="floating", parent="origin", child=n)
        for n in ("s1", "s2", "s3")
    ]
    contacts = [
        dt.ContactDef(body="s1", kind="nonlinear", radius=0.1, friction=0.5),
        dt.ContactDef(body="s2", kind="impact", radius=0.1),
        dt.ContactDef(body="s3", kind="linear", radius=0.1, friction=0.5),
    ]
    mech = dt.build(bodies, joints, contacts, timestep=0.01)
    x = np.zeros((3, 3))
    x[:, 2] = 0.5
    x[1, 0], x[2, 0] = 2.0, 4.0  # spread out horizontally
    state = dt.BodyState(
        x=jnp.asarray(x),
        q=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (3, 1)),
        v=jnp.zeros((3, 3)),
        w=jnp.zeros((3, 3)),
    )
    final, tr = rollout(mech, state, 120, opts=SolverOptions(rtol=1e-6, btol=1e-4))
    z = np.asarray(final.x)[:, 2]
    np.testing.assert_allclose(z, 0.1, atol=1e-3)  # all rest at radius
    assert tr["success"].mean() > 0.95


@pytest.mark.slow
def test_atlas_drop_balance():
    """Atlas dropped from slightly above its standing height lands and
    stays up: feet never penetrate (SDF ≥ 0 analog) and the root body does
    not collapse over 1 s (BASELINE.json config "Atlas humanoid
    balance/drop").  Joint springs hold the standing pose (the classic
    Dojo atlas-drop demo stiffens the joints — a passive atlas without
    posture springs crumples regardless of damping, diagnosed r2)."""
    import dojo_tpu as dt

    mech = models.get_mechanism(
        "atlas", springs=1000.0, dampers=100.0,
        parse_springs=False, parse_dampers=False,
    )
    state = models.initialize(
        mech, "atlas", body_position=(0, 0, 0.9385 + 0.02)
    )
    z0 = float(np.asarray(state.x)[0, 2])
    h = mech.timestep
    n = max(10, int(round(1.0 / h)))
    step = jitted_step(mech, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30))
    min_sdf = np.inf
    ok = []
    for k in range(n):
        state, info = step(mech.params, state, None)
        ok.append(bool(info.success))
        sdf = np.asarray(dt.signed_distances(mech.topo, mech.params, state))
        min_sdf = min(min_sdf, float(sdf.min()))
    assert np.mean(ok) > 0.9, np.mean(ok)
    assert min_sdf > -5e-4, min_sdf
    z = float(np.asarray(state.x)[0, 2])
    assert z > z0 - 0.25, (z, z0)  # still standing, not collapsed
    assert np.isfinite(np.asarray(state.pack())).all()


def test_external_wrench_velocity_oracle():
    """External force/torque → velocity oracle (reference
    test/behaviors.jl:42-56 "Box external force"): a unit-mass,
    identity-inertia free body in zero gravity accumulates v = F·t/m and
    ω = J⁻¹τ·t under a constant external wrench — catches
    wrench-accumulation sign/half-step bugs."""
    from dojo_tpu import builder as bd

    body = bd.Body("b", 1.0, np.eye(3))
    mech = bd.build(
        [body],
        [bd.JointDef(kind="floating", parent="origin", child="b")],
        timestep=0.01,
        gravity=(0.0, 0.0, 0.0),
    )
    step = jitted_step(mech)
    fext = jnp.asarray([[1.0, 0.0, 0.0]])  # world frame, (nb,3)
    state = mech.zero_state()
    for _ in range(50):  # 0.5 s
        state, _ = step(mech.params, state, None, fext, None)
    assert abs(float(state.v[0, 0]) - 0.5) < 1e-3, state.v
    assert np.abs(np.asarray(state.v[0, 1:])).max() < 1e-6

    text = jnp.asarray([[1.0, 0.0, 0.0]])  # body frame torque
    state = mech.zero_state()
    for _ in range(50):
        state, _ = step(mech.params, state, None, None, text)
    assert abs(float(state.w[0, 0]) - 0.5) < 1e-3, state.w
    assert np.abs(np.asarray(state.w[0, 1:])).max() < 1e-6


@pytest.mark.slow
def test_dzhanibekov_flip():
    """Intermediate-axis instability (reference test/behaviors.jl:85-100):
    spinning the T-handle about its intermediate axis, the side body's x
    position must flip sign (< −0.05 at some point during 4 s); a stable
    integrator artifact would keep it positive."""
    mech = models.get_mechanism("dzhanibekov", timestep=0.01, gravity=0.0)
    state = models.initialize(
        mech, "dzhanibekov", angular_velocity=(15.0, 0.01, 0.0)
    )
    step = jitted_step(mech)
    min_x = np.inf
    for _ in range(400):  # 4 s
        state, info = step(mech.params, state, None)
        min_x = min(min_x, float(state.x[1, 0]))
        assert bool(info.success)
    assert min_x < -0.05, min_x
