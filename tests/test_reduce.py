"""reduce_fixed_joints equivalence: merging bodies across a fixed joint with
a non-trivial rotation offset must leave the remaining bodies' dynamics
bit-for-bit equivalent (reference mechanism/methods.jl:161-233)."""

import jax
import jax.numpy as jnp
import numpy as np

import dojo_tpu as dt
from dojo_tpu.builder import reduce_fixed_joints
from dojo_tpu.core import SolverOptions
from dojo_tpu.simulate import make_step


def _rollout(bodies, joints, n=80, gravity=(0, 0, -9.81)):
    m = dt.build(bodies, joints, [], timestep=0.01, gravity=gravity)
    s = m.zero_state()
    step = jax.jit(make_step(m.topo, SolverOptions(rtol=1e-10, btol=1e-10)))
    traj = []
    for _ in range(n):
        s, _ = step(m.params, s, None)
        traj.append(np.asarray(s.x))
    return m, np.stack(traj)


def test_reduce_fixed_joints_equivalence():
    qoff = np.asarray(
        dt.lie.axis_angle_to_quaternion(jnp.asarray([0.0, 0.3, 0.4]))
    )
    bodies = [
        dt.box_body("a", 0.1, 0.1, 0.4, 1.0),
        dt.box_body("b", 0.1, 0.1, 0.3, 0.7),
        dt.box_body("c", 0.1, 0.1, 0.5, 0.4),
    ]
    joints = [
        dt.JointDef(kind="revolute", parent="origin", child="a", axis=[0, 1, 0],
                    child_vertex=[0, 0, 0.2]),
        dt.JointDef(kind="fixed", parent="a", child="b",
                    parent_vertex=[0, 0, -0.2], child_vertex=[0.02, 0, 0.15],
                    orientation_offset=qoff),
        dt.JointDef(kind="revolute", parent="b", child="c", axis=[1, 0, 0],
                    parent_vertex=[0.01, 0, -0.15], child_vertex=[0, 0, 0.25]),
    ]
    m1, t1 = _rollout(bodies, joints)
    b2, j2, _ = reduce_fixed_joints(bodies, joints, [])
    assert [b.name for b in b2] == ["a", "c"]
    m2, t2 = _rollout(b2, j2)
    ic1, ic2 = m1.body_names.index("c"), m2.body_names.index("c")
    err = np.abs(t1[:, ic1] - t2[:, ic2]).max()
    assert err < 1e-10, err
    # merged COM/mass bookkeeping: total mass preserved
    assert abs(sum(b.mass for b in b2) - sum(b.mass for b in bodies)) < 1e-12


def test_reduce_merged_child_of_loop_joint():
    """Exercise the jd.child == c.name conjugation branch: a parallelogram
    fourbar whose coupler is WELDED to one crank with a non-trivial
    orientation offset; merging the coupler rewrites the loop joint whose
    CHILD is the merged body (the branch the reference flags '# correct?',
    methods.jl:210)."""
    qoff = np.asarray(
        dt.lie.axis_angle_to_quaternion(jnp.asarray([0.2, 0.0, 0.5]))
    )
    Roff = np.asarray(dt.lie.rotation_matrix(jnp.asarray(qoff)))
    in_c = lambda v: Roff.T @ np.asarray(v, np.float64)
    bodies = [
        dt.box_body("a", 0.02, 0.02, 0.4, 1.0),
        dt.box_body("b", 0.02, 0.02, 0.4, 0.8),
        # cube coupler: isotropic inertia, so the rotated weld frame is
        # dynamically consistent without rotated-inertia bookkeeping here
        dt.box_body("c", 0.04, 0.04, 0.04, 0.3),
    ]
    joints = [
        dt.JointDef(kind="revolute", parent="origin", child="a",
                    axis=[0, 1, 0], child_vertex=[0, 0, 0.2]),
        dt.JointDef(kind="revolute", parent="origin", child="b",
                    axis=[0, 1, 0], parent_vertex=[0.1, 0, 0],
                    child_vertex=[0, 0, 0.2]),
        dt.JointDef(kind="fixed", parent="b", child="c",
                    parent_vertex=[0, 0, -0.2],
                    child_vertex=in_c([0.05, 0, 0]),
                    orientation_offset=qoff),
        dt.JointDef(kind="revolute", parent="a", child="c", axis=[0, 1, 0],
                    parent_vertex=[0, 0, -0.2],
                    child_vertex=in_c([-0.05, 0, 0]),
                    orientation_offset=qoff),
    ]
    grav = (3.0, 0.0, -9.81)  # sideways pull so the linkage actually swings
    m1, t1 = _rollout(bodies, joints, gravity=grav)
    b2, j2, _ = reduce_fixed_joints(bodies, joints, [])
    assert sorted(b.name for b in b2) == ["a", "b"]
    m2, t2 = _rollout(b2, j2, gravity=grav)
    for nm in ("a",):
        i1, i2 = m1.body_names.index(nm), m2.body_names.index(nm)
        err = np.abs(t1[:, i1] - t2[:, i2]).max()
        assert err < 1e-8, (nm, err)
    # the merged body's COM differs from b's by construction; check the
    # crank-b ANGLE instead via its tip point: tip = x ± R(q)·(0,0,-0.2)
    # is identical only for the unmerged b, so compare body-a trajectory
    # (above) plus total-mass bookkeeping
    assert abs(sum(b.mass for b in b2) - sum(b.mass for b in bodies)) < 1e-12


def test_urdf_keep_fixed_joints_equivalence():
    """URDF-path reduction (reference zoo default keep_fixed_joints=false,
    e.g. quadrotor/mechanism.jl:11): merging the welded rotor bodies must
    leave the base trajectory equivalent and shrink the KKT system."""
    from dojo_tpu import models

    mk = models.get_mechanism("quadrotor", keep_fixed_joints=True)
    mr = models.get_mechanism("quadrotor", keep_fixed_joints=False)
    assert mr.topo.nb < mk.topo.nb, (mr.topo.nb, mk.topo.nb)
    assert mr.topo.dim < mk.topo.dim, (mr.topo.dim, mk.topo.dim)
    # same minimal state dimension (fixed joints contribute 0)
    assert mr.topo.minimal_dim == mk.topo.minimal_dim

    opts = SolverOptions(rtol=1e-10, btol=1e-10)
    ib_k = mk.body_index["base_link"]
    ib_r = mr.body_index["base_link"]

    def roll(m, ib, n=40):
        s = models.initialize(m, "quadrotor", body_position=(0, 0, 0.6))
        step = jax.jit(make_step(m.topo, opts))
        traj = []
        for _ in range(n):
            s, info = step(m.params, s, None)
            traj.append(np.asarray(s.x)[ib])
        return np.stack(traj)

    tk = roll(mk, ib_k)
    tr = roll(mr, ib_r)
    # the merged base's reported position is its (shifted) COM; correct for
    # the constant COM offset observed at the start before comparing drops
    off = tr[0] - tk[0]
    err = np.abs((tr - off) - tk).max()
    assert err < 1e-6, err
