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


def _rollout(bodies, joints, n=80):
    m = dt.build(bodies, joints, [], timestep=0.01, gravity=(0, 0, -9.81))
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
