"""set_floating_base re-rooting equivalence (reference
mechanism/methods.jl:87-159): re-rooting a floating chain at a different
body reverses the joints on the path but leaves the physical system — and
hence world-frame trajectories from identical initial states — unchanged."""

import jax
import numpy as np

import dojo_tpu as dt
from dojo_tpu.builder import set_floating_base
from dojo_tpu.core import SolverOptions
from dojo_tpu.simulate import make_step


def _chain():
    qoff = np.asarray(
        dt.lie.axis_angle_to_quaternion(np.asarray([0.1, 0.25, -0.2]))
    )
    bodies = [
        dt.box_body("a", 0.1, 0.1, 0.4, 1.0),
        dt.box_body("b", 0.1, 0.1, 0.3, 0.7),
        dt.box_body("c", 0.1, 0.1, 0.5, 0.4),
    ]
    joints = [
        dt.JointDef(kind="floating", parent="origin", child="a",
                    name="base"),
        dt.JointDef(kind="revolute", parent="a", child="b", axis=[0, 1, 0],
                    parent_vertex=[0, 0, -0.2], child_vertex=[0, 0, 0.15],
                    spring=2.0, damper=0.1, name="ab"),
        dt.JointDef(kind="revolute", parent="b", child="c", axis=[1, 0, 0],
                    parent_vertex=[0.01, 0, -0.15], child_vertex=[0, 0, 0.25],
                    orientation_offset=qoff, name="bc"),
    ]
    return bodies, joints


def _rollout(bodies, joints, state, n=60):
    m = dt.build(bodies, joints, [], timestep=0.01)
    step = jax.jit(make_step(m.topo, SolverOptions(rtol=1e-10, btol=1e-10)))
    traj, ok = [], []
    for _ in range(n):
        state, info = step(m.params, state, None)
        traj.append(np.asarray(state.x))
        ok.append(bool(info.success))
    return m, np.stack(traj), ok


def test_set_floating_base_equivalence():
    bodies, joints = _chain()
    m1 = dt.build(bodies, joints, [], timestep=0.01)
    s0 = m1.zero_state()
    # excite all DoF: spin + drift of the whole assembly
    v = np.asarray(s0.v).copy()
    w = np.asarray(s0.w).copy()
    v[:, 0] = 0.3
    w[0] = (0.5, 1.2, -0.4)
    w[1] = (0.5, 1.2, -0.4)
    w[2] = (0.5, 1.2, -0.4)
    s0 = dt.BodyState(x=s0.x, q=s0.q, v=np.asarray(v), w=np.asarray(w))

    b2, j2 = set_floating_base(bodies, joints, "c")
    assert next(j for j in j2 if j.parent == "origin").child == "c"
    m2 = dt.build(b2, j2, [], timestep=0.01)

    # identical initial world-frame state, re-indexed to m2's body order
    perm = [m1.body_index[n] for n in m2.body_names]
    s0b = dt.BodyState(
        x=np.asarray(s0.x)[perm], q=np.asarray(s0.q)[perm],
        v=np.asarray(s0.v)[perm], w=np.asarray(s0.w)[perm],
    )

    _, t1, ok1 = _rollout(bodies, joints, s0)
    _, t2, ok2 = _rollout(b2, j2, s0b)
    assert all(ok1) and all(ok2)
    for nm in ("a", "b", "c"):
        i1, i2 = m1.body_index[nm], m2.body_index[nm]
        err = np.abs(t1[:, i1] - t2[:, i2]).max()
        assert err < 1e-8, (nm, err)
