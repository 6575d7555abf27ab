"""Measure the spring-held quadruped's passive rest pose for a spring
stiffness sweep, and print gravity-biased spring offsets: the offset that
makes the STANDING pose the loaded equilibrium (offset2 = 2*stand - rest,
since k*(stand - rest) equals the gravity torque at rest).  Reuses the
steps-bench `batched` graph — params are traced arguments, so the sweep
costs zero compiles."""

import jax
import jax.numpy as jnp
import numpy as np

from dojo_tpu.cachedir import enable_compile_cache

enable_compile_cache()

from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.minimal import maximal_to_minimal, _joint_slices
from dojo_tpu.mpc.trot import trot_spring_params
from dojo_tpu.simulate import make_step

B = 256  # must match the cached steps-bench batch
mech = models.get_mechanism("quadruped", timestep=0.05).cast(jnp.float32)
state = jax.tree.map(
    lambda a: jnp.asarray(a, jnp.float32),
    models.initialize(mech, "quadruped"),
)
step = make_step(mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30))
batt = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), state)
u = jnp.zeros((B, mech.topo.nj, 6), dtype=jnp.float32)


@jax.jit
def batched(params, st, u, w_prev):
    st2, info = jax.vmap(
        lambda s, uu, wp: step(params, s, uu, w_prev=wp),
    )(st, u, w_prev)
    return st2, info.w, info.success, info.iterations


slices, _ = _joint_slices(mech.topo)
STAND = {"hip": 0.0, "thigh": np.pi / 4, "calf": -np.pi / 2}

for k_, d_ in ((20.0, 2.0), (40.0, 4.0), (60.0, 5.0), (100.0, 8.0)):
    params = trot_spring_params(mech, springs=k_, dampers=d_)
    st = batt
    w = jax.jit(jax.vmap(lambda s: step.init_w(s.v, s.w, params)))(batt)
    for _ in range(40):  # 2 s to rest
        st, w, ok, it = batched(params, st, u, w)
    y = maximal_to_minimal(mech.topo, mech.params, jax.tree.map(lambda a: a[0], st))
    yn = np.asarray(y)
    rest = {}
    for kind in ("thigh", "calf", "hip"):
        vals = [
            yn[slices[j][0]]
            for n, j in mech.joint_index.items()
            if n.endswith(f"_{kind}_joint")
        ]
        rest[kind] = float(np.mean(vals))
    print(
        "k=%5.1f d=%4.1f ok=%.2f z=%.3f rest(hip/thigh/calf)="
        "(%+.3f %+.3f %+.3f)  biased offsets=(%+.3f %+.3f %+.3f)" % (
            k_, d_, float(ok.mean()), float(st.x[0, 0, 2]),
            rest["hip"], rest["thigh"], rest["calf"],
            2 * STAND["hip"] - rest["hip"],
            2 * STAND["thigh"] - rest["thigh"],
            2 * STAND["calf"] - rest["calf"],
        ), flush=True,
    )
