"""System identification through contact: recover friction coefficient by
gradient descent on rollout data.

Reference analog: examples/system_identification/synthetic_sphere.jl —
there via hand-derived contact-parameter Jacobians (src/gradients/contact.jl);
here plain `jax.grad` through the IFT step.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/sysid_sphere.py
"""

import jax

jax.config.update("jax_enable_x64", True)
from dojo_tpu.cachedir import repo_cache_dir
jax.config.update("jax_compilation_cache_dir", repo_cache_dir())

import jax.numpy as jnp
import numpy as np

from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.gradients import make_diff_step


def main(steps=25, iters=30, lr=2.0):
    opts = SolverOptions(rtol=1e-8, btol=1e-8, max_iter=30)
    mech = models.get_mechanism("sphere", timestep=0.02, friction_coefficient=0.35)
    step = make_diff_step(mech.topo, opts)
    state0 = models.initialize(
        mech, "sphere", position=(0, 0, 0.5), velocity=(2.0, 0, 0),
        angular_velocity=(0, 0, 0),
    )
    u = jnp.zeros((mech.topo.nj, 6))

    def rollout(params):
        def body(s, _):
            s2 = step(params, s, u)
            return s2, s2.x
        _, xs = jax.lax.scan(body, state0, None, length=steps)
        return xs

    xs_true = rollout(mech.params)  # ground truth with μ=0.35

    def loss(mu):
        params = mech.params._replace(
            contact_friction=jnp.full_like(mech.params.contact_friction, mu)
        )
        xs = rollout(params)
        return jnp.mean((xs - xs_true) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    mu = jnp.asarray(0.8)  # wrong initial guess
    for k in range(iters):
        l, g = vg(mu)
        mu = jnp.clip(mu - lr * g, 0.01, 2.0)
        if k % 5 == 0:
            print(f"iter {k:3d}  loss {float(l):.3e}  mu {float(mu):.4f}")
    print("recovered friction:", float(mu), "(true 0.35)")
    return float(mu)


if __name__ == "__main__":
    main()
