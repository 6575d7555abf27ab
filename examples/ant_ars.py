"""Augmented Random Search on the Ant environment.

Reference analog: examples/learning/ant_ars.jl (linear policy, ARS V1).
Here the policy rollout is a jitted function and the 2N perturbation
rollouts evaluate as one vmapped batch — the reference evaluates them
serially.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/ant_ars.py --iters 5
"""

import argparse

import jax

from dojo_tpu.cachedir import repo_cache_dir
jax.config.update("jax_compilation_cache_dir", repo_cache_dir())

import jax.numpy as jnp
import numpy as np

from dojo_tpu import envs


def main(iters=10, n_dirs=4, step_size=0.02, noise=0.03, horizon=30, seed=0):
    env = envs.get_environment("ant_ars", horizon=horizon)
    ny, nu = env.state_dim, env.input_dim - 6  # actuated joints only
    rng = np.random.default_rng(seed)
    theta = jnp.zeros((nu, ny))

    y0 = env.reset()
    raw_step = env._raw_step()

    def rollout_return(policy, y0):
        def body(y, _):
            u = policy @ y
            up = jnp.concatenate([jnp.zeros(6), u])
            y2, info = raw_step(y, up)
            h = env.mech.params.timestep
            r = (y2[0] - y[0]) / h * h + 0.05 - 0.5 * jnp.sum(u**2) * h
            return y2, r

        _, rs = jax.lax.scan(body, y0, None, length=horizon)
        return jnp.sum(rs)

    batched = jax.jit(jax.vmap(rollout_return, in_axes=(0, None)))

    for it in range(iters):
        deltas = jnp.asarray(rng.normal(size=(n_dirs, nu, ny)))
        pols = jnp.concatenate([theta + noise * deltas, theta - noise * deltas])
        rets = batched(pols, y0)
        r_plus, r_minus = rets[:n_dirs], rets[n_dirs:]
        grad = jnp.einsum("d,dij->ij", r_plus - r_minus, deltas) / n_dirs
        sigma = jnp.std(rets) + 1e-8
        theta = theta + step_size / sigma * grad
        print(f"iter {it}: mean return {float(rets.mean()):.4f}")
    return theta


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    main(iters=args.iters)
