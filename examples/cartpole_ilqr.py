"""Cartpole swing-up via iLQR over the IFT-differentiable dynamics.

Reference analog: examples/control/cartpole_lqr.jl + ilqr examples —
the stage gate for gradient-based control through the engine.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/cartpole_ilqr.py
"""

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
from dojo_tpu.cachedir import repo_cache_dir
jax.config.update("jax_compilation_cache_dir", repo_cache_dir())

import jax.numpy as jnp

from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.mpc import ILQRConfig, QuadCost, make_ilqr


def main(horizon=40, iterations=12):
    mech = models.get_mechanism("cartpole", timestep=0.05)
    state = models.initialize(mech, "cartpole", position=0.0, orientation=np.pi)
    y0 = mech.minimal_state(state)  # pole down at π... swing to 0 (up)

    # y = [cart pos, cart vel, pole angle, pole vel]; goal: upright (angle 0)
    cost = QuadCost(
        Q=jnp.array([1.0, 0.1, 10.0, 0.1]),
        R=jnp.array([0.05, 1e6]),  # pole joint unactuated → huge penalty
        Qf=jnp.array([10.0, 1.0, 100.0, 1.0]),
        y_goal=jnp.zeros(4),
    )
    ilqr = jax.jit(
        make_ilqr(
            mech.topo, cost, horizon, ILQRConfig(iterations=iterations),
            SolverOptions(rtol=1e-8, btol=1e-8, max_iter=20),
        )
    )
    us0 = jnp.zeros((horizon, mech.input_dim))
    us, ys, c, okf = ilqr(mech.params, y0, us0)
    print("final cost", float(c))
    print("terminal state", np.asarray(ys[-1]))
    return np.asarray(ys), np.asarray(us), float(c)


if __name__ == "__main__":
    main()
