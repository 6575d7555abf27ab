"""Cartpole LQR via IFT linearization — parity with the reference example
(examples/control/cartpole_lqr.jl): linearize the contact-free dynamics at
the origin with get_minimal_gradients (here: dojo_tpu.minimal_jacobians),
build a discrete LQR gain, and stabilize from orientation = π/4.
"""

import jax
import jax.numpy as jnp
import numpy as np


def dare_gain(A, B, Q, R, iters=300):
    """Discrete-time LQR gain by Riccati fixed-point iteration."""
    P = Q
    for _ in range(iters):
        BtPB = R + B.T @ P @ B
        K = np.linalg.solve(BtPB, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
    return K


def main(horizon=1000, plot=False):
    jax.config.update("jax_enable_x64", True)
    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.gradients import make_diff_step_minimal, minimal_jacobians

    mech = models.get_mechanism("cartpole", timestep=0.01)
    opts = SolverOptions(rtol=1e-10, btol=1e-10)
    y0 = jnp.zeros(4)
    u0 = jnp.zeros(mech.input_dim)
    A, B = jax.jit(minimal_jacobians(mech.topo, opts))(mech.params, y0, u0)
    A, B = np.asarray(A), np.asarray(B)[:, :1]  # cart force only
    K = dare_gain(A, B, np.eye(4), np.eye(1))
    print("LQR gain:", K)

    step = jax.jit(make_diff_step_minimal(mech.topo, opts))
    state = models.initialize(mech, "cartpole", position=0.0, orientation=np.pi / 4)
    y = mech.minimal_state(state)
    ys = [np.asarray(y)]
    for _ in range(horizon):
        u = -K @ np.asarray(y)
        y = step(mech.params, y, jnp.asarray([u[0], 0.0]))
        ys.append(np.asarray(y))
    ys = np.stack(ys)
    print("final state:", ys[-1])
    return ys, K


if __name__ == "__main__":
    main()
