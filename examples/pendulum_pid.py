"""Pendulum PID swing to π/2 — parity with the reference example
(examples/control/pendulum_pid.jl): Kp=25, Ki=50, Kd=5 on the minimal
state, 5 s rollout from rest at angle 0.
"""

import jax
import numpy as np


def main(tend=5.0, plot=False):
    jax.config.update("jax_enable_x64", True)
    from dojo_tpu import models

    mech = models.get_mechanism("pendulum")
    h = float(mech.timestep)
    state = models.initialize(mech, "pendulum", angle=0.0, angular_velocity=0.0)

    x_goal = np.array([np.pi / 2, 0.0])
    kp, ki, kd = 25.0, 50.0, 5.0
    summed_error = 0.0

    ys = []
    for _ in range(int(round(tend / h))):
        y = np.asarray(mech.minimal_state(state))
        err = x_goal - y
        summed_error += err[0] * h
        u = kp * err[0] + ki * summed_error + kd * err[1]
        state, info = mech.step(state, u=[u])
        assert bool(info.success)
        ys.append(y)
    ys = np.stack(ys)
    print("final state:", ys[-1], "(goal π/2 =", np.pi / 2, ")")
    return ys


if __name__ == "__main__":
    main()
