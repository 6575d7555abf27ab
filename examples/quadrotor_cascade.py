"""Quadrotor cascade controller — parity with the reference example
(examples/control/quadrotor_cascade.jl): an outer position loop commands a
vertical velocity, an inner velocity loop commands collective rotor RPMs
(P/D + hover feedforward), flying the pelican to altitude 0.3 m.
"""

import jax
import numpy as np


def main(horizon=200):
    jax.config.update("jax_enable_x64", True)
    from dojo_tpu import envs

    env = envs.get_environment("quadrotor_waypoint", horizon=horizon)
    y = env.reset()
    mode = np.ones(4) / 2.0  # normalize([1,1,1,1])

    def velocity_controller(y, v_des):
        v_is = float(np.asarray(y)[8])  # base vz
        thrust = (10.0 * (v_des - v_is) - 1.0 * v_is + 5.1) * mode
        return thrust * 20.0  # rpm

    def position_controller(y, z_des):
        z_is = float(np.asarray(y)[2])
        return velocity_controller(y, z_des - z_is)

    zs = []
    for _ in range(horizon):
        u = position_controller(y, 0.3)
        y, r, done, info = env.step(y, u)
        assert bool(info.success)
        zs.append(float(np.asarray(y)[2]))
    print("final altitude:", zs[-1], "(goal 0.3)")
    return np.asarray(zs)


if __name__ == "__main__":
    main()
