"""Linear vs nonlinear friction-cone comparison — parity with the reference
example (examples/simulation/mechanics/friction_cone_comparison.jl): a block
sliding diagonally at μ=0.25 from v0=(4, 0.8, 0).

The pyramidal (linear) cone is anisotropic: friction along the cone edges is
weaker than along the axes, so the sliding block's path bends away from the
true straight line; the second-order (nonlinear) cone preserves the heading.
Prints the lateral-heading drift of each variant.
"""

import jax
import numpy as np


def main(tend=4.0):
    jax.config.update("jax_enable_x64", True)
    from dojo_tpu import models, visuals

    x0, v0 = (-1.5, -0.5, 0.25), (4.0, 0.8, 0.0)
    heading = np.arctan2(v0[1], v0[0])
    out = {}
    for kind in ("linear", "nonlinear"):
        mech = models.get_mechanism(
            "block", friction_coefficient=0.25, contact_type=kind
        )
        state = models.initialize(mech, "block", position=x0, velocity=v0)
        final, traj = mech.simulate(state, horizon=int(round(tend / mech.timestep)))
        dx = np.asarray(final.x[0] - np.asarray(x0))
        out[kind] = np.degrees(np.arctan2(dx[1], dx[0]) - heading)
        visuals.visualize(mech, traj.x, traj.q, path=f"block_{kind}.html",
                          title=f"{kind} friction cone")
        print(f"{kind:>9} cone: travel {dx[:2].round(3)}, "
              f"heading drift {out[kind]:+.2f} deg")
    assert abs(out["nonlinear"]) < abs(out["linear"]) + 1e-6, (
        "nonlinear cone should track the true heading at least as well"
    )
    return out


if __name__ == "__main__":
    main()
