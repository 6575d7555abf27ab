"""Build, initialize, and briefly simulate every zoo mechanism — parity
with the reference example (examples/simulation/all_mechanisms.jl), which
loops the full model list and simulates each with default inputs.

Usage: python examples/all_mechanisms.py [seconds_per_model]
(heavy on the 1-core CPU host: one compile per topology).
"""

import sys

import jax
import numpy as np


def main(tend=0.25, subset=None):
    jax.config.update("jax_enable_x64", True)
    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions

    opts = SolverOptions(rtol=1e-6, btol=1e-4)
    names = subset or models.registered_models()
    for name in names:
        mech = models.get_mechanism(name)
        state = models.initialize(mech, name)
        n = max(2, int(round(tend / float(mech.timestep))))
        final, tr = mech.simulate(state, n, opts=opts)
        ok = float(np.asarray(tr.info.success).mean())
        print(f"{name:14s} steps={n:4d} success={ok:.2f} "
              f"|x|max={float(np.abs(np.asarray(tr.x)).max()):.2f}")


if __name__ == "__main__":
    tend = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    main(tend)
