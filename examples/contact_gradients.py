"""Gradients through contact — parity with the reference example
(examples/simulation/mechanics/contact_gradients.jl): a resting 2-D block
pushed laterally across the stick/slip boundary (friction mode) or pulled
vertically across the contact/no-contact boundary (impact mode).

Hard contact makes Δx(F) a kink; the interior-point relaxation smooths it,
and the IFT gradient ∂x′/∂F is the derivative of THAT smoothed dynamics —
looser solver tolerances (larger final μ) give smoother, more informative
gradients, which is why MPC solves run relaxed (mpc bench opts).

TPU-native twist: the whole force sweep evaluates as one vmap — position
response and gradient for every force in a single compiled call.

Gravity = friction = 1 as in the reference, so slip starts at F = m·g·μ = 1
and lift-off at F = m·g = 1.
"""

import jax
import jax.numpy as jnp
import numpy as np


def main(n_forces=21, tols=(1e-4, 1e-6, 1e-8, 1e-10)):
    jax.config.update("jax_enable_x64", True)
    from dojo_tpu import models
    from dojo_tpu.core import SolverOptions
    from dojo_tpu.gradients import make_diff_step_minimal

    mech = models.get_mechanism(
        "block2d", timestep=0.1, gravity=-1.0, friction_coefficient=1.0
    )
    state = models.initialize(
        mech, "block2d", position=(0.0, 0.0), angular_velocity=0.0
    )
    y0 = mech.minimal_state(state)
    Fs = jnp.linspace(0.5, 1.5, n_forces)

    out = {}
    for mode, idx in (("friction", 0), ("impact", 1)):
        print(f"--- {mode}: force index {idx}, slip/lift threshold at F=1")
        for btol in tols:
            opts = SolverOptions(rtol=btol, btol=btol, max_iter=60,
                                 undercut=1.0, no_progress_undercut=1.0)
            step = make_diff_step_minimal(mech.topo, opts)

            def response(F):
                u = jnp.zeros(mech.topo.input_dim, y0.dtype).at[idx].set(F)
                y1 = step(mech.params, y0, u)
                return y1[idx] - y0[idx]

            dx, g = jax.jit(jax.vmap(jax.value_and_grad(response)))(Fs)
            out[(mode, btol)] = (np.asarray(dx), np.asarray(g))
            lo, hi = np.asarray(g)[0], np.asarray(g)[-1]
            print(f"  btol={btol:5.0e}:  ∂x/∂F below {lo:+.4f}  above {hi:+.4f}"
                  f"  (smoothed kink width shrinks with btol)")
    # sanity: sticking/contact branch has ~zero gain, free branch has h²/m
    dxf, gf = out[("friction", 1e-10)]
    assert abs(gf[0]) < 1e-3 and gf[-1] > 1e-3
    return out


if __name__ == "__main__":
    main()
