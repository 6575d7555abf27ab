"""System identification against the REFERENCE's own recorded dataset.

The reference ships a sysid experiment (examples/system_identification/
synthetic_sphere.jl + real_block.jl) that fits contact parameters
[friction_coefficient, contact_radius] to recorded trajectories with a
Gauss-Newton loop over hand-derived contact-parameter Jacobians
(utilities.jl `loss`, src/gradients/contact.jl).  Its dataset
(data/datasets/synthetic_sphere.jld2: 10 sphere-toss trajectories, h=0.02,
μ=0.2, r=0.5) is plain HDF5 — this example loads those exact recorded
trajectories and recovers the ground-truth parameters with OUR engine:
multi-step shooting loss (the reference's timesteps 10:12 window),
Gauss-Newton steps from `jax.jacfwd` of the residual through the
IFT-differentiable contact step.  Cross-engine parity: their data, our
physics, their ground truth.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/sysid_reference_dataset.py
"""

import jax

jax.config.update("jax_enable_x64", True)
from dojo_tpu.cachedir import repo_cache_dir

jax.config.update("jax_compilation_cache_dir", repo_cache_dir("local"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from dojo_tpu import models
from dojo_tpu.core import BodyState, SolverOptions
from dojo_tpu.gradients import make_diff_step

REF_DATASET = (
    "/root/reference/examples/system_identification/data/datasets/"
    "synthetic_sphere.jld2"
)


def load_reference_sphere_dataset(path=REF_DATASET):
    """Decode the JLD2 (HDF5) Storage vector: per trajectory, (T,3) x,
    (T,4) q, (T,3) v, (T,3) ω for the single body."""
    import h5py

    f = h5py.File(path, "r")

    def field(rec, name):
        obj = f[rec[name]][()]  # (1,) object ref per body
        data = f[np.ravel(obj)[0]][()]  # (T,) structured
        if "data" in (data.dtype.names or ()):  # SVector{3}: nested 'data'
            data = data["data"]
        # quaternions are (s, v1, v2, v3) — scalar-first, our convention
        return np.stack(
            [data[n].astype(np.float64) for n in data.dtype.names], axis=-1
        )

    trajs = []
    for ref in f["storages"]:
        rec = f[ref][()]
        names = rec.dtype.names  # ('x','q','v','ω','px','pq','vl','ωl')
        trajs.append(
            {
                "x": field(rec, "x"),
                "q": field(rec, "q"),
                "v": field(rec, "v"),
                "w": field(rec, names[3]),  # 'ω'
            }
        )
    f.close()
    return trajs


def main(n_traj=10, t0=9, horizon=3, iters=10, verbose=True):
    trajs = load_reference_sphere_dataset()[:n_traj]
    # the dataset's generating mechanism (synthetic_sphere.jl mech_kwargs)
    mech = models.get_mechanism(
        "sphere", timestep=0.02, gravity=-9.81, radius=0.5,
        friction_coefficient=0.2,
    )
    opts = SolverOptions(rtol=1e-8, btol=1e-8, max_iter=30)
    step = make_diff_step(mech.topo, opts)
    u = jnp.zeros((mech.topo.nj, 6))

    # initial states at the learning window start + stacked true states
    s0 = BodyState(
        x=jnp.asarray([t["x"][t0] for t in trajs])[:, None, :],
        q=jnp.asarray([t["q"][t0] for t in trajs])[:, None, :],
        v=jnp.asarray([t["v"][t0] for t in trajs])[:, None, :],
        w=jnp.asarray([t["w"][t0] for t in trajs])[:, None, :],
    )
    true_packed = jnp.asarray(
        np.stack(
            [
                np.concatenate(
                    [
                        np.concatenate(
                            [t["x"][k], t["v"][k], t["q"][k], t["w"][k]]
                        )
                        for k in range(t0 + 1, t0 + 1 + horizon)
                    ]
                )
                for t in trajs
            ]
        )
    )  # (N, horizon*13)

    # reference loss weights Q = diag([1,1,1, .1,.1,.1, 1,1,1,1, .1,.1,.1])
    wts = jnp.sqrt(
        jnp.asarray([1.0] * 3 + [0.1] * 3 + [1.0] * 4 + [0.1] * 3)
    )

    def with_theta(theta):
        mu, r = theta
        return mech.params._replace(
            contact_friction=jnp.full_like(mech.params.contact_friction, mu),
            contact_radius=jnp.full_like(mech.params.contact_radius, r),
        )

    def shoot(theta, s):
        params = with_theta(theta)

        def body(carry, _):
            s2 = step(params, carry, u)
            return s2, jnp.concatenate(
                [s2.x[0], s2.v[0], s2.q[0], s2.w[0]]
            )
        _, zs = jax.lax.scan(body, s, None, length=horizon)
        return zs.reshape(-1)  # (horizon*13,)

    def residuals(theta):
        pred = jax.vmap(shoot, in_axes=(None, 0))(theta, s0)
        r = (pred - true_packed) * jnp.tile(wts, horizon)[None]
        return r.reshape(-1)

    res_j = jax.jit(residuals)
    jac_j = jax.jit(jax.jacfwd(residuals))

    # the reference's initial guess and bounds (synthetic_sphere.jl:87-92):
    # radius starts ABOVE truth so the model sphere penetrates and the
    # contact-parameter landscape has gradient (an under-truth radius puts
    # the model out of contact — flat loss)
    theta = jnp.asarray([0.0, 1.0])
    lo, hi = jnp.asarray([0.0, 0.05]), jnp.asarray([0.8, 1.0])
    reg = 1e-6
    for k in range(iters):
        r = res_j(theta)
        J = jac_j(theta)
        f = 0.5 * float(r @ r)
        g = J.T @ r
        H = J.T @ J + reg * jnp.eye(2)
        p = -jnp.linalg.solve(H, g)
        # backtracking on the clamped step (reference clamped_linesearch)
        alpha, accepted = 1.0, False
        for _ in range(6):
            cand = jnp.clip(theta + alpha * p, lo, hi)
            rc = res_j(cand)
            if 0.5 * float(rc @ rc) <= f:
                theta, accepted = cand, True
                break
            alpha /= 3.0
        reg = reg * 2.0 if not accepted else max(reg / 1.5, 1e-9)
        if verbose:
            print(
                f"k={k} f={f:.3e} mu={float(theta[0]):.4f} "
                f"r={float(theta[1]):.4f}"
            )
        if float(jnp.abs(g).max()) < 1e-6:
            break
    return np.asarray(theta)


if __name__ == "__main__":
    theta = main()
    print("recovered [friction, radius] =", theta, "(truth: [0.2, 0.5])")
