"""System identification on the REAL block-toss experiment recordings.

Port of the reference's real-hardware sysid (examples/system_identification/
real_block.jl): 570 tosses of an acrylic block recorded by a motion-capture
rig (DAIRLab contact-nets dataset; distances pre-scaled ×20), shipped as
raw CSVs in examples/system_identification/data/experiment/tosses_csv/.
The reference fits 25 contact parameters — one shared friction coefficient
plus the 8 corner contact-point offsets — with a Gauss-Newton loop over
hand-derived contact Jacobians (utilities.jl `loss`, real_block.jl
parameter_stack/guess/bounds).

Here: their data, our physics.  The CSV poses are converted to maximal
states exactly as their conversion.jl does (midpoint finite-difference
velocities, lie.angular_velocity); the loss is the same 3-step shooting
window (timesteps 50:52) under the same state weights; gradients come from
`jax.jacfwd` through the IFT-differentiable contact step instead of hand
Jacobians, vmapped over all tosses at once.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/sysid_real_block.py
"""

import os

import jax

jax.config.update("jax_enable_x64", True)
from dojo_tpu.cachedir import repo_cache_dir

jax.config.update("jax_compilation_cache_dir", repo_cache_dir("local"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from dojo_tpu import lie, models
from dojo_tpu.core import BodyState, SolverOptions
from dojo_tpu.gradients import make_diff_step

TOSS_DIR = (
    "/root/reference/examples/system_identification/data/experiment/"
    "tosses_csv"
)
# real_block.jl parameters: distances ×20, h=1/148, block edge 0.1×20
SCALE = 20.0
TIMESTEP = 1.0 / 148
EDGE = 0.1 * SCALE


def load_tosses(n_tosses, t0, horizon, path=TOSS_DIR):
    """Maximal states from the raw mocap CSVs (conversion.jl semantics):
    row k = [x(3), q(4), ...]; state k uses pose k with midpoint velocities
    from poses (k−1, k).  Returns states for t0 .. t0+horizon as numpy
    arrays of shape (N, horizon+1, ·) — skipping tosses shorter than the
    window."""
    xs, qs, vs, ws = [], [], [], []
    k = 0
    while len(xs) < n_tosses:
        f = os.path.join(path, f"{k}.csv")
        k += 1
        if not os.path.exists(f):
            if k > 600:
                break
            continue
        rows = np.loadtxt(f, delimiter=",")
        if rows.shape[0] < t0 + horizon + 2:
            continue
        x = rows[:, 0:3]
        q = rows[:, 3:7]
        v = (x[1:] - x[:-1]) / TIMESTEP
        om = np.stack(
            [
                np.asarray(
                    lie.angular_velocity(
                        jnp.asarray(q[i]), jnp.asarray(q[i + 1]), TIMESTEP
                    )
                )
                for i in range(t0 - 1, t0 + horizon + 1)
            ]
        )
        sl = slice(t0, t0 + horizon + 1)
        xs.append(x[1:][sl])  # state i uses pose i+1 (conversion.jl z_ip1)
        qs.append(q[1:][sl])
        vs.append(v[sl])
        ws.append(om[1:])
    return (np.stack(xs), np.stack(qs), np.stack(vs), np.stack(ws))


def main(n_tosses=100, t0=50, horizon=3, iters=15, verbose=True):
    X, Q, V, W = load_tosses(n_tosses, t0, horizon)
    n = X.shape[0]
    if verbose:
        print(f"{n} tosses, window t0={t0} horizon={horizon}")

    mech = models.get_mechanism(
        "block", timestep=TIMESTEP, gravity=-9.81 * SCALE, edge_length=EDGE,
        friction_coefficient=0.16,
    )
    # reference real_block.jl opts: btol=rtol=3e-4, undercut=3
    opts = SolverOptions(rtol=3e-4, btol=3e-4, undercut=3.0, max_iter=40)
    step = make_diff_step(mech.topo, opts)
    u = jnp.zeros((mech.topo.nj, 6))

    s0 = BodyState(
        x=jnp.asarray(X[:, 0])[:, None, :],
        q=jnp.asarray(Q[:, 0])[:, None, :],
        v=jnp.asarray(V[:, 0])[:, None, :],
        w=jnp.asarray(W[:, 0])[:, None, :],
    )
    true_packed = jnp.asarray(
        np.concatenate(
            [
                np.concatenate([X[:, k], V[:, k], Q[:, k], W[:, k]], axis=1)
                for k in range(1, horizon + 1)
            ],
            axis=1,
        )
    )  # (N, horizon*13)

    # reference loss weights Q = diag([1,1,1, .1,.1,.1, 1,1,1,1, .1,.1,.1])
    wts = jnp.sqrt(
        jnp.asarray([1.0] * 3 + [0.1] * 3 + [1.0] * 4 + [0.1] * 3)
    )

    def with_theta(theta):
        """θ = [friction, corner offsets (8×3 flattened)] — the reference's
        parameter_stack (real_block.jl:34-47) with per-corner origins and
        one shared friction coefficient."""
        mu = theta[0]
        corners = theta[1:].reshape(8, 3)
        return mech.params._replace(
            contact_friction=jnp.full_like(mech.params.contact_friction, mu),
            contact_origin=corners.astype(mech.params.contact_origin.dtype),
        )

    def shoot(theta, s):
        params = with_theta(theta)

        def body(carry, _):
            s2 = step(params, carry, u)
            return s2, jnp.concatenate([s2.x[0], s2.v[0], s2.q[0], s2.w[0]])

        _, zs = jax.lax.scan(body, s, None, length=horizon)
        return zs.reshape(-1)

    def residuals(theta):
        pred = jax.vmap(shoot, in_axes=(None, 0))(theta, s0)
        r = (pred - true_packed) * jnp.tile(wts, horizon)[None]
        return r.reshape(-1) / np.sqrt(n)

    res_j = jax.jit(residuals)
    jac_j = jax.jit(jax.jacfwd(residuals))

    # reference initial guess and box bounds (real_block.jl:76-118): corners
    # start OUTSIDE the true ±1.0 cube (at ±2.0) so the model penetrates
    # and the contact landscape has gradient
    sgn = np.array(
        [
            [+1, +1, -1], [+1, -1, -1], [-1, +1, -1], [-1, -1, -1],
            [+1, +1, +1], [+1, -1, +1], [-1, +1, +1], [-1, -1, +1],
        ],
        dtype=np.float64,
    )
    theta = jnp.asarray(np.concatenate([[0.40], (2.0 * sgn).reshape(-1)]))
    lo = np.concatenate([[0.0], np.where(sgn.reshape(-1) > 0, 0.05, -2.0)])
    hi = np.concatenate([[0.8], np.where(sgn.reshape(-1) > 0, 2.0, -0.05)])
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)

    reg = 1e-9
    f_hist = []
    for k in range(iters):
        r = res_j(theta)
        J = jac_j(theta)
        f = 0.5 * float(r @ r)
        f_hist.append(f)
        g = J.T @ r
        H = J.T @ J + reg * jnp.eye(len(theta))
        p = -jnp.linalg.solve(H, g)
        alpha, accepted = 1.0, False
        for _ in range(8):
            cand = jnp.clip(theta + alpha * p, lo, hi)
            rc = res_j(cand)
            if 0.5 * float(rc @ rc) <= f:
                theta, accepted = cand, True
                break
            alpha /= 3.0
        reg = reg * 10.0 if not accepted else max(reg / 3.0, 1e-9)
        if verbose:
            mu = float(theta[0])
            mean_half_edge = float(jnp.mean(jnp.abs(theta[1:])))
            print(
                f"k={k} f={f:.4e} mu={mu:.3f} "
                f"mean|corner|={mean_half_edge:.3f} (true 1.0)"
            )
        if float(jnp.abs(g).max()) < 1e-10:
            break
    return np.asarray(theta), f_hist


if __name__ == "__main__":
    theta, f_hist = main()
    mu = theta[0]
    corners = theta[1:].reshape(8, 3)
    print(f"\nrecovered friction = {mu:.3f}")
    print(f"recovered mean half-edge = {np.mean(np.abs(corners)):.3f} "
          f"(physical block: 1.0, scaled)")
    print(f"loss: {f_hist[0]:.4e} -> {f_hist[-1]:.4e}")
