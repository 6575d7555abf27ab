"""Control-layer parity tests: cartpole LQR (reference
examples/control/cartpole_lqr.jl) and cartpole iLQR swing-up through the
IFT-differentiable dynamics (the MPC stack's core path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dojo_tpu import models
from dojo_tpu.core import SolverOptions


@pytest.mark.slow
def test_cartpole_lqr_stabilizes(tmp_path):
    """Discrete LQR from the IFT linearization at the origin stabilizes the
    cartpole from orientation π/4 (the reference example's scenario).

    The example runs in a SUBPROCESS: XLA:CPU deterministically segfaults
    compiling this exact module deep into a full-suite process (fine in
    isolation — diagnosed r2, three identical crash stacks in
    backend_compile_and_load); the child also seeds the persistent cache so
    the in-process linearization below deserializes instead of compiling."""
    import os
    import subprocess
    import sys

    examples = os.path.join(os.path.dirname(__file__), "..", "examples")
    out = str(tmp_path / "lqr.npz")
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import numpy as np\n"
        "from cartpole_lqr import main\n"
        "ys, K = main(horizon=600)\n"
        "np.savez(%r, ys=ys, K=K)\n" % (examples, out)
    )
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    from dojo_tpu.cachedir import repo_cache_dir
    env.setdefault("JAX_COMPILATION_CACHE_DIR", repo_cache_dir("local"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=1800)
    d = np.load(out)
    ys, K = d["ys"], d["K"]
    # the pole is captured upright and the cart is on its way back (with
    # Q=I, R=I the cart legitimately travels ~4 m to catch the pole and
    # returns on a ~10 s timescale, as in the reference's 10 s rollout)
    tail = ys[-50:]
    assert np.abs(tail[:, 2]).max() < 5e-2, np.abs(tail[:, 2]).max()
    xabs = np.abs(ys[:, 0])
    assert xabs.max() < 6.0, xabs.max()
    assert xabs[-1] < 0.5 * xabs.max(), (xabs[-1], xabs.max())
    assert np.isfinite(K).all()
    # closed loop is strictly stable: ρ(A − B K) < 1 for the IFT-linearized
    # discrete dynamics (the LQR-parity property itself)
    import jax
    import jax.numpy as jnp

    from dojo_tpu.gradients import minimal_jacobians
    from dojo_tpu import models as _models

    mech = _models.get_mechanism("cartpole", timestep=0.01)
    A, B = jax.jit(minimal_jacobians(mech.topo, SolverOptions(rtol=1e-10, btol=1e-10)))(
        mech.params, jnp.zeros(4), jnp.zeros(mech.input_dim)
    )
    Acl = np.asarray(A) - np.asarray(B)[:, :1] @ K
    rho = np.abs(np.linalg.eigvals(Acl)).max()
    assert rho < 1.0 - 1e-4, rho


@pytest.mark.slow
def test_cartpole_ilqr_improves_cost():
    """iLQR through contact-free IFT dynamics reduces the tracking cost
    (mpc/ilqr.py core path, incl. shared-factorization linearize and the
    parallel Riccati backward)."""
    from dojo_tpu.mpc import ILQRConfig, QuadCost, make_ilqr

    mech = models.get_mechanism("cartpole", timestep=0.02)
    ny, nu = mech.minimal_dim, mech.input_dim
    cost = QuadCost(
        Q=jnp.asarray([1.0, 0.1, 5.0, 0.1]),
        R=jnp.full((nu,), 1e-3),
        Qf=jnp.asarray([10.0, 1.0, 50.0, 1.0]),
        y_goal=jnp.zeros(ny),
    )
    opts = SolverOptions(rtol=1e-8, btol=1e-8, max_iter=10)
    H = 30
    y0 = jnp.asarray([0.0, 0.0, 0.7, 0.0])  # pole displaced 0.7 rad

    for parallel in (False, True):
        ilqr = make_ilqr(
            mech.topo, cost, H,
            config=ILQRConfig(iterations=4, alphas=(1.0, 0.5, 0.1),
                              parallel_riccati=parallel),
            opts=opts,
        )
        us0 = jnp.zeros((H, nu))
        us, ys, c, okf = jax.jit(ilqr)(mech.params, y0, us0)
        # cost of doing nothing
        _, _, c0, _ = jax.jit(
            make_ilqr(mech.topo, cost, H,
                      config=ILQRConfig(iterations=0), opts=opts)
        )(mech.params, y0, us0)
        assert float(c) < 0.5 * float(c0), (parallel, float(c), float(c0))
        assert float(okf) > 0.99
        # terminal pole angle pulled toward upright
        assert abs(float(ys[-1][2])) < abs(float(y0[2])), parallel


@pytest.mark.slow
def test_cartpole_ilqr_rt_runtime_gains():
    """make_ilqr_rt: the runtime-data iLQR (cost diagonals, reg, clamp as
    traced arguments) reduces the tracking cost like the baked-cost
    make_ilqr, and different gains reuse the same compiled graph."""
    from dojo_tpu.mpc import make_ilqr_rt

    mech = models.get_mechanism("cartpole", timestep=0.02)
    ny, nu = mech.minimal_dim, mech.input_dim
    opts = SolverOptions(rtol=1e-8, btol=1e-8, max_iter=10)
    H = 30
    y0 = jnp.asarray([0.0, 0.0, 0.7, 0.0])
    ilqr_rt = jax.jit(make_ilqr_rt(
        mech.topo, H, opts, alphas=(1.0, 0.5, 0.1), iterations=4
    ))
    goals = jnp.zeros((H + 1, ny))
    Qd = jnp.asarray([1.0, 0.1, 5.0, 0.1])
    Rd = jnp.full((nu,), 1e-3)
    us0 = jnp.zeros((H, nu))
    args = (mech.params, y0, us0, goals)
    us, ys, c, okf = ilqr_rt(
        *args, Qd, Rd, 10.0 * Qd, jnp.asarray(1e-6), jnp.asarray(1e9)
    )
    # passive-cartpole cost under the same weights (zero iterations)
    ilqr_rt0 = jax.jit(make_ilqr_rt(
        mech.topo, H, opts, alphas=(1.0,), iterations=0
    ))
    _, _, c0, _ = ilqr_rt0(
        *args, Qd, Rd, 10.0 * Qd, jnp.asarray(1e-6), jnp.asarray(1e9)
    )
    assert float(c) < 0.5 * float(c0), (float(c), float(c0))
    assert float(okf) > 0.99
    assert abs(float(ys[-1][2])) < abs(float(y0[2]))
    # a second gain set reuses the compiled graph (traced args)
    us2, ys2, c2, _ = ilqr_rt(
        *args, 2.0 * Qd, Rd, 20.0 * Qd, jnp.asarray(1e-2), jnp.asarray(5.0)
    )
    assert np.isfinite(float(c2))
    assert not np.allclose(np.asarray(us), np.asarray(us2))


def test_ilqr_defaults_are_backend_safe():
    """ILQRConfig.linearize_chunk must default OFF: the chunked (lax.map)
    linearization's scan-of-vmap batched-matmul pattern trips an XLA:TPU
    internal compiler error (mis-rewrite into a base-dilated convolution,
    BASELINE.md r3), so a library user calling make_trot_mpc() with
    defaults on TPU must never hit the chunked path."""
    from dojo_tpu.mpc import ILQRConfig

    assert ILQRConfig().linearize_chunk == 0


@pytest.mark.slow
def test_cartpole_rti_closed_loop():
    """Real-time-iteration MPC (make_rti_mpc: shifted linearization + one
    forward pass per control step) drives the displaced cartpole toward the
    origin in closed loop against the tight plant — the RTI path must match
    the full-iLQR controller's qualitative behavior at half the sequential
    solve depth."""
    from dojo_tpu.gradients import make_rollout_linearize_minimal
    from dojo_tpu.mpc import ILQRConfig, QuadCost, make_rti_mpc

    mech = models.get_mechanism("cartpole", timestep=0.02)
    ny, nu = mech.minimal_dim, mech.input_dim
    cost = QuadCost(
        Q=jnp.asarray([1.0, 0.1, 5.0, 0.1]),
        R=jnp.full((nu,), 1e-3),
        Qf=jnp.asarray([10.0, 1.0, 50.0, 1.0]),
        y_goal=jnp.zeros(ny),
    )
    opts = SolverOptions(rtol=1e-8, btol=1e-8, max_iter=10)
    H, K = 20, 15
    y0 = jnp.asarray([0.0, 0.0, 0.5, 0.0])

    init, mpc = make_rti_mpc(
        mech.topo, cost, H, config=ILQRConfig(alphas=(1.0,)), opts=opts
    )
    plant_step, _, plant_seed = make_rollout_linearize_minimal(
        mech.topo, SolverOptions(rtol=1e-10, btol=1e-10, max_iter=20)
    )
    st = jax.jit(init)(mech.params, y0, jnp.zeros((H, nu)))
    step_j = jax.jit(
        lambda p, y, st, w: (
            lambda u0, st2, c, okf: (u0, st2, c, okf, plant_step(p, y, u0, w))
        )(*mpc(p, y, st, None))
    )
    y, w = y0, plant_seed(mech.params, y0)
    oks = []
    for _ in range(K):
        u0, st, c, okf, (y, w, _, ok) = step_j(mech.params, y, st, w)
        oks.append(float(okf))
    yf = np.asarray(y)
    assert np.isfinite(yf).all()
    # pole angle pulled well toward upright, cart bounded
    assert abs(yf[2]) < 0.25 * 0.5, yf
    assert abs(yf[0]) < 3.0, yf
    assert np.mean(oks) > 0.99, oks


@pytest.mark.slow
def test_cartpole_rti_rt_closed_loop():
    """make_rti_rt: the carried-trajectory runtime-gains controller (r5
    latency-optimal shape — shifted linearization, NO re-rollout, α line
    search) drives the displaced cartpole toward the origin in closed loop,
    and a second gain set reuses the same compiled graph."""
    from dojo_tpu.gradients import make_rollout_linearize_minimal
    from dojo_tpu.mpc import make_rti_rt

    mech = models.get_mechanism("cartpole", timestep=0.02)
    ny, nu = mech.minimal_dim, mech.input_dim
    opts = SolverOptions(rtol=1e-8, btol=1e-8, max_iter=10)
    H, K = 20, 15
    y0 = jnp.asarray([0.0, 0.0, 0.5, 0.0])
    Qd = jnp.asarray([1.0, 0.1, 5.0, 0.1])
    Rd = jnp.full((nu,), 1e-3)
    goals = jnp.zeros((H + 1, ny))
    gains = (Qd, Rd, 10.0 * Qd, jnp.asarray(1e-6), jnp.asarray(1e9))

    init, mpc = make_rti_rt(mech.topo, H, opts, alphas=(1.0, 0.5))
    plant_step, _, plant_seed = make_rollout_linearize_minimal(
        mech.topo, SolverOptions(rtol=1e-10, btol=1e-10, max_iter=20)
    )
    st, c0, okf0 = jax.jit(init)(
        mech.params, y0, jnp.zeros((H, nu)), goals, *gains
    )
    mpc_j = jax.jit(mpc)
    plant_j = jax.jit(plant_step)
    y, w = y0, plant_seed(mech.params, y0)
    oks = []
    for _ in range(K):
        u0, st, c, okf = mpc_j(
            mech.params, y, st, goals, *gains, st.us[-1]
        )
        y, w, _, ok = plant_j(mech.params, y, u0, w)
        oks.append(float(okf))
    yf = np.asarray(y)
    assert np.isfinite(yf).all()
    assert abs(yf[2]) < 0.25 * 0.5, yf
    assert abs(yf[0]) < 3.0, yf
    assert np.mean(oks) > 0.99, oks
    # different runtime gains, same compiled graph
    u0b, _, c2, _ = mpc_j(
        mech.params, y, st, goals, 2.0 * Qd, Rd, 20.0 * Qd,
        jnp.asarray(1e-2), jnp.asarray(5.0), st.us[-1]
    )
    assert np.isfinite(float(c2))
    assert not np.allclose(np.asarray(u0), np.asarray(u0b))


def test_trot_weight_schedule_and_ff_layout():
    """Per-knot weight schedules scale exactly the thigh/calf position
    weights between stance and swing, and the feedforward layout maps each
    actuated joint to its minimal position column and standing angle."""
    from dojo_tpu.mpc import TrotSpec, trot_gains, trot_weight_schedule
    from dojo_tpu.mpc.trot import _ff_layout, _layout

    mech = models.get_mechanism("quadruped", timestep=0.05)
    spec = TrotSpec()
    H, DT = 12, 0.05
    g = trot_gains(mech)
    Qs = trot_weight_schedule(
        mech, jnp.asarray(0.0), H, DT, spec, g.Qd,
        swing_scale=2.0, stance_scale=0.5,
    )
    assert Qs.shape == (H + 1, len(g.Qd))
    offs = _layout(mech)
    ratio = np.asarray(Qs) / np.asarray(g.Qd)[None]
    sched_cols = {offs[f"{grp}_{p}_joint"]
                  for grp in ("FR", "FL", "RR", "RL")
                  for p in ("thigh", "calf")}
    for col in range(Qs.shape[1]):
        r = ratio[:, col][np.isfinite(ratio[:, col])]
        if col in sched_cols:
            assert r.min() >= 0.5 - 1e-6 and r.max() <= 2.0 + 1e-6
            assert r.max() - r.min() > 0.5  # actually varies over the gait
        elif len(r):
            assert np.allclose(r, 1.0)  # everything else untouched

    cols, stand = _ff_layout(mech, spec)
    assert len(cols) == 12 and len(stand) == 12
    name_of = {j: n for n, j in mech.joint_index.items()}
    k = 0
    for j in range(mech.topo.nj):
        nm = name_of[j]
        if nm == "floating_base":
            continue
        assert cols[k] == offs[nm]
        want = (spec.thigh_stand if nm.endswith("_thigh_joint")
                else spec.calf_stand if nm.endswith("_calf_joint") else 0.0)
        assert abs(stand[k] - want) < 1e-12
        k += 1


def test_trot_rt_kff_zero_is_plain_warm_start():
    """TrotGains.kff=0 reproduces the pre-feedforward controller exactly:
    the deviation-carry wrapper must be a no-op at zero gain."""
    from dojo_tpu.mpc import TrotSpec, make_trot_rt

    mech = models.get_mechanism("quadruped", timestep=0.05)
    H, DT = 3, 0.05
    opts = SolverOptions(rtol=1e-3, btol=1e-2, max_iter=4)
    mpc, ref_fn, gains = make_trot_rt(
        mech, horizon=H, spec=TrotSpec(), opts=opts, dt=DT, alphas=(1.0,)
    )
    from dojo_tpu.minimal import maximal_to_minimal

    state0 = models.initialize(mech, "quadruped")
    y = maximal_to_minimal(mech.topo, mech.params, state0)
    goals = ref_fn(jnp.asarray(0.0))
    dus = jnp.zeros((H, 12))
    u0_a, dus_a, _, _ = mpc(mech.params, y, dus, goals, *gains)
    # nonzero kff changes the controls; kff=0 run is reproducible
    gains_ff = gains._replace(kff=jnp.asarray(25.0))
    u0_b, _, _, _ = mpc(mech.params, y, dus, goals, *gains_ff)
    u0_c, _, _, _ = mpc(mech.params, y, dus, goals, *gains)
    assert np.allclose(np.asarray(u0_a), np.asarray(u0_c))
    assert not np.allclose(np.asarray(u0_a), np.asarray(u0_b))
