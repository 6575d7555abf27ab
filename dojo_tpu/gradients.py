"""Differentiable dynamics: implicit-function-theorem gradients through the
contact solver.

Reference: src/gradients/state.jl:69-126 (get_maximal_gradients — IFT solve
``solmat \\ datamat`` at the relaxed solution) and :192-217 (minimal-gradient
sandwich).  Here the IFT is packaged as a ``jax.custom_jvp`` on the solver's
fixed point w*(θ):

    r(w*; θ, μ_f) = 0   ⇒   ẇ* = −J⁻¹ (∂r/∂θ) θ̇,   J = ∂r/∂w + REG·I

evaluated at the solver's final complementarity target μ_f — i.e. gradients
of the *relaxed* (smooth) problem, exactly the reference's gradient
semantics (docs "Dojo's Gradient").  The JVP rule is linear in tangents, so
JAX transposition gives reverse mode for free; vmapping the rule gives full
Jacobians that share one factorization across columns (the reference's
"TODO: use pre-factorization" done right).

Everything downstream (maximal→minimal maps, integrator update, losses) is
plain autodiff through pure functions, so the reference's hand-chained
min/max Jacobian sandwich (state.jl:9-66 pullbacks) is free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie
from .core import REG, BodyState, Params, SolverOptions, Topology
from .minimal import maximal_to_minimal, minimal_to_maximal
from .residual import make_context, make_residual, pad_inputs
from .solver import make_solver


def make_diff_step(topo: Topology, opts: SolverOptions = SolverOptions()):
    """Returns a differentiable step(params, state, u_padded) → BodyState.

    Gradients flow into params (sysid), state (dynamics Jacobians for
    LQR/iLQR/MPC) and u (control Jacobians).
    """
    res_fn = make_residual(topo)
    init_w, solve, _ = make_solver(topo)
    nb = topo.nb

    @jax.custom_jvp
    def w_star(params, state, u):
        ctx = make_context(topo, state, params, u)
        w0 = init_w(state.v, state.w, params)
        res = solve(w0, ctx, params, opts)
        return res.w, res.mu

    @w_star.defjvp
    def w_star_jvp(primals, tangents):
        params, state, u = primals
        dparams, dstate, du = tangents
        w, mu = w_star(params, state, u)

        def r_of_theta(p, s, uu):
            return res_fn(w, make_context(topo, s, p, uu), p, mu)

        _, rdot = jax.jvp(r_of_theta, (params, state, u), (dparams, dstate, du))
        ctx = make_context(topo, state, params, u)
        J = jax.jacfwd(res_fn)(w, ctx, params, mu) + REG * jnp.eye(
            topo.dim, dtype=w.dtype
        )
        wdot = -jnp.linalg.solve(J, rdot)
        return (w, mu), (wdot, jnp.zeros_like(mu))

    def step(params: Params, state: BodyState, u):
        w, _ = w_star(params, state, u)
        bv = w[: 6 * nb].reshape(nb, 6)
        v25, w25 = bv[:, :3], bv[:, 3:]
        h = params.timestep
        return BodyState(
            x=lie.next_position(state.x, v25, h),
            q=lie.next_orientation(state.q, w25, h),
            v=v25,
            w=w25,
        )

    return step


def make_diff_step_minimal(topo: Topology, opts: SolverOptions = SolverOptions()):
    """Differentiable minimal-coordinate dynamics y' = f(y, u_packed)
    (reference step_minimal_coordinates! + get_minimal_gradients!)."""
    step = make_diff_step(topo, opts)

    def step_min(params: Params, y, u_packed):
        state = minimal_to_maximal(topo, params, y)
        u = pad_inputs(topo, u_packed)
        state2 = step(params, state, u)
        return maximal_to_minimal(topo, params, state2)

    return step_min


def make_rollout_linearize_minimal(
    topo: Topology, opts: SolverOptions = SolverOptions(),
    linsolve: str = "auto",
):
    """(step_w, linearize) pair for trajectory optimization that shares one
    contact solve per knot between the rollout and the linearization.

    The reference's gradient path re-solves nothing either: it reuses the
    solver's final factorization (gradients/state.jl:69-126, "TODO: use
    pre-factorization" done right).  make_diff_step_minimal's custom_jvp
    re-solves the primal inside jacfwd; here the rollout returns the solver
    solution w* and μ_f, and `linearize` computes the IFT Jacobians

        A = ∂y′/∂y,  B = ∂y′/∂u   at  r(w*; θ, μ_f) = 0

    with a single Jacobian assembly + LU shared across all ny+nu tangent
    columns — no extra contact solves.

      step_w(params, y, u_packed, w_prev=None) → (y2, w, mu, success)
      linearize(params, y, u_packed, w, mu) → (A, B)
    """
    res_fn = make_residual(topo)
    init_w, solve, _ = make_solver(topo, linsolve=linsolve)
    nb = topo.nb
    ny, nu = topo.minimal_dim, topo.input_dim
    sched = None
    if linsolve == "auto":
        from .blocks import make_assembler
        from .graph import build_schedule
        from .ldu import make_ldu

        sched = build_schedule(topo)
        if sched is not None:
            ldu_assemble = make_assembler(topo, sched)
            _, ldu_factorize, ldu_solve, ldu_matvec = make_ldu(sched)

    def _next_state(state, w, h):
        bv = w[: 6 * nb].reshape(nb, 6)
        v25, w25 = bv[:, :3], bv[:, 3:]
        return BodyState(
            x=lie.next_position(state.x, v25, h),
            q=lie.next_orientation(state.q, w25, h),
            v=v25,
            w=w25,
        )

    def step_w(params: Params, y, u_packed, w_prev=None):
        state = minimal_to_maximal(topo, params, y)
        u = pad_inputs(topo, u_packed)
        ctx = make_context(topo, state, params, u)
        w0 = init_w(state.v, state.w, params, w_prev=w_prev,
                    warm_floor=opts.warm_floor)
        res = solve(w0, ctx, params, opts)
        state2 = _next_state(state, res.w, params.timestep)
        y2 = maximal_to_minimal(topo, params, state2)
        return y2, res.w, res.mu, res.success

    def linearize(params: Params, y, u_packed, w, mu):
        state = minimal_to_maximal(topo, params, y)
        u = pad_inputs(topo, u_packed)
        ctx = make_context(topo, state, params, u)
        with jax.default_matmul_precision("highest"):
            if sched is not None:
                # graph-LDU path: per-node local-AD block assembly +
                # tree-ordered factorization, shared across all ny+nu
                # tangent columns — the reference reuses its final
                # factorization the same way (gradients/state.jl:95-99),
                # and this is ~20× cheaper than the dense jacfwd+LU below
                # on the quadruped KKT.  One refinement sweep recovers the
                # float32 digits the unpivoted elimination loses.
                blocks = ldu_assemble(w, ctx, params, mu)
                fact = ldu_factorize(blocks)

                def lin_solve(rhs):
                    x = ldu_solve(fact, rhs)
                    return x + ldu_solve(fact, rhs - ldu_matvec(blocks, x))
            else:
                J = jax.jacfwd(res_fn)(w, ctx, params, mu) + REG * jnp.eye(
                    topo.dim, dtype=w.dtype
                )
                lu_piv = jax.scipy.linalg.lu_factor(J)
                lin_solve = lambda rhs: jax.scipy.linalg.lu_solve(lu_piv, rhs)

            def out_fn(y_, w_):
                st_ = minimal_to_maximal(topo, params, y_)
                return maximal_to_minimal(
                    topo, params, _next_state(st_, w_, params.timestep)
                )

            def col(dy, du):
                def r_of(y_, u_):
                    st_ = minimal_to_maximal(topo, params, y_)
                    ctx_ = make_context(
                        topo, st_, params, pad_inputs(topo, u_)
                    )
                    return res_fn(w, ctx_, params, mu)

                _, rdot = jax.jvp(r_of, (y, u_packed), (dy, du))
                dw = -lin_solve(rdot)
                _, dy2 = jax.jvp(out_fn, (y, w), (dy, dw))
                return dy2

            eye_y = jnp.eye(ny, dtype=w.dtype)
            eye_u = jnp.eye(nu, dtype=w.dtype)
            zero_u = jnp.zeros((ny, nu), dtype=w.dtype)
            zero_y = jnp.zeros((nu, ny), dtype=w.dtype)
            A = jax.vmap(col)(eye_y, zero_u).T  # columns → (ny, ny)
            B = jax.vmap(col)(zero_y, eye_u).T  # (ny, nu)
        return A, B

    def w_seed(params: Params, y):
        """Cone-neutral solver init for the first knot of a rollout."""
        state = minimal_to_maximal(topo, params, y)
        return init_w(state.v, state.w, params)

    # jit-wrap the pair: step_w appears in BOTH the rollout and the
    # line-search forward scan bodies of every MPC solve, and linearize in
    # the knot vmap — nested jit traces each once and reuses the cached
    # jaxpr at every call site (measured: tracing the trot-MPC graph is
    # ~8 min on a 1-core host without this; the compiled result is
    # identical since XLA inlines the calls).
    return jax.jit(step_w), jax.jit(linearize), w_seed


def minimal_jacobians(topo: Topology, opts: SolverOptions = SolverOptions()):
    """(∂y'/∂y, ∂y'/∂u) — the reference get_minimal_gradients! outputs,
    via vmapped IFT-JVPs sharing the KKT factorization."""
    step_min = make_diff_step_minimal(topo, opts)

    def jac(params, y, u_packed):
        fy = jax.jacfwd(step_min, argnums=1)(params, y, u_packed)
        fu = jax.jacfwd(step_min, argnums=2)(params, y, u_packed)
        return fy, fu

    return jac


def maximal_jacobians(topo: Topology, opts: SolverOptions = SolverOptions()):
    """(∂z'/∂z, ∂z'/∂u) on packed maximal states z = [x v q ω]·Nb
    (reference get_maximal_gradients, 13Nb in / 13Nb out here — the
    reference uses a 12Nb attitude-tangent form; callers wanting that can
    chain with attitude-Jacobian projections)."""
    step = make_diff_step(topo, opts)
    nb = topo.nb

    def f(params, z, u_packed):
        state = BodyState.unpack(z, nb)
        u = pad_inputs(topo, u_packed)
        return step(params, state, u).pack()

    def jac(params, z, u_packed):
        fz = jax.jacfwd(f, argnums=1)(params, z, u_packed)
        fu = jax.jacfwd(f, argnums=2)(params, z, u_packed)
        return fz, fu

    return jac


def attitude_jacobian(z, nb: int):
    """Block-diag G(z) ∈ R^{13Nb×12Nb} mapping attitude-tangent states to
    packed maximal states (reference gradients/utilities.jl:24-34): identity
    on x/v/ω blocks, L(q)·Vᵀ on each quaternion block."""
    state = BodyState.unpack(z, nb)
    G = jnp.zeros((13 * nb, 12 * nb), dtype=z.dtype)
    for b in range(nb):
        r, c = 13 * b, 12 * b
        eye6 = jnp.eye(6, dtype=z.dtype)
        G = G.at[r : r + 6, c : c + 6].set(eye6)  # x, v
        G = G.at[r + 6 : r + 10, c + 6 : c + 9].set(
            lie.Lmat(state.q[b])[:, 1:]
        )
        G = G.at[r + 10 : r + 13, c + 9 : c + 12].set(
            jnp.eye(3, dtype=z.dtype)
        )
    return G


def maximal_jacobians_attjac(topo: Topology, opts: SolverOptions = SolverOptions()):
    """(∂z'/∂z, ∂z'/∂u) in the reference's 12Nb attitude-tangent form
    (gradients/state.jl:102-123): Aatt = G(z')ᵀ · (∂z'/∂z) · G(z),
    Batt = G(z')ᵀ · (∂z'/∂u).  This is the form LQR-on-maximal wants —
    quaternion rows/columns projected onto the 3-dof tangent space."""
    jac13 = maximal_jacobians(topo, opts)
    step = make_diff_step(topo, opts)
    nb = topo.nb

    def jac(params, z, u_packed):
        fz, fu = jac13(params, z, u_packed)
        state = BodyState.unpack(z, nb)
        z2 = step(params, state, pad_inputs(topo, u_packed)).pack()
        Gin, Gout = attitude_jacobian(z, nb), attitude_jacobian(z2, nb)
        return Gout.T @ fz @ Gin, Gout.T @ fu

    return jac


def finite_difference_jacobian(f, x, eps=1e-6):
    """Central-difference Jacobian of ``f`` at ``x`` — the verification tool
    the reference ships as src/gradients/finite_difference.jl (its tests
    check every analytic Jacobian against FD; ours do the same against the
    IFT/AD path).  Returns columns (f(x+εeᵢ) − f(x−εeᵢ)) / 2ε as an
    (out_dim, x.size) ndarray; runs f 2·size times on host."""
    import numpy as _np

    x = _np.asarray(x, dtype=_np.float64)
    cols = []
    for i in range(x.size):
        dx = _np.zeros_like(x)
        dx.flat[i] = eps
        fp = _np.asarray(f(x + dx.reshape(x.shape)), dtype=_np.float64)
        fm = _np.asarray(f(x - dx.reshape(x.shape)), dtype=_np.float64)
        cols.append((fp - fm) / (2 * eps))
    return _np.stack(cols, axis=-1)
