"""iLQR / contact-implicit MPC over minimal coordinates, jit/vmap-native.

Dynamics come from the IFT-differentiable step (gradients at the relaxed
interior-point solution → smooth through contact, the property the reference
demonstrates for gradient-based control).  All control flow is lax.scan /
fori_loop so a full MPC solve jits once and vmaps across scenario batches —
the driver's north-star metric is solves/s/chip of exactly this function.

Structure per iteration:
  1. linearize dynamics along the trajectory (vmapped jacfwd of the step —
     one KKT factorization per knot, shared across tangent columns);
  2. backward Riccati pass with Levenberg regularization (lax.scan, reverse);
  3. forward rollout line search over a fixed α schedule (batched best-of).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import Params, SolverOptions, Topology
from ..gradients import make_rollout_linearize_minimal


class QuadCost(NamedTuple):
    """Quadratic tracking cost  Σ (y−y*)ᵀQ(y−y*) + uᵀRu  + terminal Qf."""

    Q: jax.Array  # (ny,) diagonal or (ny,ny)
    R: jax.Array  # (nu,) diagonal or (nu,nu)
    Qf: jax.Array
    y_goal: jax.Array  # (ny,) or (H+1, ny) for tracking


class ILQRConfig(NamedTuple):
    iterations: int = 10
    reg_init: float = 1e-6
    reg_factor: float = 10.0
    alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)
    # O(log H)-depth associative-scan Riccati backward pass
    # (mpc/parallel_lqr.py) instead of the sequential lax.scan — the
    # horizon-parallel path; shard the knot axis over an `hz` mesh axis to
    # spread the composition tree over ICI
    parallel_riccati: bool = False
    # >0: linearize the trajectory in knot chunks of this size (lax.map
    # batch_size) instead of one vmap over all H knots.  Bounds the HBM
    # held by per-knot KKT block stacks: a full-H vmap under a B-lane
    # scenario vmap materializes (B, H, nodes, 14, 14) temporaries whose
    # (8,128) tiling pads 196 floats to 2048 (10.4×) — at B=512, H=40 that
    # was ~640 MB per buffer and OOM'd a v5e chip (BENCH_r02).  Chunking
    # caps the live set at (B, chunk, ...) with identical results.
    # DEFAULT 0 (off): the scan-of-vmap batched-matmul pattern the chunked
    # path emits trips an XLA:TPU mis-rewrite into a base-dilated
    # convolution (internal compiler error, BASELINE.md r3) — with the
    # default a library user calling make_trot_mpc() on TPU must not hit a
    # compiler crash.  CAUTION: with chunking off, large batch×horizon
    # configs can OOM (B=512, H=40 was ~640 MB/buffer, BENCH_r02) — set
    # linearize_chunk explicitly for large-batch CPU/GPU or long-horizon
    # runs.
    linearize_chunk: int = 0


def _mat(d, n):
    d = jnp.asarray(d)
    return jnp.diag(jnp.broadcast_to(d, (n,))) if d.ndim <= 1 else d


class _Parts(NamedTuple):
    """Shared iLQR building blocks (closures) used by both the full iLQR
    loop (make_ilqr) and the real-time-iteration controller (make_rti_mpc)."""

    step_w: object
    w_seed: object
    rollout: object
    linearize: object
    backward: object
    forward: object
    stage_cost: object
    term_cost: object
    default_goals: object
    nu: int
    ny: int


def _make_parts(topo: Topology, cost: QuadCost, horizon: int,
                config: ILQRConfig, opts: SolverOptions,
                act_idx=None, linsolve: str = "auto") -> _Parts:
    step_w_full, linearize_full, w_seed_full = make_rollout_linearize_minimal(
        topo, opts, linsolve=linsolve
    )
    ny = topo.minimal_dim
    n_packed = topo.input_dim
    if act_idx is None:
        nu = n_packed
        expand = lambda u: u
        shrink_B = lambda B: B
    else:
        act_idx = np.asarray(act_idx, dtype=np.int32)
        nu = len(act_idx)
        expand = lambda u: jnp.zeros(n_packed, dtype=u.dtype).at[act_idx].set(u)
        shrink_B = lambda B: B[:, act_idx]

    def step_w(params, y, u, w_prev=None):
        return step_w_full(params, y, expand(u), w_prev=w_prev)

    H = horizon
    goal = jnp.asarray(cost.y_goal)
    default_goals = (
        jnp.broadcast_to(goal, (H + 1, ny)) if goal.ndim == 1 else goal
    )
    Qm, Rm, Qfm = _mat(cost.Q, ny), _mat(cost.R, nu), _mat(cost.Qf, ny)

    def stage_cost(y, u, g):
        dy = y - g
        return dy @ Qm @ dy + u @ Rm @ u

    def term_cost(y, g):
        dy = y - g
        return dy @ Qfm @ dy

    def rollout(params, y0, us, goals, w_seed):
        """Scan rollout carrying the contact-solver solution along the
        trajectory (each knot warm-starts from its predecessor); returns the
        per-knot (w, μ) so linearize() reuses the solves."""

        def body(carry, u):
            y, w_prev = carry
            y2, w, mu, ok = step_w(params, y, u, w_prev=w_prev)
            return (y2, w), (y2, w, mu, ok)

        (_, _), (ys, ws, mus, oks) = jax.lax.scan(body, (y0, w_seed), us)
        ys = jnp.concatenate([y0[None], ys], axis=0)  # (H+1, ny)
        cost_run = jnp.sum(jax.vmap(stage_cost)(ys[:-1], us, goals[:-1]))
        return ys, cost_run + term_cost(ys[-1], goals[-1]), (ws, mus, oks)

    def linearize(params, ys, us, ws, mus):
        """IFT Jacobians at every knot, vmapped — one Jacobian assembly +
        LU per knot, zero extra contact solves (gradients.py
        make_rollout_linearize_minimal)."""

        def ab(y, u, w, mu):
            A, B = linearize_full(params, y, expand(u), w, mu)
            return A, shrink_B(B)

        if config.linearize_chunk and config.linearize_chunk < H:
            return jax.lax.map(
                lambda t: ab(*t), (ys[:-1], us, ws, mus),
                batch_size=config.linearize_chunk,
            )
        return jax.vmap(ab)(ys[:-1], us, ws, mus)

    def backward(As, Bs, ys, us, reg, goals):
        dys = ys[:-1] - goals[:-1]
        lys = 2.0 * dys @ Qm  # (H, ny)
        lus = 2.0 * us @ Rm

        VH = 2.0 * Qfm
        vH = 2.0 * Qfm @ (ys[-1] - goals[-1])

        if config.parallel_riccati:
            from .parallel_lqr import lqr_backward_parallel

            Qs = jnp.broadcast_to(2.0 * Qm, (H, ny, ny))
            Rs = jnp.broadcast_to(2.0 * Rm, (H, nu, nu))
            ks, Ks, _, _ = lqr_backward_parallel(
                As, Bs, Qs, Rs, lys, lus, VH, vH, reg=reg
            )
            return ks, Ks, jnp.asarray(0.0, ys.dtype)

        def bstep(carry, inp):
            V, v = carry
            A, B, ly, lu = inp
            Qx = ly + A.T @ v
            Qu = lu + B.T @ v
            Qxx = 2.0 * Qm + A.T @ V @ A
            Quu = 2.0 * Rm + B.T @ V @ B + reg * jnp.eye(nu)
            Qux = B.T @ V @ A
            L = jnp.linalg.cholesky(Quu + 1e-12 * jnp.eye(nu))
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            K = -jax.scipy.linalg.cho_solve((L, True), Qux)
            V2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            v2 = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            dV = k @ Qu + 0.5 * k @ Quu @ k
            return (V2, v2), (k, K, dV)

        (_, _), (ks, Ks, dVs) = jax.lax.scan(
            bstep, (VH, vH), (As, Bs, lys, lus), reverse=True
        )
        return ks, Ks, jnp.sum(dVs)

    def forward(params, ys, us, ks, Ks, alpha, goals, w_seed):
        def body(carry, inp):
            y, w_prev = carry
            y_ref, u_ref, k, K = inp
            u = u_ref + alpha * k + K @ (y - y_ref)
            y2, w, mu, ok = step_w(params, y, u, w_prev=w_prev)
            return (y2, w), (y2, u, w, mu, ok)

        (_, _), (ys2, us2, ws, mus, oks) = jax.lax.scan(
            body, (ys[0], w_seed), (ys[:-1], us, ks, Ks)
        )
        ys2 = jnp.concatenate([ys[:1], ys2], axis=0)
        c = jnp.sum(
            jax.vmap(stage_cost)(ys2[:-1], us2, goals[:-1])
        ) + term_cost(ys2[-1], goals[-1])
        return ys2, us2, c, (ws, mus, oks)

    return _Parts(
        step_w=step_w, w_seed=w_seed_full, rollout=rollout,
        linearize=linearize, backward=backward, forward=forward,
        stage_cost=stage_cost, term_cost=term_cost,
        default_goals=default_goals, nu=nu, ny=ny,
    )


def make_ilqr(topo: Topology, cost: QuadCost, horizon: int,
              config: ILQRConfig = ILQRConfig(),
              opts: SolverOptions = SolverOptions(rtol=1e-6, btol=1e-4, max_iter=20),
              act_idx=None, linsolve: str = "auto"):
    """Build ilqr(params, y0, us_init) → (us, ys, total_cost).

    Jittable; vmap over (y0, us_init) for scenario batches.

    act_idx: optional index list into the packed input vector selecting the
    actuated coordinates (reference input_map, e.g. quadruped_waypoint.jl:55
    pads 6 zeros for the unactuated trunk).  The iLQR control dimension
    becomes len(act_idx).
    """
    p = _make_parts(topo, cost, horizon, config, opts, act_idx, linsolve)
    rollout, linearize, backward, forward = (
        p.rollout, p.linearize, p.backward, p.forward
    )
    default_goals, w_seed_full = p.default_goals, p.w_seed
    alphas = jnp.asarray(config.alphas)

    def ilqr(params: Params, y0, us_init, goals=None):
        goals = default_goals if goals is None else goals
        wseed = w_seed_full(params, y0)
        ys0, c0, (ws0, mus0, ok0) = rollout(params, y0, us_init, goals, wseed)

        def iteration(carry, _):
            ys, us, c, reg, ws, mus, okf = carry
            As, Bs = linearize(params, ys, us, ws, mus)
            ks, Ks, dV = backward(As, Bs, ys, us, reg, goals)

            cand = jax.vmap(
                lambda a: forward(params, ys, us, ks, Ks, a, goals, wseed)
            )(alphas)
            ys_c, us_c, cs, (ws_c, mus_c, oks_c) = cand
            best = jnp.argmin(cs)
            improved = cs[best] < c
            pick = lambda new, old: jnp.where(improved, new[best], old)
            ys2, us2, c2 = pick(ys_c, ys), pick(us_c, us), pick(cs, c)
            ws2, mus2 = pick(ws_c, ws), pick(mus_c, mus)
            okf2 = pick(jnp.mean(oks_c.astype(ys.dtype), axis=1), okf)
            reg2 = jnp.where(
                improved,
                jnp.maximum(reg / config.reg_factor, 1e-9),
                jnp.minimum(reg * config.reg_factor, 1e4),
            )
            return (ys2, us2, c2, reg2, ws2, mus2, okf2), c2

        okf0 = jnp.mean(ok0.astype(ys0.dtype))
        (ys, us, c, _, _, _, okf), _ = jax.lax.scan(
            iteration,
            (ys0, us_init, c0, jnp.asarray(config.reg_init, ys0.dtype),
             ws0, mus0, okf0),
            None, length=config.iterations,
        )
        return us, ys, c, okf

    return ilqr


def make_mpc_controller(topo: Topology, cost: QuadCost, horizon: int,
                        config: ILQRConfig = ILQRConfig(iterations=3),
                        opts: SolverOptions = SolverOptions(rtol=1e-6, btol=1e-4, max_iter=20),
                        act_idx=None, linsolve: str = "auto"):
    """Receding-horizon controller: warm-started iLQR resolve each step.

    Returns mpc(params, y, us_warm) → (u0, us_next) — jittable, vmappable
    across scenario batches (the solves/s/chip benchmark unit).
    """
    ilqr = make_ilqr(topo, cost, horizon, config, opts, act_idx=act_idx,
                     linsolve=linsolve)

    def mpc(params, y, us_warm, goals=None):
        us, ys, c, okf = ilqr(params, y, us_warm, goals)
        us_next = jnp.concatenate([us[1:], us[-1:]], axis=0)
        return us[0], us_next, c, okf

    return mpc


class _RTCore(NamedTuple):
    """Shared runtime-gains iLQR machinery (make_ilqr_rt / make_rti_rt)."""

    p: _Parts
    cost_rt: object
    backward_rt: object
    forward_rt: object
    sanitize: object
    ny: int
    nu: int


def _make_rt_core(topo: Topology, horizon: int, opts: SolverOptions,
                  act_idx, linsolve: str) -> _RTCore:
    ny = topo.minimal_dim
    n_packed = topo.input_dim
    nu = n_packed if act_idx is None else len(np.asarray(act_idx))
    dummy = QuadCost(
        Q=jnp.ones(ny), R=jnp.ones(nu), Qf=jnp.ones(ny),
        y_goal=jnp.zeros(ny),
    )
    p = _make_parts(topo, dummy, horizon, ILQRConfig(alphas=(1.0,)), opts,
                    act_idx, linsolve)
    H = horizon

    def cost_rt(ys, us, goals, Qd, Rd, Qfd):
        # Qd: (ny,) constant or (H+1, ny) per-knot schedule (the contact-
        # scheduled gait reference — swing-phase joints tracked hard,
        # stance-phase joints released; mpc/trot.trot_weight_schedule)
        Qk = jnp.broadcast_to(Qd, (H + 1, ny))
        dy = ys[:-1] - goals[:-1]
        cf = ys[-1] - goals[-1]
        return (
            jnp.sum(dy * dy * Qk[:-1])
            + jnp.sum(us * us * Rd[None])
            + jnp.sum(cf * cf * Qfd)
        )

    def backward_rt(As, Bs, ys, us, goals, Qd, Rd, Qfd, reg):
        Qk = jnp.broadcast_to(Qd, (H + 1, ny))
        lys = 2.0 * (ys[:-1] - goals[:-1]) * Qk[:-1]
        lus = 2.0 * us * Rd[None]
        VH = jnp.diag(2.0 * Qfd)
        vH = 2.0 * Qfd * (ys[-1] - goals[-1])
        eye_u = jnp.eye(nu, dtype=ys.dtype)

        def bstep(carry, inp):
            V, v = carry
            A, B, ly, lu, Qrow = inp
            Qx = ly + A.T @ v
            Qu = lu + B.T @ v
            Qxx = jnp.diag(2.0 * Qrow) + A.T @ V @ A
            Quu = jnp.diag(2.0 * Rd) + B.T @ V @ B + reg * eye_u
            Qux = B.T @ V @ A
            L = jnp.linalg.cholesky(Quu + 1e-8 * eye_u)
            k = -jax.scipy.linalg.cho_solve((L, True), Qu)
            Km = -jax.scipy.linalg.cho_solve((L, True), Qux)
            V2 = Qxx + Km.T @ Quu @ Km + Km.T @ Qux + Qux.T @ Km
            v2 = Qx + Km.T @ Quu @ k + Km.T @ Qu + Qux.T @ k
            return (V2, v2), (k, Km)

        (_, _), (ks, Ks) = jax.lax.scan(
            bstep, (VH, vH), (As, Bs, lys, lus, Qk[:-1]), reverse=True
        )
        return ks, Ks

    def forward_rt(params, ys, us, ks, Ks, alpha, wseed, du_max):
        def body(carry, inp):
            y, w_prev = carry
            y_ref, u_ref, k, Km = inp
            du = alpha * k + Km @ (y - y_ref)
            du = jnp.clip(du, -du_max, du_max)
            u = u_ref + du
            y2, w, mu, ok = p.step_w(params, y, u, w_prev=w_prev)
            return (y2, w), (y2, u, w, mu, ok)

        (_, _), (ys2, us2, ws, mus, oks) = jax.lax.scan(
            body, (ys[0], wseed), (ys[:-1], us, ks, Ks)
        )
        return jnp.concatenate([ys[:1], ys2], 0), us2, ws, mus, oks

    def sanitize(As, Bs):
        """Degrade non-finite knots to (A=I, B=0): the float32 graph-LDU
        linearization has no rescue pass, and one hard-impact NaN knot
        otherwise poisons the whole Riccati recursion (r4 tuning:
        cbest=inf at every control step)."""
        fin = jnp.all(jnp.isfinite(As), axis=(1, 2)) & jnp.all(
            jnp.isfinite(Bs), axis=(1, 2)
        )
        eye_y = jnp.eye(ny, dtype=As.dtype)
        As = jnp.where(fin[:, None, None], As, eye_y[None])
        Bs = jnp.where(fin[:, None, None], Bs, 0.0)
        return As, Bs

    return _RTCore(p=p, cost_rt=cost_rt, backward_rt=backward_rt,
                   forward_rt=forward_rt, sanitize=sanitize, ny=ny, nu=nu)


def make_ilqr_rt(topo: Topology, horizon: int,
                 opts: SolverOptions = SolverOptions(
                     rtol=1e-4, btol=1e-3, max_iter=16),
                 act_idx=None, alphas=(1.0, 0.5, 0.25, 0.1),
                 iterations: int = 1, linsolve: str = "auto"):
    """iLQR with the tuning surface as RUNTIME data.

    make_ilqr bakes the cost matrices, Riccati regularization, and line
    search into the compiled graph — every tuning change invalidates a
    20-40 min relay compile.  Here the per-call signature is

        ilqr_rt(params, y0, us_init, goals, Qd, Rd, Qfd, reg, du_max)
            → (us, ys, cost, okf)

    with Qd/Qfd (ny,) — or Qd (H+1, ny) for per-knot schedules — and Rd
    (nu,) diagonal cost weights, `reg` the Quu Levenberg shift, and
    `du_max` an elementwise trust-region clamp on the control update — all
    traced arguments, so cost shaping, damping, and clamping sweep at zero
    recompiles (scripts/tune_trot.py drives this).  Joint springs/dampers
    tune through `params` the same way.
    """
    core = _make_rt_core(topo, horizon, opts, act_idx, linsolve)
    p = core.p
    ny = core.ny
    cost_rt, backward_rt, forward_rt = (
        core.cost_rt, core.backward_rt, core.forward_rt
    )
    alphas_c = tuple(float(a) for a in alphas)

    def ilqr_rt(params: Params, y0, us_init, goals, Qd, Rd, Qfd, reg,
                du_max):
        wseed = p.w_seed(params, y0)
        ys0, _, (ws0, mus0, ok0) = p.rollout(
            params, y0, us_init, goals, wseed
        )
        c0 = cost_rt(ys0, us_init, goals, Qd, Rd, Qfd)
        okf0 = jnp.mean(ok0.astype(y0.dtype))
        alphas_arr = jnp.asarray(alphas_c, y0.dtype)

        def iteration(carry, _):
            ys, us, c, ws, mus, okf = carry
            As, Bs = core.sanitize(*p.linearize(params, ys, us, ws, mus))
            ks, Ks = backward_rt(As, Bs, ys, us, goals, Qd, Rd, Qfd, reg)
            ks = jnp.where(jnp.isfinite(ks), ks, 0.0)
            Ks = jnp.where(jnp.isfinite(Ks), Ks, 0.0)
            ys_c, us_c, ws_c, mus_c, oks_c = jax.vmap(
                lambda a: forward_rt(params, ys, us, ks, Ks, a, wseed,
                                     du_max)
            )(alphas_arr)
            cs = jax.vmap(
                lambda yy, uu: cost_rt(yy, uu, goals, Qd, Rd, Qfd)
            )(ys_c, us_c)
            cs = jnp.where(jnp.isnan(cs), jnp.inf, cs)
            best = jnp.argmin(cs)
            improved = cs[best] < c
            pick = lambda new, old: jnp.where(improved, new[best], old)
            ys2, us2, c2 = pick(ys_c, ys), pick(us_c, us), pick(cs, c)
            ws2, mus2 = pick(ws_c, ws), pick(mus_c, mus)
            okf2 = pick(jnp.mean(oks_c.astype(ys.dtype), axis=1), okf)
            return (ys2, us2, c2, ws2, mus2, okf2), c2

        (ys, us, c, _, _, okf), _ = jax.lax.scan(
            iteration, (ys0, us_init, c0, ws0, mus0, okf0), None,
            length=iterations,
        )
        return us, ys, c, okf

    return ilqr_rt


def make_mpc_rt(topo: Topology, horizon: int,
                opts: SolverOptions = SolverOptions(
                    rtol=1e-4, btol=1e-3, max_iter=16),
                act_idx=None, alphas=(1.0, 0.5, 0.25, 0.1),
                iterations: int = 1, linsolve: str = "auto"):
    """Receding-horizon wrapper over make_ilqr_rt: warm-shifted re-solve
    per control step, the tuning surface as runtime data.

    mpc(params, y, us_warm, goals, Qd, Rd, Qfd, reg, du_max)
        → (u0, us_next, cost, okf)
    """
    ilqr_rt = make_ilqr_rt(topo, horizon, opts, act_idx, alphas,
                           iterations, linsolve)

    def mpc(params, y, us_warm, goals, Qd, Rd, Qfd, reg, du_max):
        us, ys, c, okf = ilqr_rt(params, y, us_warm, goals, Qd, Rd, Qfd,
                                 reg, du_max)
        us_next = jnp.concatenate([us[1:], us[-1:]], axis=0)
        return us[0], us_next, c, okf

    return mpc


def make_rti_rt(topo: Topology, horizon: int,
                opts: SolverOptions = SolverOptions(
                    rtol=1e-4, btol=1e-3, max_iter=16),
                act_idx=None, alphas=(1.0, 0.5, 0.25),
                iterations: int = 1, linsolve: str = "auto"):
    """Carried-trajectory receding-horizon MPC with runtime-data gains and
    an α line search — the latency-optimal controller shape.

    make_mpc_rt re-ROLLS the shifted warm control sequence every control
    step before it can linearize: H sequential contact solves of pure
    overhead per solve (the r4 north-star ran 81 sequential solves; p50
    6.5 s vs the 50 ms budget).  Here the linearization point is the
    PREVIOUS control step's accepted forward pass, shifted one knot — each
    stored (y, u, w, μ) knot is a consistent solver solution, so the IFT
    linearization is exact and costs ZERO new contact solves.  Per control
    step: iterations × (linearize + Riccati + α-vmapped forward) = H
    sequential solves per iteration, half make_mpc_rt's depth at
    iterations=1.  Unlike plain RTI (make_rti_mpc), the forward pass IS
    line-searched (α candidates vmapped, best tracking cost wins) and the
    tuning surface (Qd/Rd/Qfd/reg/du_max) stays runtime data.

    Returns (init, mpc):
      init(params, y0, us_init, goals, Qd, Rd, Qfd, reg, du_max)
          → (RTIState, cost, okf)                     (one cold rollout)
      mpc(params, y, st, goals, Qd, Rd, Qfd, reg, du_max, u_last)
          → (u0, st2, cost, okf)
    u_last: (nu,) control for the newly revealed terminal knot (gait
    feedforward; pass st.us[-1] to reproduce the plain repeat-last shift).
    Both jittable; vmap over (y/y0, st, u_last) for scenario batches.
    """
    core = _make_rt_core(topo, horizon, opts, act_idx, linsolve)
    p = core.p
    alphas_c = tuple(float(a) for a in alphas)

    def init(params: Params, y0, us_init, goals, Qd, Rd, Qfd, reg, du_max):
        wseed = p.w_seed(params, y0)
        ys, _, (ws, mus, oks) = p.rollout(params, y0, us_init, goals, wseed)
        c = core.cost_rt(ys, us_init, goals, Qd, Rd, Qfd)
        okf = jnp.mean(oks.astype(y0.dtype))
        return RTIState(ys=ys, us=us_init, ws=ws, mus=mus), c, okf

    def one_pass(params, y, ys_s, us_s, ws_s, mus_s, goals, Qd, Rd, Qfd,
                 reg, du_max):
        As, Bs = core.sanitize(*p.linearize(params, ys_s, us_s, ws_s, mus_s))
        ks, Ks = core.backward_rt(As, Bs, ys_s, us_s, goals, Qd, Rd, Qfd,
                                  reg)
        ks = jnp.where(jnp.isfinite(ks), ks, 0.0)
        Ks = jnp.where(jnp.isfinite(Ks), Ks, 0.0)
        alphas_arr = jnp.asarray(alphas_c, y.dtype)
        ys_from = jnp.concatenate([y[None], ys_s[1:]], axis=0)
        ys_c, us_c, ws_c, mus_c, oks_c = jax.vmap(
            lambda a: core.forward_rt(params, ys_from, us_s, ks, Ks, a,
                                      ws_s[0], du_max)
        )(alphas_arr)
        cs = jax.vmap(
            lambda yy, uu: core.cost_rt(yy, uu, goals, Qd, Rd, Qfd)
        )(ys_c, us_c)
        cs = jnp.where(jnp.isnan(cs), jnp.inf, cs)
        best = jnp.argmin(cs)
        okf = jnp.mean(oks_c[best].astype(y.dtype))
        return (ys_c[best], us_c[best], ws_c[best], mus_c[best], cs[best],
                okf)

    def mpc(params: Params, y, st: RTIState, goals, Qd, Rd, Qfd, reg,
            du_max, u_last):
        # receding-horizon shift: knot k ← stored knot k+1; the newly
        # revealed terminal knot takes u_last (gait feedforward) with the
        # old terminal solve as its linearization anchor
        ys_s = jnp.concatenate([st.ys[1:], st.ys[-1:]], axis=0)
        us_s = jnp.concatenate([st.us[1:], u_last[None]], axis=0)
        ws_s = jnp.concatenate([st.ws[1:], st.ws[-1:]], axis=0)
        mus_s = jnp.concatenate([st.mus[1:], st.mus[-1:]], axis=0)

        def body(carry, _):
            ys_b, us_b, ws_b, mus_b, _, _ = carry
            return one_pass(
                params, y, ys_b, us_b, ws_b, mus_b, goals, Qd, Rd, Qfd,
                reg, du_max,
            ), None

        zero = jnp.asarray(0.0, y.dtype)
        (ys_b, us_b, ws_b, mus_b, c_b, okf), _ = jax.lax.scan(
            body, (ys_s, us_s, ws_s, mus_s, zero, zero), None,
            length=iterations,
        )
        st2 = RTIState(ys=ys_b, us=us_b, ws=ws_b, mus=mus_b)
        return us_b[0], st2, c_b, okf

    return init, mpc


class RTIState(NamedTuple):
    """Carried trajectory of a real-time-iteration MPC: the last forward
    pass's knot states, controls, and per-knot contact-solver solutions
    (the linearization points for the next control step)."""

    ys: jax.Array  # (H+1, ny)
    us: jax.Array  # (H, nu)
    ws: jax.Array  # (H, dim) solver solutions at each knot
    mus: jax.Array  # (H,) relaxed complementarity targets


def make_rti_mpc(topo: Topology, cost: QuadCost, horizon: int,
                 config: ILQRConfig = ILQRConfig(),
                 opts: SolverOptions = SolverOptions(
                     rtol=1e-4, btol=1e-3, max_iter=12),
                 act_idx=None, linsolve: str = "auto"):
    """Real-time-iteration receding-horizon MPC (Diehl-style RTI).

    Where make_mpc_controller re-rolls the trajectory AND line-searches a
    fresh forward pass every control step (2H+1 sequential contact solves),
    the RTI scheme linearizes at the PREVIOUS control step's forward pass
    (shifted one knot — zero new contact solves) and runs exactly ONE
    forward rollout with the new Riccati gains: H sequential solves per
    control step, half the depth and roughly half the compiled graph.  The
    feedback gains K absorb the one-step staleness of the linearization —
    the standard real-time-iteration argument.

    Returns (init, mpc):
      init(params, y0, us_init, goals) → RTIState     (one cold rollout)
      mpc(params, y, state, goals) → (u0, state2, c, okf)
    Both jittable; vmap over (y0/y, state) for scenario batches.
    """
    p = _make_parts(topo, cost, horizon, config, opts, act_idx, linsolve)
    alpha0 = float(config.alphas[0])

    def init(params: Params, y0, us_init, goals=None):
        goals = p.default_goals if goals is None else goals
        wseed = p.w_seed(params, y0)
        ys, c, (ws, mus, oks) = p.rollout(params, y0, us_init, goals, wseed)
        return RTIState(ys=ys, us=us_init, ws=ws, mus=mus)

    def mpc(params: Params, y, st: RTIState, goals=None):
        goals = p.default_goals if goals is None else goals
        # receding-horizon shift: knot k ← stored knot k+1 (last repeated).
        # Each shifted (y, u, w) triple stays a consistent solver solution,
        # so the IFT linearization is exact at every knot.
        ys_s = jnp.concatenate([st.ys[1:], st.ys[-1:]], axis=0)
        us_s = jnp.concatenate([st.us[1:], st.us[-1:]], axis=0)
        ws_s = jnp.concatenate([st.ws[1:], st.ws[-1:]], axis=0)
        mus_s = jnp.concatenate([st.mus[1:], st.mus[-1:]], axis=0)

        As, Bs = p.linearize(params, ys_s, us_s, ws_s, mus_s)
        # knot sanitization (same degrade as make_ilqr_rt): the float32
        # graph-LDU linearization has no rescue pass and hard-impact knots
        # can emit NaN — one bad knot otherwise poisons the whole Riccati
        # recursion, and THIS controller runs a single forward pass with no
        # line search to catch it.  Broken knot → (A=I, B=0).
        ny = ys_s.shape[-1]
        fin = jnp.all(jnp.isfinite(As), axis=(1, 2)) & jnp.all(
            jnp.isfinite(Bs), axis=(1, 2)
        )
        eye_y = jnp.eye(ny, dtype=ys_s.dtype)
        As = jnp.where(fin[:, None, None], As, eye_y[None])
        Bs = jnp.where(fin[:, None, None], Bs, 0.0)
        reg = jnp.asarray(config.reg_init, y.dtype)
        ks, Ks, _ = p.backward(As, Bs, ys_s, us_s, reg, goals)
        ks = jnp.where(jnp.isfinite(ks), ks, 0.0)
        Ks = jnp.where(jnp.isfinite(Ks), Ks, 0.0)

        def body(carry, inp):
            y_c, w_prev = carry
            y_ref, u_ref, k, K = inp
            u = u_ref + alpha0 * k + K @ (y_c - y_ref)
            y2, w, mu, ok = p.step_w(params, y_c, u, w_prev=w_prev)
            return (y2, w), (y2, u, w, mu, ok)

        (_, _), (ys2, us2, ws2, mus2, oks) = jax.lax.scan(
            body, (y, ws_s[0]), (ys_s[:-1], us_s, ks, Ks)
        )
        ys2 = jnp.concatenate([y[None], ys2], axis=0)
        c = jnp.sum(
            jax.vmap(p.stage_cost)(ys2[:-1], us2, goals[:-1])
        ) + p.term_cost(ys2[-1], goals[-1])
        okf = jnp.mean(oks.astype(y.dtype))
        return us2[0], RTIState(ys=ys2, us=us2, ws=ws2, mus=mus2), c, okf

    return init, mpc
