"""Mehrotra predictor-corrector interior-point solver, jit/vmap-native.

Port of the reference NCP solver semantics (src/solver/mehrotra.jl:9-73,
line_search.jl, centering.jl, correction.jl, initialization.jl,
violations.jl) to a batched fixed-shape formulation:

* one dense Newton system J Δ = −r per iteration, J = jacfwd(residual) +
  REG·I (replacing the graph-sparse LDU of GraphBasedSystems.jl — dense
  KKT of a few hundred dims is MXU-friendly and vmaps across scenarios);
* LU factorization reused for the affine and corrected solves
  (mehrotra.jl:36-49);
* all control flow is lax.while_loop with masked updates — solver failure
  is a status flag, never an exception (the reference's excessive-ω error
  at line_search.jl:18-20 becomes the clamp at :141-152);
* cone bookkeeping (step lengths, centering, correction) runs on static
  index sets extracted from the topology (core.cone_index_sets).

Load-bearing heuristics kept verbatim: τ schedule (mehrotra.jl:51),
centering exponent 3 (:41), btol/undercut floor (:44), no-progress
undercut rescaling (:58-61), angular-velocity clamp 3.9/h².
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import contacts as ct
from .core import (
    CONTACT_WIDTH,
    REG,
    Params,
    SolverOptions,
    Topology,
    cone_index_sets,
    joint_limit_activity,
)
from .residual import StepContext, make_residual


class SolveResult(NamedTuple):
    w: jax.Array  # solution [v25 ω25 | joint impulses | contact impulses]
    success: jax.Array  # bool
    iterations: jax.Array  # int
    rvio: jax.Array
    bvio: jax.Array
    mu: jax.Array  # final complementarity target (gradients are taken here,
    # matching the reference's relaxed-solution gradient semantics)
    rescued: jax.Array = np.False_  # lane finished by the dense rescue pass


def _ort_alpha(lam, dl, act, tau):
    """Positive-orthant max step (line_search.jl:102-113)."""
    bad = (dl < 0) & (act > 0)
    cand = -tau * lam / jnp.where(bad, dl, -1.0)
    return jnp.min(jnp.where(bad, cand, 1e20), initial=1e20)


def _soc_alpha(lam, dl, tau):
    """Second-order-cone max step, CVXOPT §8.2 (line_search.jl:115-139)."""
    eps = 1e-14
    l0, l1 = lam[0], lam[1:]
    ll = jnp.maximum(l0 * l0 - l1 @ l1, 1e-25) + eps
    ld = l0 * dl[0] - l1 @ dl[1:] + eps
    sq = jnp.sqrt(ll)
    rs = ld / ll
    rv = dl[1:] / sq - (ld / sq + dl[0]) / (l0 / sq + 1.0) * l1 / ll
    gap = jnp.linalg.norm(rv) - rs
    return jnp.where(gap > 0.0, jnp.minimum(1.0, tau / gap), 1.0)


def _ort_init(g, s, eps=1e-20):
    """Strictly-feasible orthant shift (initialization.jl:20-34)."""
    ds = jnp.maximum(-1.5 * jnp.min(s), 0.0)
    dg = jnp.maximum(-1.5 * jnp.min(g), 0.0)
    sh, gh = s + ds, g + dg
    dot = sh @ gh
    return gh + 0.5 * dot / (jnp.sum(sh) + eps), sh + 0.5 * dot / (
        jnp.sum(gh) + eps
    )


def _soc_init(g, s, eps=1e-20):
    """Strictly-feasible SOC shift (initialization.jl:36-49)."""
    e = jnp.zeros_like(g).at[0].set(1.0)
    ds = jnp.maximum(-1.5 * (s[0] - jnp.linalg.norm(s[1:])), 0.0)
    dg = jnp.maximum(-1.5 * (g[0] - jnp.linalg.norm(g[1:])), 0.0)
    sh, gh = s + ds * e, g + dg * e
    dot = sh @ gh
    g0 = gh + 0.5 * dot / (sh[0] + jnp.linalg.norm(sh[1:]) + eps) * e
    s0 = sh + 0.5 * dot / (gh[0] + jnp.linalg.norm(gh[1:]) + eps) * e
    return g0, s0


def make_solver(topo: Topology, linsolve: str = "auto"):
    """Build (init_w, solve) closures for a topology.

    linsolve: 'auto' uses the graph-sparse block LDU (graph.py/ldu.py —
    the GraphBasedSystems.jl rebuild) when the mechanism graph is loop-free,
    falling back to a dense LU otherwise; 'dense' forces the dense path.
    """
    res_fn = make_residual(topo)
    cones = cone_index_sets(topo)
    sched = None
    if linsolve == "auto":
        from .graph import build_schedule

        sched = build_schedule(topo)
    if sched is not None:
        from .blocks import make_assembler
        from .ldu import make_ldu

        ldu_extract, ldu_factorize, ldu_solve, ldu_matvec = make_ldu(sched)
        ldu_assemble = make_assembler(topo, sched)
        pallas_cv_cache = {}

        def pallas_ldu_cv(n_ref):
            """custom_vmap-wrapped (factorize, solve+refine) pair: per-lane
            calls use the jnp path; a vmapped call on TPU dispatches the
            whole batch to the Pallas kernels (pallas_ldu.py), which run
            the static elimination schedule in VMEM in one launch per
            phase.  Factorization is shared by the affine and corrected
            solves of each Mehrotra iteration."""
            if n_ref in pallas_cv_cache:
                return pallas_cv_cache[n_ref]
            from jax.custom_batching import custom_vmap

            from . import pallas_ldu as PL

            def _pallas_ok(arr, in_batched):
                import os

                if os.environ.get("DOJO_TPU_NO_PALLAS"):
                    return False
                return (
                    jax.default_backend() not in ("cpu", "gpu")
                    and all(in_batched)
                    and arr.ndim == 4
                )

            cv_fact = custom_vmap(lambda blocks: ldu_factorize(blocks))

            @cv_fact.def_vmap
            def _fact_rule(axis_size, in_batched, blocks):
                if not _pallas_ok(blocks, in_batched):
                    ax = 0 if in_batched[0] else None
                    if ax is None:
                        blocks = jax.tree.map(
                            lambda a: jnp.broadcast_to(
                                a, (axis_size,) + a.shape
                            ),
                            blocks,
                        )
                    return jax.vmap(ldu_factorize)(blocks), (True,) * 3
                fac_b, _ = PL.make_pallas_ldu(sched, refine=n_ref)
                return fac_b(blocks), (True,) * 3

            def _solve1(blocks, fb, lu, ps, rhs):
                x = ldu_solve((fb, lu, ps), rhs)
                for _ in range(n_ref):
                    x = x + ldu_solve(
                        (fb, lu, ps), rhs - ldu_matvec(blocks, x)
                    )
                return x

            cv_solve = custom_vmap(_solve1)

            @cv_solve.def_vmap
            def _solve_rule(axis_size, in_batched, blocks, fb, lu, ps, rhs):
                if not _pallas_ok(blocks, in_batched):
                    axes = tuple(0 if b else None for b in in_batched)
                    return (
                        jax.vmap(_solve1, in_axes=axes)(
                            blocks, fb, lu, ps, rhs
                        ),
                        True,
                    )
                _, sol_b = PL.make_pallas_ldu(sched, refine=n_ref)
                rhs_nod = PL.flat_to_nodes(sched, rhs)
                x_nod = sol_b(blocks, (fb, lu, ps), rhs_nod)
                return PL.nodes_to_flat(sched, x_nod, D), True

            pallas_cv_cache[n_ref] = (cv_fact, cv_solve)
            return pallas_cv_cache[n_ref]
    D = topo.dim
    nb, nj, nc, ML = topo.nb, topo.nj, topo.nc, topo.maxlim
    SW, JW, CW = topo.sw, topo.jw, topo.cw
    ort_s, ort_g = cones["ort_s"], cones["ort_g"]
    soc_s, soc_g = cones["soc_s"], cones["soc_g"]
    n_ort, n_soc = len(ort_s), len(soc_s)
    n_joint_ort = cones["n_joint_ort"]

    # static rvio row weights: body rows + contact constraint rows; joint e1
    # rows weighted at runtime by λ-activity (violations.jl:1-36)
    rv_static = np.zeros(D)
    rv_static[: 6 * nb] = 1.0
    for c in range(nc):
        o = topo.contact_off + c * CW
        rv_static[o + CW // 2 : o + CW] = 1.0
    # index of each joint λ row in r (e1 rows)
    lam_rows = []
    for j in range(nj):
        base = topo.joint_off + j * JW
        for sub in range(2):
            o = base + sub * SW + 4 * ML
            lam_rows.extend([o, o + 1, o + 2])
    lam_rows = np.asarray(lam_rows, dtype=np.int32)
    rv_static = jnp.asarray(rv_static)

    # body ω slot indices for the velocity clamp
    w_slots = np.arange(nb)[:, None] * 6 + np.arange(3, 6)[None, :]

    def rvio_weights(params: Params):
        wgt = rv_static.astype(params.mass.dtype)
        if nj:
            lam_act = jnp.stack(
                [params.tra_lam_mask, params.rot_lam_mask], axis=1
            ).reshape(-1)
            wgt = wgt.at[lam_rows].set(lam_act)
        return wgt

    def ort_activity(params: Params):
        acts = []
        if n_joint_ort:
            acts.append(joint_limit_activity(topo, params))
        if n_ort - n_joint_ort:
            acts.append(jnp.ones(n_ort - n_joint_ort, dtype=params.mass.dtype))
        if not acts:
            return jnp.zeros((0,), dtype=params.mass.dtype)
        return jnp.concatenate(acts)

    def violations(w, ctx, params, rvw, oact):
        """(rvio, bvio) at w (violations.jl; μ-independent)."""
        r0 = res_fn(w, ctx, params, 0.0)
        rvio = jnp.max(jnp.abs(r0) * rvw, initial=0.0)
        bvio = 0.0
        if n_ort:
            bvio = jnp.max(jnp.abs(w[ort_s] * w[ort_g]) * oact, initial=0.0)
        if n_soc:
            cp = jax.vmap(ct.cone_product)(w[soc_g], w[soc_s])
            bvio = jnp.maximum(bvio, jnp.max(jnp.abs(cp)))
        return rvio, bvio

    def cone_line_search(w, dw, tort, tsoc, oact):
        alpha = jnp.asarray(1.0, dtype=w.dtype)
        if n_ort:
            alpha = jnp.minimum(alpha, _ort_alpha(w[ort_s], dw[ort_s], oact, tort))
            alpha = jnp.minimum(alpha, _ort_alpha(w[ort_g], dw[ort_g], oact, tort))
        if n_soc:
            a_s = jax.vmap(_soc_alpha, in_axes=(0, 0, None))(w[soc_s], dw[soc_s], tsoc)
            a_g = jax.vmap(_soc_alpha, in_axes=(0, 0, None))(w[soc_g], dw[soc_g], tsoc)
            alpha = jnp.minimum(alpha, jnp.minimum(jnp.min(a_s), jnp.min(a_g)))
        return jnp.minimum(alpha, 1.0)

    def centering(w, dw, aaff, oact):
        """Aggregate duality measure ν, νaff, cone degree (centering.jl)."""
        nu = 0.0
        nuaff = 0.0
        degree = 0.0
        if n_ort:
            s, g = w[ort_s], w[ort_g]
            ds, dg = dw[ort_s], dw[ort_g]
            nu += jnp.sum(oact * s * g)
            nuaff += jnp.sum(oact * (s + aaff * ds) * (g + aaff * dg))
            degree += jnp.sum(oact)
        if n_soc:
            s, g = w[soc_s], w[soc_g]
            ds, dg = dw[soc_s], dw[soc_g]
            nu += jnp.sum(s * g)
            nuaff += jnp.sum((s + aaff * ds) * (g + aaff * dg))
            degree += n_soc
        degree = jnp.maximum(degree, 1.0)
        return nu / degree, nuaff / degree

    def correction(dw, mu, oact):
        """Second-order correction added to the (−r) RHS (correction.jl)."""
        corr = jnp.zeros(D, dtype=dw.dtype)
        if n_ort:
            corr = corr.at[ort_s].set(oact * (-dw[ort_s] * dw[ort_g] + mu))
        if n_soc:
            cp = jax.vmap(ct.cone_product)(dw[soc_s], dw[soc_g])
            mu_e = jnp.zeros(3, dtype=dw.dtype).at[0].set(mu)
            corr = corr.at[soc_s].set(-cp + mu_e)
        return corr

    def clamp_omega(w, wmax):
        """ω-norm clamp (line_search.jl:141-152; factor ωmax/ω² as in ref)."""
        if nb == 0:
            return w
        om = w[w_slots.reshape(-1)].reshape(nb, 3)
        wd = jnp.sum(om * om, axis=-1, keepdims=True)
        factor = jnp.where(wd > wmax, wmax / wd, 1.0)
        return w.at[w_slots.reshape(-1)].set((om * factor).reshape(-1))

    def backtrack(w_acc, dw, alpha, rvio, bvio, ctx, params, rvw, oact, opts, wmax):
        """Scale-halving line search (line_search.jl:1-34)."""

        def make_cand(scale):
            wc = w_acc + alpha / (2.0**scale) * dw
            return clamp_omega(wc, wmax)

        def cond(carry):
            scale, accepted, _, _, _ = carry
            return (~accepted) & (scale < opts.max_ls)

        def accept(rv, bv):
            # NaN-safe: a candidate with NaN violations must read as "worse"
            # (plain `rv > rvio` is False for NaN and would accept it)
            return (rv <= rvio) | (bv <= bvio)

        def body(carry):
            scale, _, _, _, _ = carry
            wc = make_cand(scale)
            rv, bv = violations(wc, ctx, params, rvw, oact)
            return (scale + 1, accept(rv, bv), wc, rv, bv)

        w0 = make_cand(0.0)
        rv0, bv0 = violations(w0, ctx, params, rvw, oact)
        out = jax.lax.while_loop(cond, body, (1.0, accept(rv0, bv0), w0, rv0, bv0))
        scale, ok, wc, rv, bv = out
        # non-finite final candidate (diverged solve): keep the incumbent
        keep = jnp.isfinite(rv) & jnp.isfinite(bv)
        wc = jnp.where(keep, wc, w_acc)
        rv = jnp.where(keep, rv, rvio)
        bv = jnp.where(keep, bv, bvio)
        return wc, rv, bv

    def _neutral_contact_blocks(dtype):
        """(nc, CW) strictly-feasible neutral contact blocks (the cold-init
        values): [s0, pad, g0, pad] per contact."""
        blocks = []
        for c in range(nc):
            kind = topo.contact_kind[c]
            nh = CW // 2
            neutral = ct.neutral_vector(kind, CONTACT_WIDTH[kind] // 2, dtype)
            if kind == "nonlinear":
                g_o, s_o = _ort_init(neutral[:1], neutral[:1])
                g_s, s_s = _soc_init(neutral[1:4], neutral[1:4])
                s0 = jnp.concatenate([s_o, s_s])
                g0 = jnp.concatenate([g_o, g_s])
            else:
                g0, s0 = _ort_init(neutral, neutral)
            pad = (
                jnp.ones(nh - len(neutral), dtype)
                if nh > len(neutral)
                else jnp.zeros(0, dtype)
            )
            blocks.append(jnp.concatenate([s0, pad, g0, pad]))
        return jnp.stack(blocks) if nc else jnp.zeros((0, CW), dtype)

    def init_w(state_v, state_w, params: Params, w_prev=None, warm_floor=1e-2,
               contact_reset=None):
        """Initial point (set_velocity_solution!, reset!, initialize! —
        mehrotra.jl:10-20).

        w_prev=None reproduces the reference semantics: velocities warm-
        started from the state, cone variables reset to the strictly-
        feasible neutral point.  With w_prev (the previous step's solution)
        the joint multipliers and cone pairs carry over, re-centered into
        the cone interior by an elementwise floor — steady-state contact
        then converges in roughly half the Newton iterations (BASELINE.md
        perf lever 3).

        contact_reset: optional (nc,) bool/float mask — contacts flagged 1
        have their cone block replaced by the neutral init (impact-onset
        re-centering, simulate.make_step computes the mask from the signed
        distances + carried impulses; see SolverOptions.warm_onset_margin).
        Traced data: warm/onset/cold all share one compiled graph."""
        dtype = state_v.dtype
        if w_prev is not None:
            w = w_prev.astype(dtype)
            vel = jnp.concatenate([state_v, state_w], axis=-1).reshape(-1)
            w = w.at[: 6 * nb].set(vel)
            fl = jnp.asarray(warm_floor, dtype)
            if n_ort:
                w = w.at[ort_s].set(jnp.maximum(w[ort_s], fl))
                w = w.at[ort_g].set(jnp.maximum(w[ort_g], fl))
            if n_soc:
                for idx in (soc_s, soc_g):
                    blk = w[idx]  # (n_soc, 3)
                    t0 = jnp.maximum(
                        blk[:, 0],
                        jnp.linalg.norm(blk[:, 1:], axis=-1) + fl,
                    )
                    w = w.at[idx].set(
                        jnp.concatenate([t0[:, None], blk[:, 1:]], axis=-1)
                    )
            if contact_reset is not None and nc:
                neutral = _neutral_contact_blocks(dtype)  # (nc, CW)
                cur = w[topo.contact_off :].reshape(nc, CW)
                mask = contact_reset.astype(dtype)[:, None]
                cur = mask * neutral + (1.0 - mask) * cur
                w = w.at[topo.contact_off :].set(cur.reshape(-1))
                if nj:
                    # a transient step also resets the carried JOINT
                    # impulses: the reset init is then byte-identical to a
                    # cold start, which converges where the warm point
                    # fails (measured: contact-only reset still fired the
                    # 700 ms dense rescue at the quadruped impact steps —
                    # the stale joint multipliers alone poison the f32 LDU)
                    transient = jnp.max(contact_reset.astype(dtype))
                    sub = jnp.concatenate(
                        [jnp.ones(4 * ML, dtype), jnp.zeros(3, dtype)]
                    )
                    joint_neutral = jnp.tile(sub, 2 * nj)
                    jsl = slice(topo.joint_off, topo.contact_off)
                    w = w.at[jsl].set(
                        transient * joint_neutral
                        + (1.0 - transient) * w[jsl]
                    )
            return w
        parts = [jnp.concatenate([state_v, state_w], axis=-1).reshape(-1)]
        if nj:
            sub = jnp.concatenate(
                [jnp.ones(4 * ML, dtype), jnp.zeros(3, dtype)]
            )
            parts.append(jnp.tile(sub, 2 * nj))
        if nc:
            # per-kind neutral blocks, pad slots (mixed-kind mechanisms)
            # anchored at 1 — see _neutral_contact_blocks
            parts.append(_neutral_contact_blocks(dtype).reshape(-1))
        return jnp.concatenate(parts)

    def solve(w0, ctx: StepContext, params: Params, opts: SolverOptions):
        # TPU float32 matmuls default to bfloat16 MXU passes — fatal for the
        # Newton pipeline (Jacobian assembly + KKT solve).  Force true-f32.
        with jax.default_matmul_precision("highest"):
            return _solve(w0, ctx, params, opts)

    def _solve(w0, ctx: StepContext, params: Params, opts: SolverOptions):
        rvw = rvio_weights(params)
        oact = ort_activity(params)
        rvio0, bvio0 = violations(w0, ctx, params, rvw, oact)
        done0 = (rvio0 < opts.rtol) & (bvio0 < opts.btol)

        def run(body, init_done, w_i, rv_i, bv_i):
            def cond(st):
                (w, rvio, bvio, mu_asm, ucut, noprog, it, done) = st
                return (~done) & (it < opts.max_iter)

            init = (
                w_i,
                rv_i,
                bv_i,
                jnp.asarray(0.0, w0.dtype),
                jnp.asarray(opts.undercut, w0.dtype),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0, jnp.int32),
                init_done,
            )
            w, rvio, bvio, mu_f, _, _, it, done = jax.lax.while_loop(
                cond, body, init
            )
            # success from the violation test, not the raw loop flag — the
            # float32 LDU phase also sets `done` to halt on a detected
            # factorization stall, and those lanes must read as failed so
            # the dense rescue picks them up
            success = (rvio < opts.rtol) & (bvio < opts.btol)
            return SolveResult(
                w=w, success=success, iterations=it, rvio=rvio, bvio=bvio,
                mu=mu_f, rescued=jnp.zeros_like(success),
            )

        body, violations_at = make_iteration(ctx, params, opts)
        res = run(body, done0, w0, rvio0, bvio0)
        # float32 LDU rescue pass: near convergence the unpivoted block
        # elimination breaks down once μ hits its floor on impact steps
        # (fresh contact activation → extreme γ/s stiffness absorbed into
        # light bodies; measured refinement contraction ≥ 1e3 there, so no
        # refinement count saves it).  Finish just the failed lanes with the
        # dense pivoted LU, warm-started from the LDU endpoint when it made
        # progress — under vmap the second while_loop executes zero
        # iterations when every lane succeeded, so the common path stays at
        # graph-LDU cost.
        if (
            sched is not None
            and w0.dtype == jnp.float32
            and not opts.ldu_f64
            and opts.rescue
        ):
            # restart from the cone-NEUTRAL init, not w0 and not the
            # stalled endpoint: a stalled IP iterate sits near the cone
            # boundary with poor centrality and poisons the dense re-solve
            # (measured: warm-started rescue fails steps the cold dense
            # solve handles in 9 iterations) — and when w0 itself is a
            # warm start (w_prev from the previous step), a fresh-impact
            # step makes w0 just as poisonous: on TPU the warm chain
            # failed ALL lanes at the first hard-impact state while the
            # cold solve of the same state took 14 iterations (r4 probe).
            # Keeping w0's velocities, the cone/impulse tail is rebuilt at
            # the strictly-feasible neutral point; for cold solves this
            # reproduces w0 exactly, so their semantics are unchanged.
            vel = w0[: 6 * nb].reshape(nb, 6)
            w_cold = init_w(vel[:, :3], vel[:, 3:], params)
            rv_c, bv_c = violations(w_cold, ctx, params, rvw, oact)
            done_c = (rv_c < opts.rtol) & (bv_c < opts.btol)
            body_d, _ = make_iteration(ctx, params, opts, force_dense=True)
            res2 = run(body_d, done_c | res.success, w_cold, rv_c, bv_c)
            pick = lambda a, b: jnp.where(res.success, a, b)
            res = SolveResult(
                w=pick(res.w, res2.w),
                success=res.success | res2.success,
                iterations=res.iterations + res2.iterations,
                rvio=pick(res.rvio, res2.rvio),
                bvio=pick(res.bvio, res2.bvio),
                mu=pick(res.mu, res2.mu),
                rescued=(~res.success) & res2.success,
            )
        return res

    def make_iteration(
        ctx: StepContext,
        params: Params,
        opts: SolverOptions,
        force_dense: bool = False,
    ):
        """One Mehrotra iteration as a state-tuple map (shared by the
        while_loop in solve() and by debug/tracing harnesses)."""
        rvw = rvio_weights(params)
        oact = ort_activity(params)
        h = params.timestep
        wmax = 3.9 / h**2
        jac = jax.jacfwd(res_fn)
        eye = jnp.eye(D)

        def body(st):
            (w, rvio, bvio, mu_asm, ucut, noprog, it, _) = st
            r = res_fn(w, ctx, params, mu_asm)
            # trace-time path selection: the graph LDU (the reference's
            # GraphBasedSystems.jl elimination) whenever the graph is
            # loop-free.  At float64 the block elimination is exact.  At
            # float32 the unpivoted inter-block Schur chain loses digits, so
            # each solve gets `opts.refine` iterative-refinement sweeps
            # (residual via the exact block matvec) — measured to match the
            # dense pivoted f32 LU at 6.7× lower cost on the quadruped KKT.
            use_ldu = sched is not None and not force_dense
            if use_ldu:
                blocks0 = ldu_assemble(w, ctx, params, mu_asm)
                wdtype = w.dtype
                f64 = wdtype == jnp.float32 and opts.ldu_f64
                fdtype = jnp.float64 if f64 else wdtype
                fblocks = blocks0.astype(fdtype)
                n_ref = opts.refine if fdtype == jnp.float32 else 0
                cv_fact, cv_solve = pallas_ldu_cv(n_ref)
                fact = cv_fact(fblocks)

                def lin_solve(rhs):
                    x = cv_solve(
                        fblocks, fact[0], fact[1], fact[2],
                        rhs.astype(fdtype),
                    )
                    return x.astype(wdtype)
            else:
                J = jac(w, ctx, params, mu_asm) + REG * eye.astype(w.dtype)
                lu, piv = jax.scipy.linalg.lu_factor(J)
                lin_solve = lambda rhs: jax.scipy.linalg.lu_solve((lu, piv), rhs)
            daff = lin_solve(-r)
            aaff = cone_line_search(w, daff, 0.95, 0.95, oact)
            nu, nuaff = centering(w, daff, aaff, oact)
            sigma = jnp.clip(nuaff / (nu + 1e-20), 0.0, 1.0) ** 3
            mu_t = jnp.maximum(sigma * nu, opts.btol / ucut)
            rhs = -r + correction(daff, mu_t, oact)
            d = lin_solve(rhs)
            tau = jnp.maximum(0.95, 1.0 - jnp.maximum(rvio, bvio) ** 2)
            alpha = cone_line_search(w, d, tau, jnp.minimum(tau, 0.95), oact)
            w2, rv2, bv2 = backtrack(
                w, d, alpha, rvio, bvio, ctx, params, rvw, oact, opts, wmax
            )
            progress = (~(rv2 < opts.rtol) & (rv2 < 0.8 * rvio)) | (
                ~(bv2 < opts.btol) & (bv2 < 0.8 * bvio)
            )
            noprog2 = jnp.where(progress, jnp.maximum(noprog - 1, 0), noprog + 1)
            ucut2 = jnp.where(
                noprog2 >= opts.no_progress_max,
                ucut * opts.no_progress_undercut,
                ucut,
            )
            done = (rv2 < opts.rtol) & (bv2 < opts.btol)
            if use_ldu and w.dtype == jnp.float32 and not opts.ldu_f64:
                # early stall exit (float32 LDU phase only): once the
                # no-progress undercut has escalated twice the factorization
                # has broken down (measured divergent refinement) — stop
                # burning iterations and let the dense rescue finish the
                # lane.  Encoded as done with failing violations: run()
                # reports success from the violation test, and the rescue
                # pass re-solves any lane whose violations exceed tolerance.
                stalled = ucut2 > opts.undercut * opts.no_progress_undercut * 1.5
                done = done | stalled
            return (w2, rv2, bv2, mu_t, ucut2, noprog2, it + 1, done)

        def violations_at(w):
            return violations(w, ctx, params, rvw, oact)

        return body, violations_at

    def solve_traced(w0, ctx: StepContext, params: Params, opts: SolverOptions):
        """Observability variant of solve(): fixed max_iter lax.scan
        recording per-iteration solver statistics — the structured analog of
        the reference's `verbose` trace table (mehrotra.jl:75-98, columns
        n/rvio/bvio/μ).  Returns (SolveResult, trace dict of (max_iter,)
        arrays with `valid` marking executed iterations).  Iterations after
        convergence are masked no-ops, so the result matches solve() up to
        the early-exit heuristics."""
        with jax.default_matmul_precision("highest"):
            rvw = rvio_weights(params)
            oact = ort_activity(params)
            rvio0, bvio0 = violations(w0, ctx, params, rvw, oact)
            done0 = (rvio0 < opts.rtol) & (bvio0 < opts.btol)
            body, _ = make_iteration(ctx, params, opts)

            def scan_body(st, _):
                done_in = st[-1]
                st2 = body(st)
                # freeze finished lanes (masked no-op after convergence)
                st2 = jax.tree.map(
                    lambda a, b: jnp.where(done_in, a, b), st, st2
                )
                (w, rvio, bvio, mu, ucut, noprog, it, done) = st2
                rec = {
                    "rvio": rvio, "bvio": bvio, "mu": mu,
                    "undercut": ucut, "valid": ~done_in,
                }
                return st2, rec

            init = (
                w0, rvio0, bvio0, jnp.asarray(0.0, w0.dtype),
                jnp.asarray(opts.undercut, w0.dtype),
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), done0,
            )
            (w, rvio, bvio, mu_f, _, _, it, _), trace = jax.lax.scan(
                scan_body, init, None, length=opts.max_iter
            )
            success = (rvio < opts.rtol) & (bvio < opts.btol)
            res = SolveResult(
                w=w, success=success, iterations=it, rvio=rvio, bvio=bvio,
                mu=mu_f, rescued=jnp.zeros_like(success),
            )
            return res, trace

    solve.make_iteration = make_iteration
    solve.traced = solve_traced
    return init_w, solve, violations
