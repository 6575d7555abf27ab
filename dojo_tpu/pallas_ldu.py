"""Pallas TPU kernels for the graph-sparse block LDU (see ldu.py).

The jnp implementation in ldu.py lowers to ~1.5k tiny XLA ops per Newton
iteration (gathers, (W,W) einsums, scatter-adds with W=14) — each op pays
dispatch + HBM round-trip, so a factorization measures ~5.8 ms at B=256
while its arithmetic is ~0.1 ms of VPU work.  These kernels execute the
whole static elimination schedule inside VMEM in one launch per phase:

* batch rides the minor (lane) dimension — every elementwise op is a full
  (W, W, BT) tile instead of a 22%-occupied (B, W, W) one;
* the schedule (levels, slot indices, update lists) is baked in at trace
  time as static Python constants — refs are indexed with static slots,
  so there are no gathers at all;
* (W,W) contractions are unrolled broadcast-FMA on the VPU (MXU tiles are
  128×128 — these blocks are far below that, and the batch dimension
  already fills the lanes);
* launches are gridless, one per BT-lane chunk: with a pallas grid,
  Mosaic double-buffers the multi-MB block array across grid steps and
  overflows VMEM.

Numerics are IDENTICAL to ldu.py: per-block scaled-partial-pivot LU with
Schur updates through backward-stable *solves* (blu_factor/blu_solve —
never explicit inverses, the float32 fix for interior-point endgames),
same elimination order, same pivot floor.  Agreement is tested against
the jnp path in tests/test_pallas_ldu.py via interpret mode on CPU and
exercised on real TPU by bench.py.

Reference provenance: GraphBasedSystems.jl `ldu_factorization!` /
`ldu_backsubstitution!` as used at src/solver/mehrotra.jl:36-49.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .graph import Schedule

# batch tile (lanes per launch): gridless chunked launches make each
# chunk the full array, satisfying Mosaic's minor-dim rule at any BT.
# 128 keeps factorize's resident set (blocks + LU + PS + scratch) within
# the raised 100 MB vmem_limit_bytes passed to pallas_call below for
# zoo-scale schedules (quadruped: ~30 MB at BT=128).
BT = 128
UPD_CHUNK = 4  # Schur updates per stacked contraction (bounds scratch)
GJ_CHUNK = 7  # level nodes per stacked in-block factorization


def _row(T, i):
    """Row i of (m,W,W,BT) as (m,W,BT) — slice-only indexing (mixing
    integer indices with None lowers to an unsupported gather in Mosaic)."""
    return T[:, i]


def _bmm(A, B_, W):
    """out[m,i,k,b] = Σ_j A[m,i,j,b]·B_[m,j,k,b] via unrolled FMA."""
    out = A[:, :, 0:1, :] * B_[:, 0:1, :, :]
    for j in range(1, W):
        out = out + A[:, :, j:j + 1, :] * B_[:, j:j + 1, :, :]
    return out


def _bmv(A, v, W):
    """(m,W,W,BT) @ (m,W,BT) -> (m,W,BT)."""
    out = A[:, :, 0, :] * v[:, 0:1, :]
    for j in range(1, W):
        out = out + A[:, :, j, :] * v[:, j:j + 1, :]
    return out


def _blu_factor_kernel(D, n, W):
    """In-kernel batched pivoted LU, batch-minor (k,W,W,BT).

    Mirrors ldu.blu_factor: scaled partial pivoting via onehot row swaps,
    pivot floor 1e-12, multipliers stored in the strict lower triangle.
    Returns (LU, PS) with PS = P·diag(rowscale).
    """
    dtype = D.dtype
    rmax = jnp.max(jnp.abs(D), axis=2, keepdims=True)  # (k,W,1,BT)
    rscale = jnp.where(rmax > 0, 1.0 / rmax, 1.0)
    M = D * rscale
    eye = jnp.eye(W, dtype=dtype)[None, :, :, None]
    PS = jnp.broadcast_to(eye, D.shape) * rscale
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)  # row ids
    for k in range(n):
        col = M[:, :, k, :]  # (k,W,BT)
        mag = jnp.where((iota_r >= k) & (iota_r < n), jnp.abs(col), -jnp.inf)
        p = jnp.argmax(mag, axis=1)  # (k,BT)
        onehot = (iota_r == p[:, None, :]).astype(dtype)  # (k,W,BT)
        ek = (iota_r == k).astype(dtype)  # (1,W,1)
        swapped = []
        for T in (M, PS):
            Tp = jnp.sum(onehot[:, :, None, :] * T, axis=1)  # (k,W,BT)
            Tk = T[:, k]  # (k,W,BT)
            swapped.append(
                T
                + ek[:, :, None, :] * (Tp - Tk)[:, None, :, :]
                + onehot[:, :, None, :] * (Tk - Tp)[:, None, :, :]
            )
        M, PS = swapped
        a = M[:, k, k, :]  # (k,BT)
        # pivot floor by dtype, matching ldu.blu_factor (f32 value 1e-12,
        # f64 1e-30) so a batched f64 call keeps the documented "numerics
        # identical to ldu.py" contract
        tiny = 1e-12 if dtype == jnp.float32 else 1e-30
        a = jnp.where(jnp.abs(a) > tiny, a, jnp.where(a < 0, -tiny, tiny))
        low = (iota_r > k).astype(dtype)  # (1,W,1)
        upper = low  # same mask, used on the column axis
        mult = low * M[:, :, k, :] / a[:, None, :]  # (k,W,BT)
        rowk = M[:, k] * upper[0][None, :, :]  # (k,W,BT) cols > k
        M = M - mult[:, :, None, :] * rowk[:, None, :, :]
        # store floored pivot and L multipliers in column k
        ekc = ek[0][None, :, :]  # (1,W,1) over the column axis
        colk_new = (
            M[:, :, k, :] * (1.0 - low - ek)  # rows < k unchanged
            + ek * a[:, None, :]  # diagonal = floored pivot
            + low * mult  # below: multipliers
        )
        M = M * (1.0 - ekc[:, None, :, :]) + colk_new[:, :, None, :] * ekc[:, None, :, :]
    return M, PS


def _blu_apply_mat(LU, PS, B_, W):
    """Solve D·X = B_ (matrix RHS) in batch-minor: (c,W,W,BT) each.

    Column-oriented substitution: W full-matrix FMA steps per triangle
    instead of W² row-dot steps — 6× fewer (and larger) VPU ops, which
    also keeps the Mosaic op count (and compile time) bounded.
    """
    Y = _bmm(PS, B_, W)  # (c,W,W,BT)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1, 1), 1)
    for j in range(W - 1):  # forward: unit-lower, column j eliminates
        colj = LU[:, :, j:j + 1, :] * (iota_r > j)
        Y = Y - colj * Y[:, j:j + 1, :, :]
    xs = [None] * W
    for j in range(W - 1, -1, -1):  # backward: upper
        xj = Y[:, j:j + 1, :, :] / LU[:, j:j + 1, j:j + 1, :]
        xs[j] = xj
        if j > 0:
            colj = LU[:, :, j:j + 1, :] * (iota_r < j)
            Y = Y - colj * xj
    return jnp.concatenate(xs, axis=1)  # (c,W,W,BT)


def _blu_apply_vec(LU, PS, b, W):
    """Solve D·x = b for vectors, batch-minor: LU/PS (c,W,W,BT), b (c,W,BT)."""
    y = _bmv(PS, b, W)  # (c,W,BT)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
    for j in range(W - 1):
        colj = LU[:, :, j, :] * (iota_r > j)
        y = y - colj * y[:, j:j + 1, :]
    xs = [None] * W
    for j in range(W - 1, -1, -1):
        xj = y[:, j:j + 1, :] / LU[:, j:j + 1, j, :]
        xs[j] = xj
        if j > 0:
            colj = LU[:, :, j, :] * (iota_r < j)
            y = y - colj * xj
    return jnp.concatenate(xs, axis=1)  # (c,W,BT)


def _stack_read(ref, idxs):
    """Static-index gather: stack ref[i] for i in idxs -> (m, ...)."""
    return jnp.stack([ref[int(i)] for i in idxs], axis=0)


def make_pallas_ldu(sched: Schedule, refine: int = 1, interpret: bool = False):
    """Batched Pallas factorize/solve for a schedule.

    Returns (factorize_b, solve_b):
      factorize_b(blocks)  (B,S,W,W) -> ((B,S,W,W), (B,N,W,W), (B,N,W,W))
      solve_b(blocks, fact, rhs_nod) -> (B,N,W)  with `refine` in-loop
        iterative-refinement sweeps via the exact block matvec.
    rhs_nod / result are node-major (N,W) — callers scatter/gather the
    flat w-vector outside (one XLA gather, cheap).
    """
    S1 = sched.n_slots
    W, N = sched.width, sched.n_nodes
    levels = sched.levels
    slot_a = np.zeros(S1, dtype=np.int32)
    slot_b = np.zeros(S1, dtype=np.int32)
    for (a, b), s in sched.slot.items():
        slot_a[s], slot_b[s] = a, b

    # ---- factorize kernel -------------------------------------------------
    def fact_kernel(bt_ref, fb_ref, lu_ref, ps_ref):
        # copy input blocks into the output ref, then factor in place
        # (donation across the chunked launches mis-aliased on TPU —
        # an explicit VMEM copy is ~free at these sizes)
        fb_ref[:] = bt_ref[:]
        for lv in levels:
            nodes = [int(x) for x in lv.nodes]
            for g0 in range(0, len(nodes), GJ_CHUNK):
                chunk = nodes[g0:g0 + GJ_CHUNK]
                D = _stack_read(fb_ref, chunk)  # (k,W,W,BT)
                LUc, PSc = _blu_factor_kernel(D, int(lv.real_w), W)
                for i, nd in enumerate(chunk):
                    lu_ref[nd] = LUc[i]
                    ps_ref[nd] = PSc[i]
            m = int(lv.upd_tgt.size)
            for c0 in range(0, m, UPD_CHUNK):
                c1 = min(c0 + UPD_CHUNK, m)
                A = _stack_read(fb_ref, lv.upd_ai[c0:c1])
                LUc = _stack_read(lu_ref, lv.upd_inv[c0:c1])
                PSc = _stack_read(ps_ref, lv.upd_inv[c0:c1])
                Cb = _stack_read(fb_ref, lv.upd_ib[c0:c1])
                Y = _blu_apply_mat(LUc, PSc, Cb, W)
                delta = _bmm(A, Y, W)  # (c,W,W,BT)
                for i, t in enumerate(lv.upd_tgt[c0:c1]):
                    fb_ref[int(t)] = fb_ref[int(t)] - delta[i]

    def _chunks(x):
        """Split the minor batch dim into BT-wide padded chunks."""
        Bp = pl.cdiv(x.shape[-1], BT) * BT
        if Bp != x.shape[-1]:
            padw = [(0, 0)] * (x.ndim - 1) + [(0, Bp - x.shape[-1])]
            x = jnp.pad(x, padw)
        return [x[..., i * BT:(i + 1) * BT] for i in range(Bp // BT)]

    def factorize_b(blocks):
        # blocks (B,S,W,W) -> factored blocks + LU + PS, batch-major
        B = blocks.shape[0]
        bt = jnp.transpose(blocks, (1, 2, 3, 0))  # (S,W,W,B)
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        outs = [
            pl.pallas_call(
                fact_kernel,
                in_specs=[vmem],
                out_specs=(vmem, vmem, vmem),
                out_shape=(
                    jax.ShapeDtypeStruct((S1, W, W, BT), bt.dtype),
                    jax.ShapeDtypeStruct((N, W, W, BT), bt.dtype),
                    jax.ShapeDtypeStruct((N, W, W, BT), bt.dtype),
                ),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(c)
            for c in _chunks(bt)
        ]
        back = lambda i: jnp.transpose(
            jnp.concatenate([o[i] for o in outs], axis=-1), (3, 0, 1, 2)
        )[:B]
        return back(0), back(1), back(2)

    # ---- solve / matvec kernels -------------------------------------------
    def emit_solve(fb_ref, lu_ref, ps_ref, b):
        """One two-pass backsubstitution on node vectors b (list of (W,BT)).

        All per-level edge applications are STACKED into one batched
        substitution + one batched matvec per level — keeps the kernel at
        ~10² Mosaic ops per level instead of ~10² per edge."""
        xs = [None] * N
        bs = list(b)
        for lv in levels:
            if lv.fwd_a.size:
                i_list = [int(i) for i in lv.fwd_i]
                LUc = _stack_read(lu_ref, i_list)
                PSc = _stack_read(ps_ref, i_list)
                bi = jnp.stack([bs[i] for i in i_list], axis=0)
                y = _blu_apply_vec(LUc, PSc, bi, W)  # (f,W,BT)
                E = _stack_read(fb_ref, lv.fwd_ai)
                contrib = _bmv(E, y, W)
                for n_, a in enumerate(lv.fwd_a):
                    bs[int(a)] = bs[int(a)] - contrib[n_]
        for lv in reversed(levels):
            acc = {int(nd): bs[int(nd)] for nd in lv.nodes}
            if lv.bwd_i.size:
                E = _stack_read(fb_ref, lv.bwd_ia)
                xa = jnp.stack([xs[int(a)] for a in lv.bwd_a], axis=0)
                contrib = _bmv(E, xa, W)
                for n_, i in enumerate(lv.bwd_i):
                    acc[int(i)] = acc[int(i)] - contrib[n_]
            nodes = [int(nd) for nd in lv.nodes]
            LUc = _stack_read(lu_ref, nodes)
            PSc = _stack_read(ps_ref, nodes)
            av = jnp.stack([acc[nd] for nd in nodes], axis=0)
            xv = _blu_apply_vec(LUc, PSc, av, W)
            for n_, nd in enumerate(nodes):
                xs[nd] = xv[n_]
        return xs

    def solve_kernel(fb_ref, lu_ref, ps_ref, rhs_ref, out_ref):
        b = [rhs_ref[n] for n in range(N)]  # (W,BT) each
        xs = emit_solve(fb_ref, lu_ref, ps_ref, b)
        for n in range(N):
            out_ref[n] = xs[n]

    def matvec_kernel(b0_ref, x_ref, out_ref):
        xs = [x_ref[n] for n in range(N)]
        # one stacked FMA contraction over ALL slots, then scatter by node
        xb = jnp.stack([xs[int(slot_b[s])] for s in range(S1)], axis=0)
        contrib = _bmv(b0_ref[:], xb, W)  # (S1,W,BT)
        for n in range(N):
            idxs = [s for s in range(S1) if int(slot_a[s]) == n]
            acc = contrib[idxs[0]]
            for s in idxs[1:]:
                acc = acc + contrib[s]
            out_ref[n] = acc

    def _call_solve(fbt, lut, pst, rt):
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        outs = [
            pl.pallas_call(
                solve_kernel,
                in_specs=[vmem] * 4,
                out_specs=vmem,
                out_shape=jax.ShapeDtypeStruct((N, W, BT), fbt.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(f, l, p, r)
            for f, l, p, r in zip(
                _chunks(fbt), _chunks(lut), _chunks(pst), _chunks(rt))
        ]
        return jnp.concatenate(outs, axis=-1)

    def _call_matvec(b0t, xt):
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        outs = [
            pl.pallas_call(
                matvec_kernel,
                in_specs=[vmem, vmem],
                out_specs=vmem,
                out_shape=jax.ShapeDtypeStruct((N, W, BT), b0t.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(b, x)
            for b, x in zip(_chunks(b0t), _chunks(xt))
        ]
        return jnp.concatenate(outs, axis=-1)

    def solve_b(blocks, fact, rhs_nod):
        """blocks (B,S,W,W), fact 3-tuple from factorize_b, rhs (B,N,W).

        The refinement loop alternates solve/matvec launches (separate
        kernels keep each launch's VMEM residency bounded: factored
        blocks + LU + PS for the solve, original blocks for the matvec)."""
        fb, lu, ps = fact
        B = blocks.shape[0]
        Bp = pl.cdiv(B, BT) * BT
        pad = lambda x: jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - x.shape[-1])])
        tr4 = lambda x: pad(jnp.transpose(x, (1, 2, 3, 0)))
        b0t, fbt, lut, pst = tr4(blocks), tr4(fb), tr4(lu), tr4(ps)
        rt = pad(jnp.transpose(rhs_nod, (1, 2, 0)))
        xt = _call_solve(fbt, lut, pst, rt)
        for _ in range(refine):
            yt = _call_matvec(b0t, xt)
            xt = xt + _call_solve(fbt, lut, pst, rt - yt)
        return jnp.transpose(xt, (2, 0, 1))[:B]

    return factorize_b, solve_b


def flat_to_nodes(sched: Schedule, rhs):
    """(..., D) -> (..., N, W): pad dims read zero."""
    vec_idx = jnp.asarray(sched.vec_idx)
    rp = jnp.concatenate(
        [rhs, jnp.zeros(rhs.shape[:-1] + (1,), rhs.dtype)], axis=-1)
    return rp[..., vec_idx]


def nodes_to_flat(sched: Schedule, x_nod, dim):
    """(..., N, W) -> (..., D) scatter-add with validity mask."""
    vec_idx = jnp.asarray(sched.vec_idx)
    valid = jnp.asarray(sched.vec_valid, x_nod.dtype)
    flat = (x_nod * valid).reshape(x_nod.shape[:-2] + (-1,))
    out = jnp.zeros(x_nod.shape[:-2] + (dim + 1,), x_nod.dtype)
    out = out.at[..., vec_idx.reshape(-1)].add(flat)
    return out[..., :dim]
