"""Parallel-in-time LQR backward pass via associative scan.

The sequential Riccati recursion (mpc/ilqr.py backward) has O(H) depth —
the horizon is the one dimension the reference computes strictly serially
(SURVEY §5: rollouts are sequential, simulate.jl:25-33).  On TPU the
backward pass can instead run in O(log H) depth: quadratic value-function
*spans* compose associatively, so `jax.lax.associative_scan` evaluates all
suffix value functions at once, and sharding the element arrays over an
`hz` mesh axis turns the composition tree into an ICI collective — the
horizon-parallel factorization called for by the north-star plan
(SURVEY §2.3/§5; math follows the parallel-LQT construction of
Särkkä & García-Fernández, temporal-parallelization line of work).

Span element between knots i<j, in dual (max-λ) form:

    V(x_i, x_j) = max_λ { λᵀ(x_j − A x_i − b) − ½ λᵀ C λ }
                  + ½ x_iᵀ J x_i − ηᵀ x_i

Composition (i→k) = (i→j) ∘ (j→k):

    M   = (I + C₁ J₂)⁻¹
    A   = A₂ M A₁
    b   = A₂ M (b₁ + C₁ η₂′) + b₂        with η′ = −η (gradient form)
    C   = A₂ M C₁ A₂ᵀ + C₂
    J   = A₁ᵀ (I + J₂ C₁)⁻¹ J₂ A₁ + J₁
    η   = A₁ᵀ (I + J₂ C₁)⁻¹ (η₂ − J₂ b₁) + η₁

A stage with dynamics x' = A x + B u + c and cost
½xᵀQx + qᵀx + ½uᵀRu + rᵀu initializes as
    (A, c − B R⁻¹ r, B R⁻¹ Bᵀ, −q, Q)
and the terminal cost as (0, 0, 0, −q_f, Q_f).  After the reverse scan,
V_k(x) = ½ xᵀ J_k x − η_kᵀ x, from which the feedback gains follow
stage-wise (vmapped, no sequential dependence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _compose(e1, e2):
    """Compose value spans: e1 covers [i,j), e2 covers [j,k)."""
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    n = A1.shape[-1]
    I = jnp.broadcast_to(jnp.eye(n, dtype=A1.dtype), A1.shape)
    # associative_scan passes stacked elements: leading batch dims broadcast
    M = jnp.linalg.solve(I + C1 @ J2, I)
    N = jnp.linalg.solve(I + J2 @ C1, I)
    A2M = A2 @ M
    A1TN = jnp.swapaxes(A1, -1, -2) @ N
    A = A2M @ A1
    b = (A2M @ (b1[..., None] + C1 @ eta2[..., None]))[..., 0] + b2
    C = A2M @ C1 @ jnp.swapaxes(A2, -1, -2) + C2
    eta = (A1TN @ (eta2[..., None] - J2 @ b1[..., None]))[..., 0] + eta1
    J = A1TN @ J2 @ A1 + J1
    return (A, b, C, eta, J)


def lqr_backward_parallel(As, Bs, Qs, Rs, qs, rs, Qf, qf, cs=None,
                          reg=0.0):
    """All-time value functions + gains in O(log H) depth.

    As, Bs: (H, n, n), (H, n, m); Qs, Rs: (H, n, n), (H, m, m);
    qs, rs: (H, n), (H, m) linear cost terms; Qf, qf terminal.
    cs: optional (H, n) dynamics offsets.

    Returns (ks, Ks, Vs, vs): feedforward (H, m), feedback (H, m, n), and
    value Hessians/gradients at knots 0..H (Vs: (H+1, n, n), vs: (H+1, n))
    such that V_k(x) = ½xᵀV_k x + v_kᵀx.  Matches the sequential Riccati
    recursion exactly in exact arithmetic (tests/test_parallel_lqr.py).
    """
    H, n, m = Bs.shape
    dtype = As.dtype
    if cs is None:
        cs = jnp.zeros((H, n), dtype)
    Rreg = Rs + reg * jnp.eye(m, dtype=dtype)
    Rinv_Bt = jnp.linalg.solve(Rreg, jnp.swapaxes(Bs, -1, -2))  # (H, m, n)
    Rinv_r = jnp.linalg.solve(Rreg, rs[..., None])[..., 0]  # (H, m)

    elems = (
        As,
        cs - (Bs @ Rinv_r[..., None])[..., 0],
        Bs @ Rinv_Bt,
        -qs,
        Qs,
    )
    # append terminal element
    term = (
        jnp.zeros((1, n, n), dtype),
        jnp.zeros((1, n), dtype),
        jnp.zeros((1, n, n), dtype),
        -qf[None],
        Qf[None],
    )
    elems = jax.tree.map(
        lambda a, t: jnp.concatenate([a, t], axis=0), elems, term
    )
    # reverse=True passes the LATER span as the first combine argument
    # (verified against explicit suffix products) — swap into time order
    suffix = jax.lax.associative_scan(
        lambda a, b: _compose(b, a), elems, reverse=True
    )
    _, _, _, etas, Js = suffix
    Vs = Js  # (H+1, n, n)
    vs = -etas  # (H+1, n):  V_k(x) = ½xᵀJx − ηᵀx

    # stage-wise gains from V_{k+1} (vmapped — no sequential chain)
    def gains(A, B, R, r, c, V1, v1):
        Quu = R + jnp.swapaxes(B, -1, -2) @ V1 @ B
        Qu = r + B.T @ (v1 + V1 @ c)
        Qux = B.T @ V1 @ A
        L = jnp.linalg.cholesky(
            Quu + 1e-12 * jnp.eye(m, dtype=dtype)
        )
        k = -jax.scipy.linalg.cho_solve((L, True), Qu)
        K = -jax.scipy.linalg.cho_solve((L, True), Qux)
        return k, K

    ks, Ks = jax.vmap(gains)(As, Bs, Rreg, rs, cs, Vs[1:], vs[1:])
    return ks, Ks, Vs, vs
