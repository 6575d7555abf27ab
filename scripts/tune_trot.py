"""Closed-loop trot-MPC tuning harness: ONE compiled graph, the whole
tuning space as runtime data.

The iLQR cost matrices are baked into make_ilqr's graph, so tuning Q/R by
rebuilding would pay a 20-40 min relay compile per candidate.  Here the
backward pass / costs / gain clamp take diagonal Q, R, reg, du_max as
ARGUMENTS, and the closed loop is vmapped over a batch of configs — one
compile, then every candidate (including different gait references: goals
are data) evaluates in seconds on the chip.

Usage: PYTHONPATH=.:.. python scripts/tune_trot.py  (TPU via relay)
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dojo_tpu.cachedir import enable_compile_cache

enable_compile_cache()

from dojo_tpu import models
from dojo_tpu.core import SolverOptions
from dojo_tpu.gradients import make_rollout_linearize_minimal
from dojo_tpu.minimal import maximal_to_minimal
from dojo_tpu.mpc.ilqr import ILQRConfig, _make_parts
from dojo_tpu.mpc.trot import (
    TrotSpec,
    actuated_indices,
    trot_cost,
    trot_reference,
)

H, DT, K = 40, 0.05, 24
ALPHAS = (1.0, 0.5, 0.25, 0.1)
DTYPE = jnp.float32

mech = models.get_mechanism("quadruped", timestep=DT).cast(DTYPE)
state0 = jax.tree.map(
    lambda a: jnp.asarray(a, DTYPE), models.initialize(mech, "quadruped")
)
y0 = maximal_to_minimal(mech.topo, mech.params, state0)
ny = mech.topo.minimal_dim
act = actuated_indices(mech)
nu = len(act)
n_packed = mech.topo.input_dim

# rescue=True: with rescue=False, ~12% of knots (impact steps) fail at f32
# and poison every downstream knot of the warm-chained forward pass — the
# line search then NEVER accepts (measured: 0 acceptances in 1152 trials).
opts = SolverOptions(rtol=1e-4, btol=1e-3, max_iter=16, rescue=True)
p = _make_parts(
    mech.topo, trot_cost(mech), H, ILQRConfig(alphas=(1.0,)), opts, act,
    "auto",
)
plant_step, _, plant_seed = make_rollout_linearize_minimal(
    mech.topo, SolverOptions(rtol=1e-6, btol=1e-4, max_iter=30)
)


def cost_rt(ys, us, goals, Qd, Rd):
    dy = ys[:-1] - goals[:-1]
    cf = ys[-1] - goals[-1]
    return (
        jnp.sum(dy * dy * Qd[None])
        + jnp.sum(us * us * Rd[None])
        + 2.0 * jnp.sum(cf * cf * Qd)  # Qf = 2Q (trot_cost convention)
    )


def backward_rt(As, Bs, ys, us, goals, Qd, Rd, reg):
    lys = 2.0 * (ys[:-1] - goals[:-1]) * Qd[None]
    lus = 2.0 * us * Rd[None]
    VH = jnp.diag(4.0 * Qd)
    vH = 4.0 * Qd * (ys[-1] - goals[-1])
    eye_u = jnp.eye(nu, dtype=ys.dtype)

    def bstep(carry, inp):
        V, v = carry
        A, B, ly, lu = inp
        Qx = ly + A.T @ v
        Qu = lu + B.T @ v
        Qxx = jnp.diag(2.0 * Qd) + A.T @ V @ A
        Quu = jnp.diag(2.0 * Rd) + B.T @ V @ B + reg * eye_u
        Qux = B.T @ V @ A
        L = jnp.linalg.cholesky(Quu + 1e-8 * eye_u)
        k = -jax.scipy.linalg.cho_solve((L, True), Qu)
        Km = -jax.scipy.linalg.cho_solve((L, True), Qux)
        V2 = Qxx + Km.T @ Quu @ Km + Km.T @ Qux + Qux.T @ Km
        v2 = Qx + Km.T @ Quu @ k + Km.T @ Qu + Qux.T @ k
        return (V2, v2), (k, Km)

    (_, _), (ks, Ks) = jax.lax.scan(
        bstep, (VH, vH), (As, Bs, lys, lus), reverse=True
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
        return (y2, w), (y2, u, ok)

    (_, _), (ys2, us2, oks) = jax.lax.scan(
        body, (ys[0], wseed), (ys[:-1], us, ks, Ks)
    )
    return jnp.concatenate([ys[:1], ys2], 0), us2, oks


def ctrl(params, y, us_warm, w_plant, goals, Qd, Rd, reg, du_max):
    wseed = p.w_seed(params, y)
    ys0, _, (ws, mus, ok0) = p.rollout(params, y, us_warm, goals, wseed)
    c0 = cost_rt(ys0, us_warm, goals, Qd, Rd)
    As, Bs = p.linearize(params, ys0, us_warm, ws, mus)
    # sanitize impact-broken knots (NaN f32 linearization → A=I, B=0) —
    # one bad knot otherwise NaNs the whole Riccati recursion
    fin = jnp.all(jnp.isfinite(As), axis=(1, 2)) & jnp.all(
        jnp.isfinite(Bs), axis=(1, 2))
    eye_y = jnp.eye(ny, dtype=ys0.dtype)
    As = jnp.where(fin[:, None, None], As, eye_y[None])
    Bs = jnp.where(fin[:, None, None], Bs, 0.0)
    ks, Ks = backward_rt(As, Bs, ys0, us_warm, goals, Qd, Rd, reg)
    ks = jnp.where(jnp.isfinite(ks), ks, 0.0)
    Ks = jnp.where(jnp.isfinite(Ks), Ks, 0.0)

    alphas = jnp.asarray(ALPHAS, y.dtype)
    ys_c, us_c, oks_c = jax.vmap(
        lambda a: forward_rt(params, ys0, us_warm, ks, Ks, a, wseed, du_max)
    )(alphas)
    cs = jax.vmap(lambda yy, uu: cost_rt(yy, uu, goals, Qd, Rd))(ys_c, us_c)
    cs = jnp.where(jnp.isnan(cs), jnp.inf, cs)
    best = jnp.argmin(cs)
    improved = cs[best] < c0
    us2 = jnp.where(improved, us_c[best], us_warm)
    okf = jnp.where(
        improved,
        jnp.mean(oks_c[best].astype(y.dtype)),
        jnp.mean(ok0.astype(y.dtype)),
    )
    c_out = jnp.where(improved, cs[best], c0)
    u0 = us2[0]
    us_next = jnp.concatenate([us2[1:], us2[-1:]], 0)
    u_full = jnp.zeros(n_packed, y.dtype).at[jnp.asarray(act)].set(u0)
    y2, w2, _, okp = plant_step(params, y, u_full, w_plant)
    return y2, us_next, w2, c_out, okf, okp, improved, c0, cs[best]


ctrl_v = jax.jit(
    jax.vmap(ctrl, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))
)


def leg_spring_params(params, spring, damper, stand=(0.0, np.pi / 4, -np.pi / 2)):
    """Joint springs/dampers on the 12 leg joints, spring offsets at the
    gait's standing pose (reference behaviors.jl:1-19 stabilizes the
    quadruped with springs=30/dampers=1000; these are runtime Params, so
    the swept values never recompile)."""
    rs = np.zeros(mech.topo.nj, np.float64)
    rd = np.zeros(mech.topo.nj, np.float64)
    off = np.asarray(params.rot_spring_offset, np.float64).copy()
    hip, thigh, calf = stand
    for name, j in mech.joint_index.items():
        if name == "floating_base":
            continue
        rs[j], rd[j] = spring, damper
        if name.endswith("_hip_joint"):
            off[j, 0] = hip
        elif name.endswith("_thigh_joint"):
            off[j, 0] = thigh
        elif name.endswith("_calf_joint"):
            off[j, 0] = calf
    return params._replace(
        rot_spring=jnp.asarray(rs, DTYPE),
        rot_damper=jnp.asarray(rd, DTYPE),
        rot_spring_offset=jnp.asarray(off, DTYPE),
    )


def run_sweep(configs, params=None, label=""):
    """configs: list of dicts with Qd, Rd, reg, du_max, spec."""
    params = mech.params if params is None else params
    C = len(configs)
    ys = jnp.tile(y0[None], (C, 1))
    us = jnp.zeros((C, H, nu), DTYPE)
    w_plant = jax.vmap(lambda y: plant_seed(params, y))(ys)
    Qd = jnp.stack([c["Qd"] for c in configs])
    Rd = jnp.stack([c["Rd"] for c in configs])
    reg = jnp.asarray([c["reg"] for c in configs], DTYPE)
    dmx = jnp.asarray([c["du_max"] for c in configs], DTYPE)

    stats = {"okf": [], "okp": [], "imp": [], "c": []}
    t0 = time.perf_counter()
    for k in range(K):
        goals = jnp.stack(
            [
                trot_reference(mech, k * DT, H, DT, c["spec"]).astype(DTYPE)
                for c in configs
            ]
        )
        ys, us, w_plant, c_, okf, okp, imp, c0, cb = ctrl_v(
            params, ys, us, w_plant, goals, Qd, Rd, reg, dmx
        )
        print(
            f"[{label}] k={k:02d} cfg0: c0={float(c0[0]):9.1f} "
            f"cbest={float(cb[0]):9.1f} imp={float(imp[0]):.0f} "
            f"okf={float(okf[0]):.2f}", flush=True,
        )
        for nm, v in (("okf", okf), ("okp", okp), ("imp", imp), ("c", c_)):
            stats[nm].append(np.asarray(v))
        if k == 0:
            print(
                f"[{label}] first ctrl_v call done at "
                f"{time.perf_counter() - t0:.1f}s", flush=True,
            )
    yn = np.asarray(ys)
    for i, c in enumerate(configs):
        adv = yn[i, 0] - float(y0[0])
        cmd = c["spec"].vx * K * DT
        print(
            f"[{label}] cfg{i:02d} {c['name']:28s} "
            f"progress={adv / max(cmd, 1e-9):+.2f} z={yn[i, 2]:.3f} "
            f"okf={np.mean(stats['okf'], 0)[i]:.2f} "
            f"okp={np.mean(stats['okp'], 0)[i]:.2f} "
            f"imp={np.mean(stats['imp'], 0)[i]:.2f} "
            f"c={np.mean(stats['c'][-4:], 0)[i]:9.1f}",
            flush=True,
        )


def base_Q(pos_x=0.0, vx_w=8.0, joint_w=1.0):
    Q = np.asarray(trot_cost(mech).Q, np.float64).copy()
    Q[0] = pos_x  # base x position weight (0 → velocity tracking only)
    Q[6] = vx_w  # base forward-velocity weight
    idx = np.arange(12, ny)
    Q[12:] *= joint_w
    return jnp.asarray(Q, DTYPE)


if __name__ == "__main__":
    spec = TrotSpec()
    R0 = np.asarray(trot_cost(mech).R, np.float64)
    configs = []
    for name, Qd, rmul, reg, dmx in [
        ("vel reg3", base_Q(), 1.0, 3.0, 1e9),
        ("vel reg10", base_Q(), 1.0, 10.0, 1e9),
        ("vel reg30", base_Q(), 1.0, 30.0, 1e9),
        ("vel reg100", base_Q(), 1.0, 100.0, 1e9),
        ("vel reg10 clamp5", base_Q(), 1.0, 10.0, 5.0),
        ("vel reg30 clamp5", base_Q(), 1.0, 30.0, 5.0),
        ("base(r3) reg10", jnp.asarray(trot_cost(mech).Q, DTYPE), 1.0, 10.0, 1e9),
        ("base(r3) reg30", jnp.asarray(trot_cost(mech).Q, DTYPE), 1.0, 30.0, 1e9),
        ("vel jw0.5 reg10", base_Q(joint_w=0.5), 1.0, 10.0, 1e9),
        ("vel vx16 reg10", base_Q(vx_w=16.0), 1.0, 10.0, 1e9),
        ("vel R*10 reg10", base_Q(), 10.0, 10.0, 1e9),
        ("vel reg10 R*0.1", base_Q(), 0.1, 10.0, 1e9),
    ]:
        configs.append(
            dict(
                name=name, Qd=Qd, Rd=jnp.asarray(R0 * rmul, DTYPE),
                reg=reg, du_max=dmx, spec=spec,
            )
        )
    import sys
    mode = sys.argv[1] if len(sys.argv) > 1 else "cost"
    if mode == "gait3":
        # joint-tracking authority sweep at the corrected stand geometry
        state2 = jax.tree.map(
            lambda a: jnp.asarray(a, DTYPE),
            models.initialize(mech, "quadruped", body_position=(0, 0, -0.13)),
        )
        globals()["y0"] = maximal_to_minimal(mech.topo, mech.params, state2)
        sp_f = TrotSpec(base_height=0.30)
        sp_b = TrotSpec(base_height=0.30, sweep=-0.25)
        sp_l = TrotSpec(base_height=0.30, sweep=0.15, thigh_swing=0.2,
                        calf_swing=0.2)
        configs = []
        for nm, jw, rm, sp in [
            ("jw5 sw+", 5.0, 1.0, sp_f), ("jw5 sw-", 5.0, 1.0, sp_b),
            ("jw10 sw+", 10.0, 1.0, sp_f), ("jw10 sw-", 10.0, 1.0, sp_b),
            ("jw20 sw+", 20.0, 1.0, sp_f), ("jw20 sw-", 20.0, 1.0, sp_b),
            ("jw10 R.3 sw+", 10.0, 0.3, sp_f), ("jw10 R.3 sw-", 10.0, 0.3, sp_b),
            ("jw10 lift.2", 10.0, 1.0, sp_l),
            ("jw20 R.3 sw+", 20.0, 0.3, sp_f),
            ("jw40 sw+", 40.0, 1.0, sp_f),
            ("jw10 vx16 sw+", 10.0, 1.0, sp_f),
        ]:
            Q = base_Q(joint_w=jw, vx_w=(16.0 if "vx16" in nm else 8.0))
            configs.append(dict(name=nm, Qd=Q,
                                Rd=jnp.asarray(R0 * rm, DTYPE),
                                reg=10.0, du_max=1e9, spec=sp))
        run_sweep(configs,
                  params=leg_spring_params(mech.params, 40.0, 4.0,
                                           stand=(-0.001, 0.818, -1.438)),
                  label="g3 k40/d4")
        raise SystemExit(0)
    if mode == "gait2":
        # corrected geometry (rest_pose_probe findings): the standing pose
        # (thigh pi/4, calf -pi/2) puts the base at z~0.30, not 0.43 — the
        # old reference height was unreachable and the default init drops
        # the robot 0.13 m.  Start at the true stand height, track it, and
        # use gravity-biased spring offsets so stand is the loaded
        # equilibrium.
        state2 = jax.tree.map(
            lambda a: jnp.asarray(a, DTYPE),
            models.initialize(mech, "quadruped", body_position=(0, 0, -0.13)),
        )
        globals()["y0"] = maximal_to_minimal(
            mech.topo, mech.params, state2)
        bias = {
            40.0: (-0.001, 0.818, -1.438),
            60.0: (-0.001, 0.800, -1.487),
            100.0: (0.0, 0.791, -1.523),
        }
        for k_, d_ in ((40.0, 4.0), (60.0, 5.0), (100.0, 8.0)):
            specs = [
                ("sw+0.25", TrotSpec(base_height=0.30)),
                ("sw-0.25", TrotSpec(base_height=0.30, sweep=-0.25)),
                ("sw+0.25 v.15", TrotSpec(base_height=0.30, vx=0.15)),
                ("sw-0.25 v.15", TrotSpec(base_height=0.30, vx=0.15, sweep=-0.25)),
                ("sw+0.15 lift.2", TrotSpec(base_height=0.30, sweep=0.15,
                                            thigh_swing=0.2, calf_swing=0.2)),
                ("sw-0.15 lift.2", TrotSpec(base_height=0.30, sweep=-0.15,
                                            thigh_swing=0.2, calf_swing=0.2)),
                ("sw+0.25 reg3", TrotSpec(base_height=0.30)),
                ("sw-0.25 reg3", TrotSpec(base_height=0.30, sweep=-0.25)),
                ("sw+0.25 per.8", TrotSpec(base_height=0.30, period=0.8)),
                ("sw-0.25 per.8", TrotSpec(base_height=0.30, period=0.8, sweep=-0.25)),
                ("stand-only", TrotSpec(base_height=0.30, vx=0.0, sweep=0.0,
                                        thigh_swing=0.0, calf_swing=0.0)),
                ("sw0 lift only", TrotSpec(base_height=0.30, sweep=0.0)),
            ]
            configs = [
                dict(name=nm, Qd=base_Q(), Rd=jnp.asarray(R0, DTYPE),
                     reg=(3.0 if "reg3" in nm else 10.0), du_max=1e9, spec=sp)
                for nm, sp in specs
            ]
            run_sweep(
                configs,
                params=leg_spring_params(mech.params, k_, d_,
                                         stand=bias[k_]),
                label=f"g2 k{k_:g}/d{d_:g}",
            )
        raise SystemExit(0)
    if mode == "gait":
        specs = [
            ("sweep+0.25", TrotSpec()),
            ("sweep-0.25", TrotSpec(sweep=-0.25)),
            ("sweep-0.15", TrotSpec(sweep=-0.15)),
            ("sweep+0.15", TrotSpec(sweep=0.15)),
            ("sw-0.25 lift0.2", TrotSpec(sweep=-0.25, thigh_swing=0.2, calf_swing=0.2)),
            ("sw+0.25 lift0.2", TrotSpec(sweep=0.25, thigh_swing=0.2, calf_swing=0.2)),
            ("sw-0.25 per0.8", TrotSpec(sweep=-0.25, period=0.8)),
            ("sw+0.25 per0.8", TrotSpec(sweep=0.25, period=0.8)),
            ("sw-0.25 vx0.15", TrotSpec(sweep=-0.25, vx=0.15)),
            ("sw+0.25 vx0.15", TrotSpec(sweep=0.25, vx=0.15)),
            ("sw-0.4", TrotSpec(sweep=-0.4)),
            ("sw+0.4", TrotSpec(sweep=0.4)),
        ]
        configs = [
            dict(name=nm, Qd=base_Q(), Rd=jnp.asarray(R0, DTYPE),
                 reg=10.0, du_max=1e9, spec=sp)
            for nm, sp in specs
        ]
        run_sweep(configs, params=leg_spring_params(mech.params, 20.0, 2.0),
                  label="gait")
        raise SystemExit(0)
    if mode == "cost":
        run_sweep(configs, label="cost")
    elif mode == "springs":
        for s_, d_ in ((10.0, 1.0), (20.0, 2.0), (30.0, 3.0), (30.0, 8.0)):
            run_sweep(
                configs,
                params=leg_spring_params(mech.params, s_, d_),
                label=f"spr{s_:g}/d{d_:g}",
            )
