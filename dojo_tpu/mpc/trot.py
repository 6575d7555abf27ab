"""Quadruped trot-gait tracking MPC — the driver's north-star configuration
(BASELINE.json: "Quadruped trot-gait MPC (12-DoF, 4 contact points, joint
limits)", H=40, dt=0.05).

The reference repo has no trot planner; its quadruped environment tracks
user-supplied joint trajectories (DojoEnvironments/src/environments/
quadruped_waypoint.jl:55-58 pads the unactuated trunk).  Here the gait
reference is generated procedurally: diagonal leg pairs (FR+RL / FL+RR)
swing in anti-phase around the standing pose while the base tracks a
constant forward velocity.  The MPC is the generic iLQR controller
(mpc/ilqr.py) over the IFT-differentiable contact dynamics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import SolverOptions
from .ilqr import (
    ILQRConfig,
    QuadCost,
    make_ilqr,
    make_mpc_controller,
    make_rti_mpc,
)

GROUPS = ("FR", "FL", "RR", "RL")
# diagonal pairs: FR+RL swing together, FL+RR half a period later
PHASE = {"FR": 0.0, "RL": 0.0, "FL": np.pi, "RR": np.pi}


class TrotSpec(NamedTuple):
    """Gait parameters (angles in radians, speeds in m/s)."""

    vx: float = 0.25  # forward base speed
    period: float = 0.6  # gait cycle length [s]
    # trunk height at the gait's standing joint angles (thigh π/4, calf
    # −π/2) with feet on the floor — MEASURED on hardware
    # (scripts/rest_pose_probe.py): z ≈ 0.30.  The r1-r3 value 0.43 (the
    # reference initialize height, mechanism.jl:118) is unreachable at
    # these angles: tracking it kept a permanent 0.13 m height error, and
    # initializing there drops the robot into impact chaos.
    base_height: float = 0.30
    thigh_stand: float = np.pi / 4
    calf_stand: float = -np.pi / 2
    thigh_swing: float = 0.30  # swing-phase thigh lift amplitude
    calf_swing: float = 0.30  # swing-phase calf curl amplitude
    # fore-aft thigh sweep: the propulsion term.  cos(φ) runs −1→+1 over
    # the stance window (sin φ < 0), so with sweep > 0 the stance foot
    # sweeps from front to back — pushing the body forward — and returns
    # forward during the lifted swing window.  A lift-only gait (sweep=0)
    # has no propulsion and drifts BACKWARD under tracking (measured
    # forward_progress_frac −0.5 on the first hardware MPC run).
    sweep: float = 0.25


def _layout(mech):
    """(base_off, {joint_name: off}) into the minimal vector."""
    from ..minimal import _joint_slices

    slices, _ = _joint_slices(mech.topo)
    offs = {
        name: slices[j][0] for name, j in mech.joint_index.items()
    }
    return offs


def trot_reference(mech, t0, horizon, dt, spec: TrotSpec = TrotSpec()):
    """(H+1, ny) minimal-coordinate gait reference starting at phase time t0.

    t0 may be a traced scalar (receding-horizon use: t0 = k*dt advances the
    phase each control step).
    """
    ny = mech.topo.minimal_dim
    offs = _layout(mech)
    t = t0 + dt * jnp.arange(horizon + 1)  # (H+1,)
    phi = 2.0 * jnp.pi * t / spec.period

    ref = jnp.zeros((horizon + 1, ny))
    b = offs["floating_base"]
    ref = ref.at[:, b + 0].set(spec.vx * t)  # forward position
    ref = ref.at[:, b + 2].set(spec.base_height)
    ref = ref.at[:, b + 6].set(spec.vx)  # forward velocity
    for g in GROUPS:
        sw = jnp.maximum(jnp.sin(phi + PHASE[g]), 0.0)  # swing window
        thigh = (
            spec.thigh_stand
            - spec.thigh_swing * sw
            + spec.sweep * jnp.cos(phi + PHASE[g])  # stance propulsion
        )
        calf = spec.calf_stand - spec.calf_swing * sw
        ref = ref.at[:, offs[f"{g}_thigh_joint"]].set(thigh)
        ref = ref.at[:, offs[f"{g}_calf_joint"]].set(calf)
        # hip reference stays 0
    return ref


def trot_cost(mech):
    """Diagonal tracking weights over the quadruped minimal state."""
    ny, topo = mech.topo.minimal_dim, mech.topo
    offs = _layout(mech)
    Q = np.full(ny, 0.0)
    b = offs["floating_base"]
    Q[b + 0 : b + 3] = (8.0, 8.0, 40.0)  # base position
    Q[b + 3 : b + 6] = (20.0, 8.0, 8.0)  # base attitude (roll stiffest)
    Q[b + 6 : b + 9] = (2.0, 1.0, 1.0)  # base velocity
    Q[b + 9 : b + 12] = 0.5  # base angular velocity
    for g in GROUPS:
        for nm, wq, wv in (
            (f"{g}_hip_joint", 6.0, 0.05),
            (f"{g}_thigh_joint", 6.0, 0.05),
            (f"{g}_calf_joint", 4.0, 0.05),
        ):
            o = offs[nm]
            Q[o] = wq
            Q[o + 1] = wv
    nu = 12
    R = np.full(nu, 2e-3)
    return QuadCost(
        Q=jnp.asarray(Q), R=jnp.asarray(R), Qf=jnp.asarray(2.0 * Q),
        y_goal=jnp.zeros(ny),  # overridden at call time by `goals`
    )


def actuated_indices(mech):
    """Packed-input indices of the 12 revolute leg joints (trunk unactuated
    — reference input_map, quadruped_waypoint.jl:55-58)."""
    idx = []
    off = 0
    topo = mech.topo
    name_of = {j: n for n, j in mech.joint_index.items()}
    for j in range(topo.nj):
        n_free = topo.tra_nfree[j] + topo.rot_nfree[j]
        if name_of[j] != "floating_base":
            idx.extend(range(off, off + n_free))
        off += n_free
    return np.asarray(idx, dtype=np.int32)


def make_trot_mpc(mech, horizon=40, spec: TrotSpec = TrotSpec(),
                  config: ILQRConfig = ILQRConfig(iterations=2),
                  opts: SolverOptions = SolverOptions(
                      rtol=1e-4, btol=1e-3, max_iter=16),
                  dt=None, linsolve: str = "auto"):
    """Receding-horizon trot controller for the quadruped.

    Returns (mpc, ref_fn):
      mpc(params, y, us_warm, goals) → (u0, us_next, cost)  — one MPC solve,
        the north-star benchmark unit; jit + vmap over scenarios.
      ref_fn(t0) → (H+1, ny) gait reference starting at phase t0.
    """
    dt = float(mech.params.timestep) if dt is None else dt
    cost = trot_cost(mech)
    act = actuated_indices(mech)
    mpc = make_mpc_controller(
        mech.topo, cost, horizon, config=config, opts=opts, act_idx=act,
        linsolve=linsolve,
    )

    def ref_fn(t0):
        return trot_reference(mech, t0, horizon, dt, spec)

    return mpc, ref_fn


class TrotGains(NamedTuple):
    """Runtime tuning data for the trot controller (make_ilqr_rt surface):
    swept on hardware by scripts/tune_trot.py without recompiling."""

    Qd: jnp.ndarray  # (ny,) stage cost diagonal, or (H+1, ny) schedule
    Rd: jnp.ndarray  # (nu,)
    Qfd: jnp.ndarray  # (ny,) terminal
    reg: jnp.ndarray  # Quu Levenberg shift
    du_max: jnp.ndarray  # elementwise control-update clamp [N·m]
    # feedforward gait-torque gain [N·m/rad]: u_ff = kff·(q_ref − q_stand)
    # per actuated joint — biases the warm control sequence toward the
    # swing motion so a single accepted α-step per control step is enough
    # to track the gait (r4 finding: at ITERS=1 the line search closes the
    # tracking gap too slowly to locomote without it)
    kff: jnp.ndarray = np.float32(0.0)


def trot_gains(mech, pos_x=0.0, vx_w=8.0, joint_w=1.0, reg=10.0,
               du_max=1e9, r_mul=1.0, kff=0.0, dtype=None):
    """Tuned runtime gains: velocity-style base tracking by default (the
    base x-position weight rides to zero — a growing position error along
    the horizon otherwise dominates the cost and drives the Riccati gains
    into the contact-infeasible regime)."""
    import numpy as _np

    cost = trot_cost(mech)
    Q = _np.asarray(cost.Q, _np.float64).copy()
    # derive offsets from the minimal-vector layout like trot_cost does
    # (hard-coded 0/6/12 silently mis-weights if the layout ever changes)
    b = _layout(mech)["floating_base"]
    joint_mask = _np.ones(len(Q), bool)
    joint_mask[b : b + 12] = False
    Q[b + 0] = pos_x
    Q[b + 6] = vx_w
    Q[joint_mask] *= joint_w
    R = _np.asarray(cost.R, _np.float64) * r_mul
    dtype = dtype or mech.params.mass.dtype
    return TrotGains(
        Qd=jnp.asarray(Q, dtype), Rd=jnp.asarray(R, dtype),
        Qfd=jnp.asarray(2.0 * Q, dtype), reg=jnp.asarray(reg, dtype),
        du_max=jnp.asarray(du_max, dtype), kff=jnp.asarray(kff, dtype),
    )


def _ff_layout(mech, spec: TrotSpec):
    """(cols, stand): per actuated-u index, the minimal position column of
    its joint and the standing angle — the gait feedforward pattern
    u_ff[k, i] = kff·(goals[k, cols[i]] − stand[i])."""
    offs = _layout(mech)
    name_of = {j: n for n, j in mech.joint_index.items()}
    cols, stand = [], []
    for j in range(mech.topo.nj):
        name = name_of[j]
        if name == "floating_base":
            continue
        cols.append(offs[name])
        if name.endswith("_thigh_joint"):
            stand.append(spec.thigh_stand)
        elif name.endswith("_calf_joint"):
            stand.append(spec.calf_stand)
        else:
            stand.append(0.0)  # hips reference 0
    return np.asarray(cols, np.int32), np.asarray(stand, np.float64)


def trot_weight_schedule(mech, t0, horizon, dt, spec: TrotSpec,
                         Qd, swing_scale=1.0, stance_scale=1.0):
    """(H+1, ny) per-knot stage-weight schedule: each leg's thigh/calf
    POSITION weights scale between stance_scale (foot loaded — don't fight
    the contact for joint position) and swing_scale (foot in flight —
    track the swing trajectory hard).  Runtime data for make_ilqr_rt /
    make_rti_rt (Qd broadcasting); swing/stance windows follow the same
    sin(φ) phase as trot_reference."""
    ny = mech.topo.minimal_dim
    offs = _layout(mech)
    t = t0 + dt * jnp.arange(horizon + 1)
    phi = 2.0 * jnp.pi * t / spec.period
    Qs = jnp.broadcast_to(jnp.asarray(Qd), (horizon + 1, ny))
    for g in GROUPS:
        sw = jnp.maximum(jnp.sin(phi + PHASE[g]), 0.0)  # swing window
        scale = stance_scale + (swing_scale - stance_scale) * sw
        for nm in (f"{g}_thigh_joint", f"{g}_calf_joint"):
            o = offs[nm]
            Qs = Qs.at[:, o].mul(scale)
    return Qs


def trot_spring_params(mech, springs=40.0, dampers=4.0,
                       stand=(-0.001, 0.818, -1.438)):
    """Params with joint springs/dampers on the 12 leg joints and
    GRAVITY-BIASED spring offsets: the default `stand` is the measured
    offset triple (scripts/rest_pose_probe.py, k=40 on hardware) that
    makes the standing pose the LOADED equilibrium — offset =
    2·stand − rest, since k(stand − rest) equals the gravity torque at
    rest.  The reference's own quadruped behavior anchor stabilizes the
    stance with joint springs (test/behaviors.jl:1-19: springs=30,
    dampers=1000 passive standing); here the spring holds the stance while
    the MPC modulates around it — and springs/dampers/offsets are runtime
    Params, so sweeping them never recompiles."""
    params = mech.params
    dtype = params.mass.dtype
    rs = np.zeros(mech.topo.nj, np.float64)
    rd = np.zeros(mech.topo.nj, np.float64)
    off = np.asarray(params.rot_spring_offset, np.float64).copy()
    hip, thigh, calf = stand
    for name, j in mech.joint_index.items():
        if name == "floating_base":
            continue
        rs[j], rd[j] = springs, dampers
        if name.endswith("_hip_joint"):
            off[j, 0] = hip
        elif name.endswith("_thigh_joint"):
            off[j, 0] = thigh
        elif name.endswith("_calf_joint"):
            off[j, 0] = calf
    return params._replace(
        rot_spring=jnp.asarray(rs, dtype),
        rot_damper=jnp.asarray(rd, dtype),
        rot_spring_offset=jnp.asarray(off, dtype),
    )


def make_trot_rt(mech, horizon=40, spec: TrotSpec = TrotSpec(),
                 opts: SolverOptions = SolverOptions(
                     rtol=1e-4, btol=1e-3, max_iter=16),
                 dt=None, alphas=(1.0, 0.5, 0.25, 0.1), iterations=1,
                 linsolve: str = "auto"):
    """Trot controller over the runtime-tunable iLQR (make_mpc_rt).

    Returns (mpc, ref_fn, gains):
      mpc(params, y, dus_warm, goals, *gains) → (u0, dus_next, cost, okf)
      ref_fn(t0) → (H+1, ny) gait reference
      gains: TrotGains defaults (pass `gains._replace(...)` variants or
        sweep them — they are traced arguments, never recompiled).
    The carried control sequence is the DEVIATION from the gait
    feedforward u_ff = kff·(q_ref − q_stand): the warm start then shifts
    consistently with the advancing gait phase, and kff=0 reproduces the
    plain warm-start semantics exactly.  Pair with trot_spring_params(mech)
    for the spring-held stance.
    """
    from .ilqr import make_ilqr_rt

    dt = float(mech.params.timestep) if dt is None else dt
    act = actuated_indices(mech)
    ilqr_rt = make_ilqr_rt(mech.topo, horizon, opts, act_idx=act,
                           alphas=alphas, iterations=iterations,
                           linsolve=linsolve)
    cols, stand = _ff_layout(mech, spec)

    def mpc(params, y, dus_warm, goals, Qd, Rd, Qfd, reg, du_max, kff):
        stand_t = jnp.asarray(stand, y.dtype)
        us_ff = kff * (goals[:horizon, cols] - stand_t[None])
        us, ys, c, okf = ilqr_rt(
            params, y, dus_warm + us_ff, goals, Qd, Rd, Qfd, reg, du_max
        )
        dus = us - us_ff
        dus_next = jnp.concatenate([dus[1:], dus[-1:]], axis=0)
        return us[0], dus_next, c, okf

    def ref_fn(t0):
        return trot_reference(mech, t0, horizon, dt, spec)

    return mpc, ref_fn, trot_gains(mech)


def make_trot_rt2(mech, horizon=40, spec: TrotSpec = TrotSpec(),
                  opts: SolverOptions = SolverOptions(
                      rtol=1e-4, btol=1e-3, max_iter=16),
                  dt=None, alphas=(1.0, 0.5, 0.25), iterations=1,
                  linsolve: str = "auto"):
    """Trot controller over the carried-trajectory runtime-gains MPC
    (make_rti_rt): linearize at the PREVIOUS accepted forward pass (zero
    re-rollout contact solves), line-searched forward — H sequential
    solves per control step instead of make_trot_rt's 2H.

    Returns (init, mpc, ref_fn, gains):
      init(params, y0, goals, *gains) → (RTIState, cost, okf)
      mpc(params, y, st, goals, *gains) → (u0, st2, cost, okf)
      ref_fn(t0) → (H+1, ny) gait reference.
    The newly revealed terminal knot of each shift takes the gait
    feedforward u_ff[H−1] as its control (kff=0 → repeat-last).
    """
    from .ilqr import make_rti_rt

    dt = float(mech.params.timestep) if dt is None else dt
    act = actuated_indices(mech)
    rti_init, rti_mpc = make_rti_rt(
        mech.topo, horizon, opts, act_idx=act, alphas=alphas,
        iterations=iterations, linsolve=linsolve,
    )
    cols, stand = _ff_layout(mech, spec)

    def us_ff_of(goals, kff, dtype):
        stand_t = jnp.asarray(stand, dtype)
        return kff * (goals[:horizon, cols] - stand_t[None])

    def init(params, y0, goals, Qd, Rd, Qfd, reg, du_max, kff):
        us0 = us_ff_of(goals, kff, y0.dtype)
        return rti_init(params, y0, us0, goals, Qd, Rd, Qfd, reg, du_max)

    def mpc(params, y, st, goals, Qd, Rd, Qfd, reg, du_max, kff):
        u_last = us_ff_of(goals, kff, y.dtype)[-1]
        return rti_mpc(params, y, st, goals, Qd, Rd, Qfd, reg, du_max,
                       u_last)

    def ref_fn(t0):
        return trot_reference(mech, t0, horizon, dt, spec)

    return init, mpc, ref_fn, trot_gains(mech)


def make_trot_rti(mech, horizon=40, spec: TrotSpec = TrotSpec(),
                  config: ILQRConfig = ILQRConfig(alphas=(1.0,)),
                  opts: SolverOptions = SolverOptions(
                      rtol=1e-4, btol=1e-3, max_iter=12, rescue=False),
                  dt=None, linsolve: str = "auto"):
    """Real-time-iteration trot controller: one linearize + Riccati +
    forward rollout per control step (H sequential contact solves instead of
    make_trot_mpc's 2H+1 — see mpc/ilqr.py make_rti_mpc).

    Returns (init, mpc, ref_fn):
      init(params, y0, us_init, goals) → RTIState
      mpc(params, y, state, goals) → (u0, state2, cost, okf)
      ref_fn(t0) → (H+1, ny) gait reference starting at phase t0.
    """
    dt = float(mech.params.timestep) if dt is None else dt
    cost = trot_cost(mech)
    act = actuated_indices(mech)
    init, mpc = make_rti_mpc(
        mech.topo, cost, horizon, config=config, opts=opts, act_idx=act,
        linsolve=linsolve,
    )

    def ref_fn(t0):
        return trot_reference(mech, t0, horizon, dt, spec)

    return init, mpc, ref_fn
