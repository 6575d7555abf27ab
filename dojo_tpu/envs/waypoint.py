"""Waypoint-tracking environments (reference environments/{quadruped_waypoint,
quadruped_sampling,quadrotor_waypoint,uuv_waypoint,youbot_waypoint}.jl).

Rotor-driven vehicles map RPM commands to floating-base wrenches (the
reference's rpm_to_force_torque); the youbot maps mecanum wheel speeds to a
base twist.  All input maps are pure functions, so these environments batch
under vmap like everything else.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import lie, models
from ..core import SolverOptions
from .base import Environment


def _rot(angle, axis):
    q = np.zeros(4)
    q[0] = np.cos(angle / 2)
    q[axis + 1] = np.sin(angle / 2)
    return jnp.asarray(q)


class QuadrupedWaypoint(Environment):
    """A1 quadruped waypoint tracking (environments/quadruped_waypoint.jl)."""

    model_name = "quadruped"

    def __init__(self, horizon=200, timestep=0.001, gravity=-9.81,
                 springs=25.0, dampers=2.0, waypoints=((0.5, 0.5), (1, 0), (0.5, -0.5), (0, 0)),
                 **kw):
        mech = models.get_mechanism(
            "quadruped", timestep=timestep, gravity=gravity,
            parse_springs=False, parse_dampers=False, springs=springs,
            dampers=dampers,
        )
        self.waypoints = jnp.asarray(waypoints, dtype=float)
        super().__init__(mech, horizon, **kw)

    def input_map(self, u):
        if u is None:
            return jnp.zeros(self.mech.input_dim)
        return jnp.concatenate([jnp.zeros(6), jnp.asarray(u)])  # trunk passive

    # waypoint progression: the base advances through the waypoint list,
    # switching to the next when within `wp_radius` of the current one
    # (the reference's waypoints are visualization-only,
    # quadruped_waypoint.jl:77-101; the tracking reward is our RL-facing
    # extension over the same waypoint list).  The index is traced aux
    # state threaded through step()/make_scan_step() — per-lane data under
    # vmap, never a Python attribute.
    wp_radius = 0.15

    def aux_reset(self):
        return jnp.asarray(0, jnp.int32)

    def aux_update(self, aux, y2):
        d = jnp.linalg.norm(y2[:2] - self.waypoints[aux])
        advance = (d < self.wp_radius) & (aux < len(self.waypoints) - 1)
        return aux + advance.astype(aux.dtype)

    def reward(self, y, u, y2, info, aux=None):
        i = 0 if aux is None else aux
        return -jnp.linalg.norm(y2[:2] - self.waypoints[i])


class QuadrupedSampling(QuadrupedWaypoint):
    """Sampling-based control variant (environments/quadruped_sampling.jl) —
    same mechanism/input map, coarser timestep."""

    def __init__(self, horizon=100, timestep=0.05, **kw):
        super().__init__(horizon=horizon, timestep=timestep, **kw)


class QuadrotorWaypoint(Environment):
    """Pelican quadrotor with RPM inputs (environments/quadrotor_waypoint.jl).

    rpm → per-rotor thrust/drag torque → base wrench applied as the floating
    joint's 6-dim input (force_factor 1e-3, torque_factor 1e-4).
    """

    model_name = "quadrotor"

    def __init__(self, horizon=100, timestep=0.01, gravity=-9.81, **kw):
        mech = models.get_mechanism(
            "quadrotor", timestep=timestep, gravity=gravity,
            urdf="pelican_fixed_rotors",
        )
        super().__init__(mech, horizon, **kw)
        qy = _rot(-np.pi / 2, 1)
        self._orients = jnp.stack([qy, qy, qy, qy])
        self._dirs = jnp.asarray([1.0, -1.0, 1.0, -1.0])
        self._verts = jnp.asarray(
            [[0.21, 0, 0.05], [0, 0.21, 0.05], [-0.21, 0, 0.05], [0, -0.21, 0.05]]
        )
        self._ff, self._tf = 1e-3, 1e-4

    def wrench_from_rpms(self, rpms, q):
        rpms = jnp.asarray(rpms)
        f_loc = jnp.stack(
            [jnp.sign(rpms) * self._ff * rpms**2,
             jnp.zeros_like(rpms), jnp.zeros_like(rpms)], axis=-1,
        )
        t_loc = jnp.stack(
            [jnp.sign(rpms) * self._dirs * self._tf * rpms**2,
             jnp.zeros_like(rpms), jnp.zeros_like(rpms)], axis=-1,
        )
        forces = jnp.stack([lie.rotate(f_loc[i], self._orients[i]) for i in range(4)])
        torques = jnp.stack([lie.rotate(t_loc[i], self._orients[i]) for i in range(4)])
        t_from_f = jnp.cross(self._verts, forces)
        force = lie.rotate(jnp.sum(forces, axis=0), q)
        torque = lie.rotate(jnp.sum(torques + t_from_f, axis=0), q)
        return jnp.concatenate([force, torque])

    def step(self, y, u=None, aux=None):
        y = jnp.asarray(y)
        state = self.mech.maximal_state(y)
        base = self.mech.body_index.get("base_link", 0)
        wrench = (
            self.wrench_from_rpms(u, state.q[base])
            if u is not None
            else jnp.zeros(6)
        )
        up = jnp.concatenate([wrench, jnp.zeros(self.mech.input_dim - 6)])
        y2, info = self._raw_step()(y, up)
        out = (y2, self.reward(y, up, y2, info), self.is_done(y2), info)
        return out if aux is None else out + (aux,)

    def reward(self, y, u, y2, info, aux=None):
        return -jnp.linalg.norm(y2[:3] - jnp.asarray([1.0, 1.0, 0.3]))


class UUVWaypoint(QuadrotorWaypoint):
    """Mini-Tortuga UUV: 6 thrusters + buoyancy (environments/uuv_waypoint.jl)."""

    model_name = "uuv"

    # buoyancy: constant world-frame up-force (slightly more than weight,
    # uuv_waypoint.jl:173 buoyancy! — 19.5·9.81 N) applied at a center of
    # buoyancy 0.2 m above the COM, giving a body-frame righting torque
    buoyancy_force = 19.5 * 9.81
    buoyancy_center = (0.0, 0.0, 0.2)

    def __init__(self, horizon=100, timestep=0.01, gravity=-9.81, **kw):
        mech = models.get_mechanism("uuv", timestep=timestep, gravity=gravity)
        Environment.__init__(self, mech, horizon, **kw)
        qz4, qzm4, qym2 = _rot(np.pi / 4, 2), _rot(-np.pi / 4, 2), _rot(-np.pi / 2, 1)
        self._orients = jnp.stack([qz4, qzm4, qzm4, qz4, qym2, qym2])
        self._dirs = jnp.asarray([1.0, 1.0, -1.0, -1.0, 1.0, -1.0])
        self._verts = jnp.asarray(
            [
                [0.14, -0.09, 0.059], [0.14, 0.09, 0.059],
                [-0.14, -0.09, 0.059], [-0.14, 0.09, 0.059],
                [0, -0.0855, 0.165], [0, 0.0855, 0.165],
            ]
        )
        self._ff, self._tf = 1e-2, 1e-3

    def external_forces(self, state):
        """Buoyancy on base_link (uuv_waypoint.jl:93,173): fext is the
        world-frame up-force, text the body-frame torque r_cb × f_body."""
        base = self.mech.body_index.get("base_link", 0)
        nb = state.x.shape[0]
        dtype = state.x.dtype
        f_world = jnp.asarray([0.0, 0.0, self.buoyancy_force], dtype)
        f_body = lie.rotate_inv(f_world, state.q[base])
        t_body = jnp.cross(jnp.asarray(self.buoyancy_center, dtype), f_body)
        fext = jnp.zeros((nb, 3), dtype).at[base].set(f_world)
        text = jnp.zeros((nb, 3), dtype).at[base].set(t_body)
        return fext, text

    def wrench_from_rpms(self, rpms, q):
        rpms = jnp.asarray(rpms)
        n = rpms.shape[0]
        f_loc = jnp.stack(
            [jnp.sign(rpms) * self._ff * rpms**2,
             jnp.zeros_like(rpms), jnp.zeros_like(rpms)], axis=-1,
        )
        t_loc = jnp.stack(
            [jnp.sign(rpms) * self._dirs * self._tf * rpms**2,
             jnp.zeros_like(rpms), jnp.zeros_like(rpms)], axis=-1,
        )
        forces = jnp.stack([lie.rotate(f_loc[i], self._orients[i]) for i in range(n)])
        torques = jnp.stack([lie.rotate(t_loc[i], self._orients[i]) for i in range(n)])
        t_from_f = jnp.cross(self._verts, forces)
        force = lie.rotate(jnp.sum(forces, axis=0), q)
        torque = lie.rotate(jnp.sum(torques + t_from_f, axis=0), q)
        return jnp.concatenate([force, torque])


class YoubotWaypoint(Environment):
    """Omnidirectional youbot base via mecanum-wheel map
    (environments/youbot_waypoint.jl input_map)."""

    model_name = "youbot"

    def __init__(self, horizon=100, timestep=0.01, gravity=-9.81, **kw):
        mech = models.get_mechanism("youbot", timestep=timestep, gravity=gravity)
        super().__init__(mech, horizon, **kw)
        l, w = 0.456, 0.316
        self._H = jnp.asarray(
            [[1, -1, -l - w], [1, 1, l + w], [1, 1, -l - w], [1, -1, l + w]],
            dtype=float,
        )

    def input_map(self, u):
        dim = self.mech.input_dim
        if u is None:
            return jnp.zeros(dim)
        u = jnp.asarray(u, dtype=float)
        wheel = u[:4]
        base = jnp.linalg.lstsq(self._H, wheel)[0] / 10.0
        rest = u[4:]
        out = jnp.zeros(dim)
        out = out.at[: base.shape[0]].set(base)
        n = min(int(rest.shape[0]), dim - 3)
        if n > 0:
            out = out.at[3 : 3 + n].set(rest[:n])
        return out
