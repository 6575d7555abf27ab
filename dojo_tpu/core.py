"""Core data model: static topology, parameter pytree, body state.

TPU-native translation of the reference's graph-of-typed-objects design
(reference: src/mechanism/constructor.jl:19-111, src/bodies/state.jl:25-69):

* ``Topology`` — hashable static metadata (counts, index maps, pad widths).
  Plays the role of the reference's ``Mechanism{T,Nn,Ne,Nb,Ni}`` type
  parameters: everything that fixes array *shapes* at trace time.
* ``Params`` — a pytree of dense arrays holding every differentiable model
  parameter (mass, inertia, joint geometry, contact parameters, gravity,
  timestep).  This is the analog of the reference's ``get_data/set_data!``
  vector (src/mechanism/data.jl) — but as a first-class pytree, so system
  identification gradients come from AD instead of hand-written
  data-Jacobians (src/gradients/data.jl).
* ``BodyState`` — struct-of-arrays maximal state (x2, q2, v15, ω15),
  one row per body.  13 numbers per body as in the reference.

All 16 joint prototypes (src/joints/prototypes.jl) reduce to one masked
joint kernel: a joint is two sub-joints (translational, rotational), each
with a constraint mask (rows of constrained axes) and nullspace mask
(rows of free axes), padded to 3x3.  Joint-limit slots are padded to a
per-mechanism static width ``maxlim`` per sub-joint.

Solver variable layout (one flat vector w, dimension ``Topology.dim``):

  [ body 0: v25(3) ω25(3) | body 1: ... |
    joint 0: tra[s_up(ML) s_lo(ML) γ_up(ML) γ_lo(ML) λ(3)] rot[...] | ... |
    contact 0: s(CW/2) γ(CW/2) | ... ]

mirroring the reference's per-node blocks (bodies: vsol/ωsol, joints:
impulses [s;γ;λ] per sub-joint, contacts: [impulses_dual; impulses]).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Jacobian regularization, load-bearing (reference: src/Dojo.jl:4 REG=1e-10).
REG = 1.0e-10

CONTACT_KINDS = ("nonlinear", "linear", "impact")

# contact block width per kind: [s; γ], reference impact.jl N=2,
# nonlinear.jl N=8, linear.jl N=12.
CONTACT_WIDTH = {"nonlinear": 8, "linear": 12, "impact": 2}


@dataclasses.dataclass(frozen=True)
class Topology:
    """Static (hashable) mechanism metadata; fixes all shapes at trace time."""

    nb: int  # number of bodies (origin excluded)
    nj: int  # number of joints
    nc: int  # number of contacts
    maxlim: int  # joint-limit pad width per sub-joint (ML)
    cw: int  # contact block width (padded over contact kinds)

    joint_parent: tuple  # body index per joint, -1 = origin
    joint_child: tuple
    contact_parent: tuple  # body index per contact
    contact_child: tuple  # -1 = world (halfspace)
    contact_kind: tuple  # per contact: 'nonlinear' | 'linear' | 'impact'

    tra_nfree: tuple  # per joint: 3 - Nλ_tra (translational input dims)
    rot_nfree: tuple  # per joint: 3 - Nλ_rot

    root_to_leaves: tuple  # joint indices ordered root → leaves
    loop_joints: tuple = ()  # joints closing kinematic loops (fourbar)
    # collision pair geometry per contact:
    # 'halfspace' | 'sphere' | 'capsule' | 'box' | 'string'
    contact_geom: tuple = ()

    # ---- derived static sizes -------------------------------------------
    @property
    def sw(self) -> int:
        """Sub-joint block width: [s(2ML); γ(2ML); λ(3)]."""
        return 4 * self.maxlim + 3

    @property
    def jw(self) -> int:
        """Joint block width (translational + rotational sub-joints)."""
        return 2 * self.sw

    @property
    def body_off(self) -> int:
        return 0

    @property
    def joint_off(self) -> int:
        return 6 * self.nb

    @property
    def contact_off(self) -> int:
        return 6 * self.nb + self.nj * self.jw

    @property
    def dim(self) -> int:
        return 6 * self.nb + self.nj * self.jw + self.nc * self.cw

    @property
    def input_dim(self) -> int:
        return int(sum(self.tra_nfree) + sum(self.rot_nfree))

    @property
    def minimal_dim(self) -> int:
        return 2 * self.input_dim

    @property
    def maximal_dim(self) -> int:
        return 13 * self.nb

    def joint_slice(self, j):
        o = self.joint_off + j * self.jw
        return o, o + self.jw

    def contact_slice(self, c):
        o = self.contact_off + c * self.cw
        return o, o + self.cw


class Params(NamedTuple):
    """Differentiable model parameters (pytree).  One row per body/joint/contact."""

    # bodies
    mass: jax.Array  # (nb,)
    inertia: jax.Array  # (nb,3,3)

    # translational sub-joints
    tra_cmask: jax.Array  # (nj,3,3) constraint-mask rows, zero-padded
    tra_nmask: jax.Array  # (nj,3,3) nullspace-mask rows, zero-padded
    tra_lam_mask: jax.Array  # (nj,3) 1.0 where λ slot active
    tra_free_mask: jax.Array  # (nj,3) 1.0 where minimal coordinate exists
    tra_vertex_parent: jax.Array  # (nj,3)
    tra_vertex_child: jax.Array  # (nj,3)
    tra_spring: jax.Array  # (nj,)
    tra_damper: jax.Array  # (nj,)
    tra_spring_offset: jax.Array  # (nj,3)
    tra_lim_lo: jax.Array  # (nj,ML) lower limits of first ML minimal coords
    tra_lim_hi: jax.Array  # (nj,ML)
    tra_lim_mask: jax.Array  # (nj,ML) 1.0 where limit active

    # rotational sub-joints
    rot_cmask: jax.Array
    rot_nmask: jax.Array
    rot_lam_mask: jax.Array
    rot_free_mask: jax.Array
    rot_offset: jax.Array  # (nj,4) orientation_offset quaternion
    rot_spring: jax.Array
    rot_damper: jax.Array
    rot_spring_offset: jax.Array
    rot_lim_lo: jax.Array
    rot_lim_hi: jax.Array
    rot_lim_mask: jax.Array

    # contacts
    contact_friction: jax.Array  # (nc,)
    contact_normal: jax.Array  # (nc,3)
    contact_tangent: jax.Array  # (nc,2,3)
    contact_origin: jax.Array  # (nc,3)
    contact_radius: jax.Array  # (nc,)
    contact_offset: jax.Array  # (nc,3)
    contact_child_origin: jax.Array  # (nc,3) body-body collisions
    contact_child_radius: jax.Array  # (nc,)
    # per-geometry extras: capsule endpoints [a(3); b(3)], box sizes
    # [w,d,h,0,0,0], string max length [L,0,...]
    contact_aux: jax.Array  # (nc,6)

    # world
    gravity: jax.Array  # (3,)
    timestep: jax.Array  # ()


class BodyState(NamedTuple):
    """Maximal-coordinate state (reference State{T}, src/bodies/state.jl:25).

    x: position x2 (nb,3);  q: orientation q2 (nb,4);
    v: midpoint linear velocity v15 (nb,3);  w: midpoint angular velocity ω15.
    """

    x: jax.Array
    q: jax.Array
    v: jax.Array
    w: jax.Array

    def pack(self) -> jax.Array:
        """Flatten to the reference 13·Nb maximal vector [x v q ω]·Nb."""
        return jnp.concatenate([self.x, self.v, self.q, self.w], axis=-1).reshape(
            *self.x.shape[:-2], -1
        )

    @classmethod
    def unpack(cls, z: jax.Array, nb: int) -> "BodyState":
        z = z.reshape(*z.shape[:-1], nb, 13)
        return cls(x=z[..., 0:3], v=z[..., 3:6], q=z[..., 6:10], w=z[..., 10:13])


class SolverOptions(NamedTuple):
    """Interior-point solver options (reference src/solver/options.jl:16-26)."""

    rtol: float = 1.0e-6
    btol: float = 1.0e-4
    max_iter: int = 50
    max_ls: int = 10
    # μ floor is btol/undercut (mehrotra.jl:44).  Reference default is Inf
    # (no floor); a finite floor keeps cone pairs strictly interior so the
    # fraction-to-boundary step never collapses to zero — load-bearing for
    # float32, invisible at float64 test tolerances (floor = btol/10).
    # 10 (not 100): the gentler floor caps cone stiffness at ~btol⁻¹·10,
    # which keeps the float32 graph-LDU factorization usable through
    # persistent contact (floor btol/100 breaks it → dense-rescue cost).
    undercut: float = 10.0
    # force the graph LDU for float32 simulations by running its
    # factorization in (emulated) float64 instead of float32+refinement.
    # The block elimination has no inter-block pivoting (reference
    # GraphBasedSystems.jl semantics, which relies on Float64); with the
    # supernode amalgamation + per-block pivoted inverses the float32
    # factorization is a good preconditioner, and `refine` iterative-
    # refinement sweeps (residual via the exact block matvec) recover the
    # digits the unpivoted Schur chain loses — measured on the quadruped
    # KKT: f32 LDU+refine matches dense pivoted f32 LU to ~4e-5 at 6.7×
    # lower cost.  ldu_f64 stays as an escape hatch for pathological trees.
    ldu_f64: bool = False
    # iterative-refinement sweeps per linear solve on the float32 LDU path
    # (ignored at float64, where the block elimination is exact); 1 sweep
    # already matches the dense pivoted f32 LU to ~3e-5 on the quadruped KKT
    refine: int = 1
    no_progress_max: int = 3
    no_progress_undercut: float = 10.0
    # elementwise interior floor applied to carried-over cone pairs when a
    # step is warm-started from the previous solution (solver.init_w
    # w_prev path); no effect on cold (reference-semantics) solves
    warm_floor: float = 1e-2
    # compile the float32 dense-LU rescue pass that re-solves lanes where
    # the graph-LDU stalls (solver._solve).  Default on (simulation-grade
    # robustness); MPC-grade solves at loose tolerances turn it off to
    # halve compiled code — failures there are data, not errors
    rescue: bool = True
    # impact-onset warm-start re-centering (r4 postmortem, BENCH_r04: the
    # fully-warm chain fails at fresh contact activation — the carried
    # (γ≈0, s≈gap) pair is catastrophically off-center for the new active
    # contact and the f32 graph-LDU breaks on the resulting stiff system,
    # triggering the 11× dense-rescue second pass EVERY step).  With
    # warm_onset_margin ≥ 0, a warm-started step resets to the strictly
    # feasible NEUTRAL init exactly those contacts whose signed distance is
    # below the margin while their carried normal impulse is below
    # warm_onset_gamma — i.e. contacts about to activate.  Persistent
    # contacts keep the full warm start (the ~2× iteration win); flight
    # phases keep it too (sdf large).  Set margin < 0 to disable.
    warm_onset_margin: float = 0.05
    warm_onset_gamma: float = 0.1


def cone_index_sets(topo: Topology):
    """Static index arrays describing all cone slots of the w vector.

    Returns dict of numpy arrays:
      ort_s, ort_g      — positive-orthant pair indices into w
      ort_joint_slot    — (n_ort_joint, 2): owning (joint, limit-slot) of the
                          joint-limit pairs (to look up activity masks)
      soc_s, soc_g      — (n_soc, 3) second-order-cone triplets (nonlinear
                          contact friction cones)
    Contact ort/soc slots carry activity 1 (contacts are always active).
    Joint-limit slot activity is runtime (params.*_lim_mask).
    """
    ML, SW = topo.maxlim, topo.sw
    ort_s, ort_g, joint_slot = [], [], []
    for j in range(topo.nj):
        base = topo.joint_off + j * topo.jw
        for sub in range(2):  # 0 = tra, 1 = rot
            o = base + sub * SW
            for i in range(2 * ML):  # [s_up; s_lo] slots
                ort_s.append(o + i)
                ort_g.append(o + 2 * ML + i)
                joint_slot.append((j, sub, i % ML if ML else 0))
    n_joint_ort = len(ort_s)
    soc_s, soc_g = [], []
    for c in range(topo.nc):
        o = topo.contact_off + c * topo.cw
        kind = topo.contact_kind[c]
        nhalf = CONTACT_WIDTH[kind] // 2
        half = topo.cw // 2  # padded half-width: γ block starts at o + half
        if kind == "nonlinear":
            # slot 0: impact pair (ort); slots 1-3: friction SOC pair
            ort_s.append(o + 0)
            ort_g.append(o + half)
            soc_s.append([o + 1, o + 2, o + 3])
            soc_g.append([o + half + 1, o + half + 2, o + half + 3])
        else:
            for i in range(nhalf):
                ort_s.append(o + i)
                ort_g.append(o + half + i)
    return {
        "ort_s": np.asarray(ort_s, dtype=np.int32).reshape(-1),
        "ort_g": np.asarray(ort_g, dtype=np.int32).reshape(-1),
        "n_joint_ort": n_joint_ort,
        "joint_slot": np.asarray(joint_slot, dtype=np.int32).reshape(-1, 3),
        "soc_s": np.asarray(soc_s, dtype=np.int32).reshape(-1, 3),
        "soc_g": np.asarray(soc_g, dtype=np.int32).reshape(-1, 3),
    }


def joint_limit_activity(topo: Topology, params: Params) -> jax.Array:
    """Runtime activity (0/1) for each joint-limit ort pair, ordered as in
    cone_index_sets (joint-major, [tra, rot], [s_up(ML); s_lo(ML)])."""
    if topo.nj == 0 or topo.maxlim == 0:
        return jnp.zeros((0,), dtype=params.mass.dtype)
    tra = jnp.concatenate([params.tra_lim_mask, params.tra_lim_mask], axis=1)
    rot = jnp.concatenate([params.rot_lim_mask, params.rot_lim_mask], axis=1)
    return jnp.concatenate([tra, rot], axis=1).reshape(-1)  # (nj*4ML,)
