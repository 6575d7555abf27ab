"""Static block-elimination schedule over the mechanism graph.

TPU-native rebuild of the reference's graph-sparse LDU solver
(external pkg GraphBasedSystems.jl, used at src/solver/mehrotra.jl:36-49 and
src/gradients/state.jl:95-96; O(n) for kinematic trees, arXiv:2109.07262).

The reference factorizes a pointer-based block-sparse system leaves-to-root.
Here the whole factorization is compiled to a *static schedule* at build
time: node/edge blocks live in one dense (batch, slots, W, W) array, and
each elimination level is a batched gather → einsum → scatter-add, so a
factorization is ~2·depth fused TPU ops regardless of batch size (vs. an
unblocked dense LU whose latency scales with the full KKT dimension).

System nodes mirror the reference System (src/mechanism/system.jl:15-51):
bodies (6 velocity rows), joints (impulse rows), contacts (impulse rows).
Edges: joint–body and contact–body couplings plus direct body–body edges
from damper coupling and body-body collisions — the same off-diagonal set
as the reference's `off_diagonal_jacobians` (src/joints/constraints.jl:
208-293, src/contacts/constraints.jl:34-55).  Fill edges from symbolic
elimination are added statically.

Mechanisms with kinematic loops (fourbar) keep the reference semantics via
the dense fallback (reference appends loop joints with cyclic-entry
handling, src/mechanism/traversal.jl:33-77; loops are rare and small).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .core import Topology


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Static elimination schedule (all numpy, hashable by identity)."""

    n_nodes: int
    n_slots: int  # diag slots (= n_nodes) + directed edge slots
    width: int  # common padded block width W
    node_width: np.ndarray  # (N,) real width per node
    node_offset: np.ndarray  # (N,) offset of node vars in w
    # gather maps for extracting blocks from the dense Jacobian
    rows: np.ndarray  # (S, W) row index into padded J (dim row = pad)
    cols: np.ndarray  # (S, W)
    pad_eye: np.ndarray  # (S, W, W) identity on pad dims of diag slots
    # per level: elimination ops
    levels: tuple  # tuple of LevelOps
    order: tuple  # node elimination order (for reference/debug)
    # w-vector gather/scatter for rhs
    vec_idx: np.ndarray  # (N, W) index into padded rhs vector
    vec_valid: np.ndarray  # (N, W) 1.0 where real
    slot: dict = None  # (a, b) directed node pair -> block slot
    real_diag: np.ndarray = None  # (S, W, W) identity on real diag dims

    def __hash__(self):  # id-hash: schedules are built once per topology
        return id(self)

    def __eq__(self, other):
        return self is other


@dataclasses.dataclass(frozen=True)
class LevelOps:
    nodes: np.ndarray  # (k,) node ids eliminated at this level
    real_w: int  # max real block width among this level's nodes
    # Schur updates E[t] -= E[a,i] @ Dinv[i] @ E[i,b]
    upd_ai: np.ndarray  # (m,) slot of E_{a,i}
    upd_inv: np.ndarray  # (m,) node id i (index into Dinv storage)
    upd_ib: np.ndarray  # (m,) slot of E_{i,b}
    upd_tgt: np.ndarray  # (m,) slot of E_{a,b} (target, scatter-add)
    # forward solve: b_a -= E_{a,i} @ (Dinv_i b_i)
    fwd_ai: np.ndarray  # (f,) slot of E_{a,i}
    fwd_i: np.ndarray  # (f,) node i
    fwd_a: np.ndarray  # (f,) node a (target, scatter-add)
    # backward solve: x_i = Dinv_i (b_i - sum_a E_{i,a} x_a)
    bwd_ia: np.ndarray  # (g,) slot of E_{i,a}
    bwd_i: np.ndarray  # (g,) node i (target, scatter-add)
    bwd_a: np.ndarray  # (g,) node a


def _system_nodes(topo: Topology):
    """Node table: bodies, joints, contacts with widths and w-offsets."""
    widths, offsets = [], []
    for b in range(topo.nb):
        widths.append(6)
        offsets.append(6 * b)
    for j in range(topo.nj):
        widths.append(topo.jw)
        offsets.append(topo.joint_off + j * topo.jw)
    for c in range(topo.nc):
        widths.append(topo.cw)
        offsets.append(topo.contact_off + c * topo.cw)
    return np.asarray(widths), np.asarray(offsets)


def build_schedule(topo: Topology):
    """Compute the static elimination schedule, or None → dense fallback.

    Returns None for graphs the leaves-first order can't handle exactly:
    kinematic loops (a joint whose parent AND child were both already
    reached — reference get_loop_joints, traversal.jl:33-77).
    """
    nb, nj, nc = topo.nb, topo.nj, topo.nc
    N = nb + nj + nc
    if N == 0 or nb == 0:
        return None
    jnode = lambda j: nb + j
    cnode = lambda c: nb + nj + c

    # ---- structural edges -------------------------------------------------
    edges = set()

    def add_edge(a, b):
        if a != b:
            edges.add((min(a, b), max(a, b)))

    for j in range(topo.nj):
        p, c = topo.joint_parent[j], topo.joint_child[j]
        if p >= 0:
            add_edge(jnode(j), p)
            add_edge(p, c)  # damper body-body coupling (constraints.jl:208)
        add_edge(jnode(j), c)
    for c in range(topo.nc):
        p, ch = topo.contact_parent[c], topo.contact_child[c]
        add_edge(cnode(c), p)
        if ch >= 0:
            add_edge(cnode(c), ch)
            add_edge(p, ch)  # pair-collision body-body coupling

    # ---- root-to-leaves DFS over system nodes (traversal.jl:11-31) -------
    visited_b = [False] * nb
    visited_j = [False] * nj
    preorder = []
    loopy = False

    def visit_body(b):
        preorder.append(b)
        visited_b[b] = True
        for c in range(nc):
            if topo.contact_parent[c] == b and topo.contact_child[c] < 0:
                preorder.append(cnode(c))
        for j in range(nj):
            if not visited_j[j] and topo.joint_parent[j] == b:
                visit_joint(j)

    def visit_joint(j):
        nonlocal loopy
        visited_j[j] = True
        preorder.append(jnode(j))
        c = topo.joint_child[j]
        if visited_b[c]:
            loopy = True
            return
        visit_body(c)

    for j in range(nj):
        if topo.joint_parent[j] == -1 and not visited_j[j]:
            visit_joint(j)
    if loopy or not all(visited_b) or not all(visited_j):
        return None  # loops / disconnected bodies → dense fallback
    # pair contacts (child >= 0) eliminated first of all
    pair_contacts = [cnode(c) for c in range(nc) if topo.contact_child[c] >= 0]
    order = pair_contacts + list(reversed(preorder))

    # ---- symbolic elimination: fill + levels + update lists ---------------
    pos = {n: k for k, n in enumerate(order)}
    neigh = {n: set() for n in range(N)}
    for a, b in edges:
        neigh[a].add(b)
        neigh[b].add(a)
    level = {}
    elim_updates = {}  # node -> list of (a, b) remaining-neighbor pairs
    remaining_at = {}  # node -> sorted remaining neighbors at elimination
    for i in order:
        rem = sorted(n for n in neigh[i] if pos[n] > pos[i])
        done = [n for n in neigh[i] if pos[n] < pos[i]]
        level[i] = 1 + max((level[d] for d in done), default=-1)
        remaining_at[i] = rem
        pairs = []
        for a in rem:
            for b in rem:
                pairs.append((a, b))
                if a < b:
                    add_edge(a, b)  # fill
                    neigh[a].add(b)
                    neigh[b].add(a)
        elim_updates[i] = pairs

    widths, offsets = _system_nodes(topo)
    W = int(widths.max())
    dim = topo.dim

    # ---- slot table: diagonals then directed edges ------------------------
    slot = {}
    for n in range(N):
        slot[(n, n)] = n
    s = N
    for a, b in sorted(edges):
        slot[(a, b)] = s
        slot[(b, a)] = s + 1
        s += 2
    S = s

    rows = np.full((S, W), dim, dtype=np.int32)
    cols = np.full((S, W), dim, dtype=np.int32)
    pad_eye = np.zeros((S, W, W), dtype=np.float64)
    for (a, b), si in slot.items():
        wa, wb = widths[a], widths[b]
        rows[si, :wa] = offsets[a] + np.arange(wa)
        cols[si, :wb] = offsets[b] + np.arange(wb)
        if a == b:
            for k in range(wa, W):
                pad_eye[si, k, k] = 1.0

    # ---- level op lists ----------------------------------------------------
    max_level = max(level.values())
    levels = []
    for L in range(max_level + 1):
        nodes_L = [i for i in order if level[i] == L]
        upd_ai, upd_inv, upd_ib, upd_tgt = [], [], [], []
        fwd_ai, fwd_i, fwd_a = [], [], []
        bwd_ia, bwd_i, bwd_a = [], [], []
        for i in nodes_L:
            for a, b in elim_updates[i]:
                upd_ai.append(slot[(a, i)])
                upd_inv.append(i)
                upd_ib.append(slot[(i, b)])
                upd_tgt.append(slot[(a, b)])
            for a in remaining_at[i]:
                fwd_ai.append(slot[(a, i)])
                fwd_i.append(i)
                fwd_a.append(a)
                bwd_ia.append(slot[(i, a)])
                bwd_i.append(i)
                bwd_a.append(a)
        ar = lambda x: np.asarray(x, dtype=np.int32)
        levels.append(
            LevelOps(
                nodes=ar(nodes_L),
                real_w=int(max(widths[i] for i in nodes_L)),
                upd_ai=ar(upd_ai), upd_inv=ar(upd_inv),
                upd_ib=ar(upd_ib), upd_tgt=ar(upd_tgt),
                fwd_ai=ar(fwd_ai), fwd_i=ar(fwd_i), fwd_a=ar(fwd_a),
                bwd_ia=ar(bwd_ia), bwd_i=ar(bwd_i), bwd_a=ar(bwd_a),
            )
        )

    vec_idx = np.full((N, W), dim, dtype=np.int32)
    vec_valid = np.zeros((N, W), dtype=np.float64)
    for n in range(N):
        vec_idx[n, : widths[n]] = offsets[n] + np.arange(widths[n])
        vec_valid[n, : widths[n]] = 1.0

    real_diag = np.zeros((S, W, W), dtype=np.float64)
    for n in range(N):
        for k in range(widths[n]):
            real_diag[n, k, k] = 1.0

    return Schedule(
        slot=slot,
        real_diag=real_diag,
        n_nodes=N,
        n_slots=S,
        width=W,
        node_width=widths,
        node_offset=offsets,
        rows=rows,
        cols=cols,
        pad_eye=pad_eye,
        levels=tuple(levels),
        order=tuple(order),
        vec_idx=vec_idx,
        vec_valid=vec_valid,
    )
