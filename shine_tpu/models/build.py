"""On-device batched HNSW construction (SURVEY.md §7.2 Phase 3).

The reference builds the index with per-vertex remote CAS spinlocks and a
global new-level lock so many coroutines can mutate the shared graph
concurrently (/root/reference/src/hnsw/hnsw.hh:40-251, rdma_atomics.hh).
XLA has no remote atomics, so construction is re-designed as *batched
insert rounds* (SURVEY.md §5.8):

  round r inserts a batch of B nodes against the graph built from all
  earlier rounds; within a round the B nodes do not see each other.
  Each node:
    1. greedy-descends from the entry point through levels above its own
       (reference search_for_one, hnsw.hh:331-393),
    2. runs an ef_construction beam search per level (search_level,
       hnsw.hh:406-476),
    3. selects M neighbors with the diversity heuristic
       (select_heuristic, hnsw.hh:482-522) — vectorized over the
       candidate tile via one pairwise-distance matmul + sequential
       masking scan,
    4. writes its own adjacency rows (conflict-free: each new node owns
       its rows — the analogue of write_neighborlist, rdma_writes.hh),
    5. emits reverse-edge requests (neighbor -> new node). These are the
       only write conflicts; they are resolved deterministically by
       sorting all (vertex, new_id) requests and applying them in id
       order, replacing the reference's per-neighbor spinlock + shrink
       (hnsw.hh:180-225). Vertices whose list overflows are re-pruned
       with the same diversity heuristic.

Levels are drawn for the whole dataset up front with the reference's
geometric distribution (floor(-log(U)*m_L), hnsw.hh:48), so upper-table
rows are assigned by prefix sum instead of the remote FAA allocator
(rdma_atomics.hh:88-130). The entry point after each round is the
highest-level node so far (ties to lowest id), replacing the EP-pointer
CAS race (hnsw.hh:56-84,236-248).

Within-round blindness is the one semantic difference from the reference's
fully-concurrent build; quality is recovered by ramping the batch size so
early rounds (where the graph is sparse) are small. Recall parity is
enforced by tests against the native sequential builder.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from shine_tpu.config import METRIC_L2, HNSWParams
from shine_tpu.graph.soa import GraphSoA
from shine_tpu.ops.beam import (
    beam_frontier_multi,
    beam_init,
    beam_mark_expanded,
    beam_merge,
)
from shine_tpu.ops.distance import DIST_PRECISION


class BuildState(NamedTuple):
    """Device-resident construction state (capacity-N fixed shapes)."""

    vectors: jnp.ndarray  # (N, d) f32 — all known up front
    vec_sqnorms: jnp.ndarray  # (N,)
    levels: jnp.ndarray  # (N,) i32 — drawn up front
    upper_row: jnp.ndarray  # (N,) i32 — prefix-sum assigned, -1 if level 0
    neighbors0: jnp.ndarray  # (N, 2M) i32, -1 pad
    degree0: jnp.ndarray  # (N,) i32
    upper_neighbors: jnp.ndarray  # (U, L, M) i32
    upper_degree: jnp.ndarray  # (U, L) i32
    entry_point: jnp.ndarray  # () i32
    entry_level: jnp.ndarray  # () i32
    count: jnp.ndarray  # () i32 — nodes inserted so far


def draw_levels(n: int, params: HNSWParams) -> np.ndarray:
    """Geometric level draw, floor(-log(U) * m_L) (reference hnsw.hh:48)."""
    rng = np.random.default_rng(params.seed)
    u = rng.random(n)
    return np.floor(-np.log(u) * params.m_L).astype(np.int32)


def init_build_state(
    vectors: np.ndarray, params: HNSWParams, *, level_cap: int = 12
) -> BuildState:
    vectors = np.ascontiguousarray(vectors, dtype=np.float32)
    n, _ = vectors.shape
    levels = np.minimum(draw_levels(n, params), level_cap)
    upper_row = np.where(levels > 0, np.cumsum(levels > 0) - 1, -1).astype(np.int32)
    u_cap = max(int(upper_row.max()) + 1, 1)
    L = max(int(levels.max()), 1)
    M, M0 = params.M_max, params.M_max0
    sq = (vectors.astype(np.float32) ** 2).sum(axis=1)
    if params.metric_id != METRIC_L2:
        sq = np.zeros_like(sq)
    return BuildState(
        vectors=jnp.asarray(vectors),
        vec_sqnorms=jnp.asarray(sq, dtype=jnp.float32),
        levels=jnp.asarray(levels),
        upper_row=jnp.asarray(upper_row),
        neighbors0=jnp.full((n, M0), -1, dtype=jnp.int32),
        degree0=jnp.zeros((n,), jnp.int32),
        upper_neighbors=jnp.full((u_cap, L, M), -1, dtype=jnp.int32),
        upper_degree=jnp.zeros((u_cap, L), jnp.int32),
        entry_point=jnp.int32(0),
        entry_level=jnp.asarray(levels[0], dtype=jnp.int32),
        count=jnp.int32(1),  # node 0 bootstraps the index (hnsw.hh:56-84)
    )


# ---------------------------------------------------------------------------
# distance helpers on the evolving graph


def _dists(st: BuildState, q, qn, ids, metric):
    """(B, K) distances from each query row to candidate ids; inf if id<0
    or id >= count (not yet inserted)."""
    safe = jnp.maximum(ids, 0)
    vecs = st.vectors[safe]
    dots = jnp.einsum(
        "bd,bkd->bk", q, vecs, precision=DIST_PRECISION,
        preferred_element_type=jnp.float32,
    )
    if metric == METRIC_L2:
        d = qn[:, None] - 2.0 * dots + st.vec_sqnorms[safe]
    else:
        d = 1.0 - dots
    return jnp.where(ids >= 0, d, jnp.inf)


def _neighbors_at(st: BuildState, ids, level_minus1):
    """Adjacency rows (B, M) for ids (B,) at a given upper level (>= 1)."""
    rows = st.upper_row[jnp.maximum(ids, 0)]
    nb = st.upper_neighbors[jnp.maximum(rows, 0), level_minus1]
    ok = (ids >= 0) & (rows >= 0)
    return jnp.where(ok[:, None], nb, -1)


# ---------------------------------------------------------------------------
# select_heuristic, vectorized (reference hnsw.hh:482-522)


def select_heuristic(
    cand_ids,  # (B, C) sorted by (dist,id) ascending, -1 pad
    cand_dists,  # (B, C)
    cand_vecs,  # (B, C, d)
    cand_sqnorms,  # (B, C)
    M: int,
    metric: int,
    fill: bool = False,
    with_dists: bool = False,
):
    """Diversity selection: scan candidates nearest-first, keep c iff
    dist(c, q) < dist(c, s) for every already-kept s. One (C, C) pairwise
    tile per query feeds a cheap sequential mask scan.

    fill=True tops unfilled slots up with the nearest *pruned* candidates
    (hnswlib's keepPrunedConnections). The reference does not fill —
    its candidate pools come from ef_construction-wide beam searches and
    are naturally diverse — but the scan-based builder
    (models/fastbuild.py) feeds nearest-only pools, which the bare
    heuristic over-prunes into fragmented graphs (measured: mean degree
    4.7 of 24 and 10%% unreachable queries without fill).

    Returns (sel_ids (B, M), sel_count (B,)); with_dists adds the selected
    candidates' query distances (B, M) (inf pad) so callers never have to
    recover them by matching ids against the pool — the scan-based builder
    needs them for reverse-edge capping (models/fastbuild.py).
    """
    B, C = cand_ids.shape
    dots = jnp.einsum(
        "bcd,bed->bce", cand_vecs, cand_vecs, precision=DIST_PRECISION,
        preferred_element_type=jnp.float32,
    )
    if metric == METRIC_L2:
        pair = cand_sqnorms[:, :, None] - 2.0 * dots + cand_sqnorms[:, None, :]
    else:
        pair = 1.0 - dots

    def step(carry, c):
        kept, n_kept = carry  # kept: (B, C) bool
        d_q = cand_dists[:, c]
        # closer to some kept candidate than to the query -> skip
        closer = jnp.any(kept & (pair[:, c, :] < d_q[:, None]), axis=1)
        ok = (cand_ids[:, c] >= 0) & ~closer & (n_kept < M)
        kept = kept.at[:, c].set(ok)
        return (kept, n_kept + ok), None

    (kept, n_kept), _ = jax.lax.scan(
        step, (jnp.zeros((B, C), jnp.bool_), jnp.zeros(B, jnp.int32)),
        jnp.arange(C),
    )
    if fill:
        pruned = (~kept) & (cand_ids >= 0)
        room = M - n_kept[:, None]  # slots left per row
        prank = jnp.cumsum(pruned, axis=1) - 1
        take = pruned & (prank < room)
        kept = kept | take
        n_kept = n_kept + take.sum(axis=1)
    # compact kept ids into (B, M) slots, preserving distance order
    slot = jnp.cumsum(kept, axis=1) - 1  # (B, C) target slot where kept
    slot = jnp.where(kept, slot, M)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, C))
    sel = jnp.full((B, M + 1), -1, jnp.int32)
    sel = sel.at[rows, slot].set(cand_ids, mode="drop")
    if with_dists:
        sd = jnp.full((B, M + 1), jnp.inf, jnp.float32)
        sd = sd.at[rows, slot].set(cand_dists, mode="drop")
        return sel[:, :M], n_kept, sd[:, :M]
    return sel[:, :M], n_kept


# ---------------------------------------------------------------------------
# per-level beam search over the evolving graph (search_level semantics)


def _search_level(
    st: BuildState, q, qn, ep_ids, ep_dists, level, ef, frontier, metric
):
    """Best-first beam on one level of the current graph. level is a traced
    int32 (0 = layer0). Returns a Beam of the ef closest. Visited-set-free:
    dedup happens in beam_merge (ops/beam.py)."""
    B = q.shape[0]
    E = frontier
    beam = beam_init(B, ef)
    beam = beam_merge(beam, ep_dists[:, None], ep_ids[:, None])
    K0 = st.neighbors0.shape[1]
    M_up = st.upper_neighbors.shape[2]

    def get_nbrs(fids):  # (B, E) -> (B, E, 2M)
        flat = fids.reshape(-1)

        def upper(_):
            nb = _neighbors_at(st, flat, jnp.maximum(level - 1, 0))
            nb = nb.reshape(B, E, M_up)
            pad = jnp.full((B, E, K0 - M_up), -1, nb.dtype)
            return jnp.concatenate([nb, pad], axis=2)

        def l0(_):
            return st.neighbors0[jnp.maximum(flat, 0)].reshape(B, E, K0)

        return jax.lax.cond(level > 0, upper, l0, None)

    max_steps = 2 * ((ef + E - 1) // E) + 8

    def cond(s):
        beam, step = s
        return (~jnp.all(beam.expanded)) & (step < max_steps)

    def body(s):
        beam, step = s
        slots, fids, active = beam_frontier_multi(beam, E)
        beam = beam_mark_expanded(beam, slots, active)
        nbrs = get_nbrs(fids)
        nbrs = jnp.where(
            active[:, :, None] & (nbrs < st.count), nbrs, -1
        ).reshape(B, -1)
        d = _dists(st, q, qn, nbrs, metric)
        beam = beam_merge(beam, d, nbrs)
        return beam, step + 1

    beam, _ = jax.lax.while_loop(cond, body, (beam, jnp.int32(0)))
    return beam


def _greedy_to_level(st: BuildState, q, qn, target_level, metric):
    """Greedy descent from the entry point down to target_level+1
    (reference hnsw.hh:129-140): returns per-query (ep_id, ep_dist)."""
    B = q.shape[0]
    cur = jnp.broadcast_to(st.entry_point, (B,)).astype(jnp.int32)
    cur_d = _dists(st, q, qn, cur[:, None], metric)[:, 0]

    def level_body(lvl, carry):
        # lvl counts down: entry_level .. 1; only run while lvl > target
        cid, cdist = carry

        def walk(carry):
            cid, cdist, moved = carry
            nbrs = _neighbors_at(st, cid, lvl - 1)
            nbrs = jnp.where(moved[:, None] & (nbrs < st.count), nbrs, -1)
            d = _dists(st, q, qn, nbrs, metric)
            j = jnp.argmin(d, axis=1)
            bd = jnp.take_along_axis(d, j[:, None], 1)[:, 0]
            bi = jnp.take_along_axis(nbrs, j[:, None], 1)[:, 0]
            better = ((bd < cdist) | ((bd == cdist) & (bi < cid))) & moved
            return (
                jnp.where(better, bi, cid),
                jnp.where(better, bd, cdist),
                better,
            )

        active = lvl > target_level  # (B,) bool
        nid, nd, _ = jax.lax.while_loop(
            lambda c: jnp.any(c[2]),
            walk,
            (cid, cdist, active),
        )
        return (nid, nd)

    def body(i, carry):
        lvl = st.entry_level - i
        return jax.lax.cond(
            lvl >= 1, lambda c: level_body(lvl, c), lambda c: c, carry
        )

    # entry_level is traced; bound the loop by the static table depth
    max_levels = st.upper_neighbors.shape[1]
    cur, cur_d = jax.lax.fori_loop(0, max_levels, body, (cur, cur_d))
    return cur, cur_d


# ---------------------------------------------------------------------------
# reverse-edge application (replaces spinlock + shrink, hnsw.hh:180-225)


def _apply_reverse_edges(
    nbr_table,  # (R, cap) adjacency for this level (R=N or U rows)
    deg_table,  # (R,)
    row_of,  # callable: global id -> row in nbr_table
    vertices,  # (E,) global vertex ids receiving a new edge, -1 invalid
    new_ids,  # (E,) the new nodes being linked back
):
    """Deterministically append reverse edges where room permits.

    Sorts requests by (vertex, new_id); each request computes its slot =
    degree[vertex] + rank-within-vertex; in-capacity requests scatter in
    (unique (row, slot) pairs — race-free by construction). Returns
    (nbr_table, deg_table, sorted_v, sorted_u, accepted (E,) bool,
    overflow_vertices (E,) with exactly one entry per overflowed vertex,
    -1 pad)."""
    E = vertices.shape[0]
    cap = nbr_table.shape[1]
    order = jnp.lexsort((new_ids, vertices))
    v = vertices[order]
    u = new_ids[order]
    valid = v >= 0
    first = jnp.concatenate([jnp.array([True]), v[1:] != v[:-1]])
    idx = jnp.arange(E)
    group_start = jnp.where(first, idx, 0)
    group_start = jax.lax.associative_scan(jnp.maximum, group_start)
    rank = idx - group_start
    rows = row_of(jnp.maximum(v, 0))
    slot = deg_table[rows] + rank
    ok = valid & (slot < cap)
    scatter_rows = jnp.where(ok, rows, nbr_table.shape[0])
    scatter_slot = jnp.where(ok, slot, 0)
    nbr_table = nbr_table.at[scatter_rows, scatter_slot].set(u, mode="drop")
    # degree += number of accepted additions per vertex
    add = jnp.where(ok, 1, 0)
    deg_table = deg_table.at[jnp.where(valid, rows, nbr_table.shape[0])].add(
        add, mode="drop"
    )
    # degrees never exceed cap, so the first rejected request of a group
    # sits exactly at slot == cap — one marker per overflowed vertex
    over_v = jnp.where(valid & (slot == cap), v, -1)
    return nbr_table, deg_table, v, u, ok, over_v


def _shrink_overflow(
    st: BuildState,
    vertices,  # (O,) global ids to re-prune at `level`, -1 pad
    pending_v,  # (E,) this round's reverse-edge requests (vertex ids)
    pending_u,  # (E,) matching new node ids
    level_minus1,  # traced; -1 means layer 0
    metric,
    max_add: int,
):
    """Re-prune an overflowed vertex list with the diversity heuristic over
    (existing entries ∪ this round's additions), reference hnsw.hh:208-224.

    pending_v must be pre-masked to only *rejected* requests so accepted
    ones (already present in the vertex list) are not duplicated. max_add
    bounds how many rejected additions to one vertex are considered
    (extras drop deterministically by new-id order)."""
    from shine_tpu.ops.beam import _sort_key_ids

    O = vertices.shape[0]
    is_l0 = level_minus1 < 0
    cap0, cap_up = st.neighbors0.shape[1], st.upper_neighbors.shape[2]
    cap = jnp.where(is_l0, cap0, cap_up)
    C = cap0 + max_add

    vsafe = jnp.maximum(vertices, 0)
    rows_u = jnp.maximum(st.upper_row[vsafe], 0)
    exist_l0 = st.neighbors0[vsafe]  # (O, 2M)
    exist_up = st.upper_neighbors[rows_u, jnp.maximum(level_minus1, 0)]  # (O, M)
    pad_up = jnp.full((O, cap0 - cap_up), -1, jnp.int32)
    exist = jnp.where(
        is_l0, exist_l0, jnp.concatenate([exist_up, pad_up], axis=1)
    )  # (O, 2M)

    # this round's rejected additions for each overflow vertex, first
    # max_add by new-node id
    match = (pending_v[None, :] == vertices[:, None]) & (vertices[:, None] >= 0)
    big = jnp.int32(2**31 - 1)
    keyed = jnp.where(match, pending_u[None, :], big)
    adds = jax.lax.sort(keyed, dimension=1)[:, :max_add]
    adds = jnp.where(adds == big, -1, adds)

    cand = jnp.concatenate([exist, adds], axis=1)  # (O, C)
    q = st.vectors[vsafe]
    qn = st.vec_sqnorms[vsafe] if metric == METRIC_L2 else jnp.zeros(O, jnp.float32)
    d = _dists(st, q, qn, cand, metric)
    d, _, cand = jax.lax.sort((d, _sort_key_ids(cand), cand), dimension=1, num_keys=2)
    cvecs = st.vectors[jnp.maximum(cand, 0)]
    csq = st.vec_sqnorms[jnp.maximum(cand, 0)]
    sel, n_sel = select_heuristic(cand, d, cvecs, csq, cap0, metric)
    # clamp selection to this level's capacity
    keep = jnp.arange(sel.shape[1])[None, :] < cap
    sel = jnp.where(keep, sel, -1)
    n_sel = jnp.minimum(n_sel, cap)

    ok = vertices >= 0
    rows0 = jnp.where(ok & is_l0, vsafe, st.neighbors0.shape[0])
    nbr0 = st.neighbors0.at[rows0].set(sel, mode="drop")
    deg0 = st.degree0.at[rows0].set(n_sel, mode="drop")
    rowsu = jnp.where(ok & ~is_l0, rows_u, st.upper_neighbors.shape[0])
    upper = st.upper_neighbors.at[rowsu, jnp.maximum(level_minus1, 0)].set(
        sel[:, :cap_up], mode="drop"
    )
    udeg = st.upper_degree.at[rowsu, jnp.maximum(level_minus1, 0)].set(
        jnp.minimum(n_sel, cap_up), mode="drop"
    )
    return st._replace(
        neighbors0=nbr0, degree0=deg0, upper_neighbors=upper, upper_degree=udeg
    )


# ---------------------------------------------------------------------------
# one insert round


def _write_own_l0(st: BuildState, ids, sel, n_sel, participate):
    """A new node's own layer-0 adjacency (conflict-free rows)."""
    cap0 = st.neighbors0.shape[1]
    M_sel = sel.shape[1]
    rows = jnp.where(participate, jnp.maximum(ids, 0), st.neighbors0.shape[0])
    padded = jnp.concatenate(
        [sel, jnp.full((sel.shape[0], cap0 - M_sel), -1, jnp.int32)], axis=1
    )
    nbr0 = st.neighbors0.at[rows].set(padded, mode="drop")
    deg0 = st.degree0.at[rows].set(n_sel, mode="drop")
    return st._replace(neighbors0=nbr0, degree0=deg0)


def _write_own_upper(st: BuildState, ids, sel, n_sel, lvl_m1, participate):
    rows = st.upper_row[jnp.maximum(ids, 0)]
    rows = jnp.where(participate & (rows >= 0), rows, st.upper_neighbors.shape[0])
    cap_up = st.upper_neighbors.shape[2]
    upper = st.upper_neighbors.at[rows, lvl_m1].set(sel[:, :cap_up], mode="drop")
    udeg = st.upper_degree.at[rows, lvl_m1].set(
        jnp.minimum(n_sel, cap_up), mode="drop"
    )
    return st._replace(upper_neighbors=upper, upper_degree=udeg)


class RoundPlan(NamedTuple):
    """A round's planned writes — pure function of the round-start state.

    Within-round writes are invisible to same-round searches (new ids are
    >= count and masked out of every traversal), so one insert round
    factors into plan (searches + selections; the expensive part, data-
    parallel over the batch) and apply (deterministic writes; cheap,
    replicable). This is what makes the sharded builder possible: shards
    plan their batch slices independently, all_gather the plans, and apply
    identically on replicated state."""

    batch_ids: jnp.ndarray  # (B,)
    node_level: jnp.ndarray  # (B,)
    up_ids: jnp.ndarray  # (B_up,)
    sel_up: jnp.ndarray  # (B_up, L_cap, M_up) -1 where absent
    n_sel_up: jnp.ndarray  # (B_up, L_cap)
    sel_l0: jnp.ndarray  # (B, M)
    n_sel_l0: jnp.ndarray  # (B,)
    up_overflow: jnp.ndarray  # (1,) i32 — nodes demoted to L0 (B_up full)


def _plan_level(
    st: BuildState, ids, q, qn, ep, ep_d, lvl, participate, M_out, metric,
    ef, frontier,
):
    """Search + select for one level (read-only). Returns
    (sel, n_sel, next_ep, next_ep_d)."""
    ep_in = jnp.where(participate, ep, -1)
    beam = _search_level(st, q, qn, ep_in, ep_d, lvl, ef, frontier, metric)
    cand = jnp.where(participate[:, None], beam.ids, -1)
    cvecs = st.vectors[jnp.maximum(cand, 0)]
    csq = st.vec_sqnorms[jnp.maximum(cand, 0)]
    sel, n_sel = select_heuristic(cand, beam.dists, cvecs, csq, M_out, metric)
    sel = jnp.where(participate[:, None], sel, -1)
    n_sel = jnp.where(participate, n_sel, 0)
    # next-level entry: the closest found candidate (reference continues
    # from the best of top_candidates, hnsw.hh:151-175)
    best_i, best_d = beam.ids[:, 0], beam.dists[:, 0]
    use = participate & (best_i >= 0)
    return sel, n_sel, jnp.where(use, best_i, ep), jnp.where(use, best_d, ep_d)


def _apply_level(st: BuildState, ids, sel, n_sel, lvl, metric, max_add):
    """Write one level's planned adjacency: own rows, then reverse edges
    with deterministic resolution + heuristic re-prune on overflow."""
    participate = n_sel > 0
    is_l0 = lvl == 0
    st = jax.lax.cond(
        is_l0,
        lambda s: _write_own_l0(s, ids, sel, n_sel, participate),
        lambda s: _write_own_upper(
            s, ids, sel, n_sel, jnp.maximum(lvl - 1, 0), participate
        ),
        st,
    )

    flat_v = sel.reshape(-1)
    flat_u = jnp.broadcast_to(ids[:, None], sel.shape).reshape(-1)
    flat_u = jnp.where(flat_v >= 0, flat_u, -1)

    def rev_l0(s: BuildState):
        nbr, deg, sv, su, ok, over = _apply_reverse_edges(
            s.neighbors0, s.degree0, lambda x: x, flat_v, flat_u
        )
        s = s._replace(neighbors0=nbr, degree0=deg)
        rejected_v = jnp.where(ok, -1, sv)
        return _shrink_overflow(s, over, rejected_v, su, jnp.int32(-1), metric, max_add)

    def rev_upper(s: BuildState):
        lm1 = jnp.maximum(lvl - 1, 0)
        col = s.upper_neighbors[:, lm1, :]
        dcol = s.upper_degree[:, lm1]
        nbr, deg, sv, su, ok, over = _apply_reverse_edges(
            col, dcol, lambda x: s.upper_row[x], flat_v, flat_u
        )
        s = s._replace(
            upper_neighbors=s.upper_neighbors.at[:, lm1, :].set(nbr),
            upper_degree=s.upper_degree.at[:, lm1].set(deg),
        )
        rejected_v = jnp.where(ok, -1, sv)
        return _shrink_overflow(s, over, rejected_v, su, lm1, metric, max_add)

    return jax.lax.cond(is_l0, rev_l0, rev_upper, st)


def plan_round(
    st: BuildState,
    batch_ids: jnp.ndarray,  # (B,)
    *,
    ef: int,
    frontier: int,
    metric: int,
    B_up: int,
) -> RoundPlan:
    """The read-only half of an insert round."""
    valid = batch_ids >= 0
    q = st.vectors[jnp.maximum(batch_ids, 0)]
    qn = st.vec_sqnorms[jnp.maximum(batch_ids, 0)]
    node_level = jnp.where(valid, st.levels[jnp.maximum(batch_ids, 0)], 0)

    # upper levels run on a compacted sub-batch (most nodes are level 0).
    # If more than B_up nodes drew level >= 1, the overflow nodes are
    # *demoted to level 0 for good* (node_level here + st.levels in
    # apply_round) rather than silently keeping a high level with empty
    # upper adjacency — a demoted node is just a normal L0 node, while a
    # hollow upper node could become an unreachable entry point. B_up is
    # sized ~4x the geometric expectation (device_build_graph), so this is
    # a tail event; up_overflow reports it.
    is_up = valid & (node_level >= 1)
    order = jnp.argsort(jnp.where(is_up, batch_ids, jnp.int32(2**31 - 1)))
    up_pos = order[:B_up]
    up_ok = is_up[up_pos]
    chosen = jnp.zeros_like(is_up).at[up_pos].set(up_ok)
    overflow = is_up & ~chosen
    node_level = jnp.where(overflow, 0, node_level)
    target = jnp.minimum(node_level, st.entry_level)

    ep, ep_d = _greedy_to_level(st, q, qn, target, metric)

    up_ids = jnp.where(up_ok, batch_ids[up_pos], -1)
    uq = q[up_pos]
    uqn = qn[up_pos]
    u_target = jnp.where(up_ok, target[up_pos], -1)
    u_ep = ep[up_pos]
    u_ep_d = ep_d[up_pos]

    L_cap = st.upper_neighbors.shape[1]
    M_up = st.upper_neighbors.shape[2]
    sel_up0 = jnp.full((B_up, L_cap, M_up), -1, jnp.int32)
    n_sel_up0 = jnp.zeros((B_up, L_cap), jnp.int32)

    def upper_iter(i, carry):
        sel_up, n_sel_up, e, ed = carry
        lvl = jnp.int32(L_cap - i)
        participate = up_ok & (lvl <= u_target) & (lvl >= 1)

        def work(c):
            sel_up, n_sel_up, e, ed = c
            sel, n_sel, e2, ed2 = _plan_level(
                st, up_ids, uq, uqn, e, ed, lvl, participate,
                M_up, metric, ef, frontier,
            )
            sel_up = sel_up.at[:, lvl - 1].set(sel)
            n_sel_up = n_sel_up.at[:, lvl - 1].set(n_sel)
            return sel_up, n_sel_up, e2, ed2

        return jax.lax.cond(jnp.any(participate), work, lambda c: c, carry)

    sel_up, n_sel_up, u_ep, u_ep_d = jax.lax.fori_loop(
        0, L_cap, upper_iter, (sel_up0, n_sel_up0, u_ep, u_ep_d)
    )

    ep = ep.at[up_pos].set(jnp.where(up_ok, u_ep, ep[up_pos]))
    ep_d = ep_d.at[up_pos].set(jnp.where(up_ok, u_ep_d, ep_d[up_pos]))

    sel_l0, n_sel_l0, _, _ = _plan_level(
        st, batch_ids, q, qn, ep, ep_d, jnp.int32(0), valid,
        M_up, metric, ef, frontier,
    )
    return RoundPlan(
        batch_ids, node_level, up_ids, sel_up, n_sel_up, sel_l0, n_sel_l0,
        jnp.sum(overflow.astype(jnp.int32))[None],
    )


def apply_round(
    st: BuildState, plan: RoundPlan, *, metric: int, max_add: int
) -> BuildState:
    """The write half of an insert round — deterministic in the plan."""
    L_cap = st.upper_neighbors.shape[1]

    def upper_iter(i, s):
        lvl = jnp.int32(L_cap - i)
        return jax.lax.cond(
            jnp.any(plan.n_sel_up[:, lvl - 1] > 0),
            lambda s_: _apply_level(
                s_, plan.up_ids, plan.sel_up[:, lvl - 1],
                plan.n_sel_up[:, lvl - 1], lvl, metric, max_add,
            ),
            lambda s_: s_,
            s,
        )

    st = jax.lax.fori_loop(0, L_cap, upper_iter, st)
    st = _apply_level(
        st, plan.batch_ids, plan.sel_l0, plan.n_sel_l0, jnp.int32(0),
        metric, max_add,
    )

    valid = plan.batch_ids >= 0
    # persist B_up-overflow demotions (plan_round): a node planned at a
    # lower level than its draw is stored at the planned level, keeping
    # levels[] consistent with the (empty) upper adjacency it never got
    safe = jnp.maximum(plan.batch_ids, 0)
    demoted = valid & (plan.node_level < st.levels[safe])
    idx = jnp.where(demoted, safe, st.levels.shape[0])
    levels = st.levels.at[idx].min(plan.node_level, mode="drop")

    batch_max = jnp.max(jnp.where(valid, plan.node_level, -1))
    new_top = batch_max > st.entry_level
    cand_ep = jnp.min(
        jnp.where(
            valid & (plan.node_level == batch_max),
            plan.batch_ids,
            jnp.int32(2**31 - 1),
        )
    )
    return st._replace(
        levels=levels,
        entry_point=jnp.where(new_top, cand_ep, st.entry_point),
        entry_level=jnp.maximum(st.entry_level, batch_max),
        count=st.count + jnp.sum(valid.astype(jnp.int32)),
    )


@partial(
    jax.jit,
    static_argnames=("ef", "frontier", "max_add", "metric", "B_up"),
)
def insert_round(
    st: BuildState,
    batch_ids: jnp.ndarray,  # (B,) = count..count+B-1, -1 pad allowed
    *,
    ef: int,
    frontier: int,
    max_add: int,
    metric: int,
    B_up: int,
):
    """Insert one batch of nodes against the graph of all earlier rounds."""
    plan = plan_round(
        st, batch_ids, ef=ef, frontier=frontier, metric=metric, B_up=B_up
    )
    return apply_round(st, plan, metric=metric, max_add=max_add)


def make_sharded_insert_round(
    mesh, *, ef: int, frontier: int, max_add: int, metric: int, B_up_loc: int
):
    """Data-parallel insert round over a device mesh.

    The batch is sharded over the mesh; every chip *plans* its slice
    (descent + per-level ef_construction searches — the expensive part,
    so round throughput scales with chips), the plans are all_gathered,
    and every chip *applies* the full gathered plan to its replica of the
    build state. Determinism of apply keeps the replicas bit-identical —
    the SPMD replacement for the reference's remote-lock concurrent build
    (rdma_atomics.hh): where CNs raced CAS locks on one shared graph,
    shards here agree on a deterministic merge instead.
    """
    import jax as _jax
    from jax.sharding import PartitionSpec as P

    from shine_tpu.parallel.mesh import SHARD_AXIS

    S = mesh.devices.size

    def spmd(st: BuildState, batch_ids):
        plan = plan_round(
            st, batch_ids, ef=ef, frontier=frontier, metric=metric,
            B_up=B_up_loc,
        )
        full = _jax.tree.map(
            lambda a: _jax.lax.all_gather(a, SHARD_AXIS).reshape(
                (-1,) + a.shape[1:]
            ),
            plan,
        )
        return apply_round(st, full, metric=metric, max_add=max_add)

    @_jax.jit
    def run(st: BuildState, batch_ids):
        fn = _jax.shard_map(
            spmd,
            mesh=mesh,
            in_specs=(
                _jax.tree.map(lambda _: P(), st),
                P(SHARD_AXIS),
            ),
            out_specs=_jax.tree.map(lambda _: P(), st),
            check_vma=False,
        )
        return fn(st, batch_ids)

    return run


# ---------------------------------------------------------------------------
# host-side build driver


def device_build_graph(
    vectors: np.ndarray,
    params: HNSWParams,
    *,
    batch_size: int = 512,
    first_batch: int = 32,
    level_cap: int = 12,
    ef: int | None = None,
    mesh=None,
    progress: "callable | None" = None,
) -> GraphSoA:
    """Build the whole index on device with ramped batched insert rounds;
    returns the same host GraphSoA layout as the native builder. With a
    mesh, rounds run data-parallel over the devices
    (make_sharded_insert_round)."""
    n = vectors.shape[0]
    st = init_build_state(vectors, params, level_cap=level_cap)
    ef = ef or params.ef_construction
    metric = params.metric_id
    S = mesh.devices.size if mesh is not None else 1
    quantum = max(S, 1)

    runs: dict = {}
    count = 1
    B = min(max(first_batch, quantum), batch_size)
    while count < n:
        b = min(B, n - count)
        ids = np.full(B, -1, dtype=np.int32)
        ids[:b] = np.arange(count, count + b, dtype=np.int32)
        B_up = max(8, min(B, 4 * B // max(params.M, 2) + 8))
        if mesh is None:
            st = insert_round(
                st,
                jnp.asarray(ids),
                ef=ef,
                frontier=4,
                max_add=2 * params.M,
                metric=metric,
                B_up=B_up,
            )
        else:
            # ceil so S * B_up_loc >= B_up; clamp to the local batch slice
            # (plan_round can't promote more rows than its shard holds)
            B_up_loc = min(max(1, B // S), max(8, -(-B_up // S)))
            key = (B, B_up_loc)
            if key not in runs:
                runs[key] = make_sharded_insert_round(
                    mesh, ef=ef, frontier=4, max_add=2 * params.M,
                    metric=metric, B_up_loc=B_up_loc,
                )
            st = runs[key](st, jnp.asarray(ids))
        count += b
        if progress is not None:
            progress(count, n)
        if B < batch_size:
            B = min(2 * B, batch_size)

    return build_state_to_graph(st, params)


def build_state_to_graph(st: BuildState, params: HNSWParams) -> GraphSoA:
    levels = np.asarray(st.levels)
    top_level = int(np.asarray(st.entry_level))
    upper_row = np.asarray(st.upper_row)
    used = int(upper_row.max()) + 1 if (levels > 0).any() else 0
    upper = np.asarray(st.upper_neighbors)[:used, : max(top_level, 1)]
    return GraphSoA(
        params=params,
        vectors=np.asarray(st.vectors),
        levels=levels,
        neighbors0=np.asarray(st.neighbors0),
        upper_row=upper_row,
        upper_neighbors=np.ascontiguousarray(upper),
        entry_point=int(np.asarray(st.entry_point)),
        top_level=top_level,
    )
