"""Fixed-width beam (sorted candidate/result set) for batched best-first
search.

TPU-native replacement for the reference's MaxHeap/MinHeap pair
(/root/reference/src/hnsw/heap.hh): each query's top-ef working set is a
sorted (dist, id, expanded) triple of fixed width ef, merged with new
candidates via a single multi-operand `lax.sort`. Ordering is (dist, id)
ascending — the reference's tie-break (heap.hh:53-57) — so results are
deterministic.

Padding convention: id = -1, dist = +inf, expanded = True (never selected as
a frontier, always sorts last).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INF = jnp.float32(jnp.inf)


class Beam(NamedTuple):
    dists: jnp.ndarray  # (B, ef) float32, ascending
    ids: jnp.ndarray  # (B, ef) int32, -1 pad
    expanded: jnp.ndarray  # (B, ef) bool, True pad


def beam_init(batch: int, ef: int) -> Beam:
    return Beam(
        dists=jnp.full((batch, ef), INF, dtype=jnp.float32),
        ids=jnp.full((batch, ef), -1, dtype=jnp.int32),
        expanded=jnp.ones((batch, ef), dtype=jnp.bool_),
    )


def _sort_key_ids(ids: jnp.ndarray) -> jnp.ndarray:
    # -1 pad must sort after every real id at equal dist (dist=inf anyway),
    # but keep plain ascending ids as secondary key; map -1 -> int32 max.
    return jnp.where(ids < 0, jnp.int32(2**31 - 1), ids)


def beam_merge(
    beam: Beam,
    cand_dists: jnp.ndarray,  # (B, K)
    cand_ids: jnp.ndarray,  # (B, K), -1 = masked out
) -> Beam:
    """Merge K candidates per query into the beam, keeping the best ef."""
    ef = beam.ids.shape[1]
    cd = jnp.where(cand_ids >= 0, cand_dists, INF)
    all_d = jnp.concatenate([beam.dists, cd], axis=1)
    all_i = jnp.concatenate([beam.ids, jnp.where(cand_ids >= 0, cand_ids, -1)], axis=1)
    all_e = jnp.concatenate(
        [beam.expanded, jnp.zeros_like(cand_ids, dtype=jnp.bool_)], axis=1
    )
    d, key_i, i, e = jax.lax.sort(
        (all_d, _sort_key_ids(all_i), all_i, all_e), dimension=1, num_keys=2
    )
    d, i, e = d[:, :ef], i[:, :ef], e[:, :ef]
    # re-establish padding convention for slots holding no real candidate
    pad = i < 0
    return Beam(
        dists=jnp.where(pad, INF, d),
        ids=i,
        expanded=jnp.where(pad, True, e),
    )


def beam_frontier(beam: Beam) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick each query's nearest unexpanded entry.

    Returns (slot (B,), frontier_id (B,), active (B,)). active is False when
    every beam entry is expanded — the fixed-shape analogue of the reference
    termination test at hnsw.hh:424-426 (since the beam *is* the candidate
    set, 'closest candidate farther than the worst top-ef entry' reduces to
    'no unexpanded entry left').
    """
    masked = jnp.where(beam.expanded, INF, beam.dists)
    slot = jnp.argmin(masked, axis=1).astype(jnp.int32)
    frontier_id = jnp.take_along_axis(beam.ids, slot[:, None], axis=1)[:, 0]
    active = ~jnp.all(beam.expanded, axis=1)
    frontier_id = jnp.where(active, frontier_id, -1)
    return slot, frontier_id, active


def beam_mark_expanded(beam: Beam, slot: jnp.ndarray, active: jnp.ndarray) -> Beam:
    rows = jnp.arange(beam.ids.shape[0], dtype=jnp.int32)
    col = jnp.where(active, slot, 0)
    new_exp = beam.expanded.at[rows, col].set(
        jnp.where(active, True, beam.expanded[rows, col])
    )
    return beam._replace(expanded=new_exp)
