"""Skew-aware query routing: affinity-ordered batch composition.

The reference's QueryRouter sends each query to the CN whose cached region
matches it, with per-CN batch budgets and adaptive rebalancing by idleness,
relayed through MNs because CNs lack direct connections
(/root/reference/src/router/query_router.hh). On a TPU mesh every chip can
talk to every chip, so the relay machinery disappears; what remains useful
is *batch composition*: ordering the query stream so that

  1. each SPMD batch's local slices are affine to the shard that will serve
     them (query b lands on mesh position b // B_loc — the router permutes
     queries so that position matches the owning shard), maximizing local
     gathers / replica-cache hits, and
  2. per-shard load stays balanced under Zipf skew via per-batch quotas
     that adapt to the observed per-shard backlog — the analogue of the
     reference's ADAPTIVE_ROUTING update_limits (query_router.hh:106-151).

This is a host-side scheduler (the reference's router is a host thread
too); the device only ever sees fixed-shape batches.
"""

from __future__ import annotations

import numpy as np

from shine_tpu.parallel.placement import Placement


class QueryRouter:
    """Permutes a query stream into shard-affine, load-balanced batches."""

    def __init__(
        self,
        placement: Placement,
        *,
        batch_size: int,
        balanced: bool = True,
    ):
        self.placement = placement
        self.num_shards = placement.num_shards
        if batch_size % self.num_shards:
            raise ValueError("batch_size must be divisible by num_shards")
        self.batch_size = batch_size
        self.per_shard = batch_size // self.num_shards
        self.balanced = balanced

    def plan(self, queries: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Returns (perm, batch_shard) where perm is a permutation of query
        indices grouped into consecutive batches of `batch_size`, laid out
        so that slice s of each batch holds queries affine to shard s;
        batch_shard (num_batches, num_shards) records the backlog-adjusted
        quota actually used (for stats).

        Queries overflowing their affine shard's quota spill to the ranked
        next-closest shard with room — the balanced-routing histogram walk
        (query_router.hh:353-370).
        """
        nq = queries.shape[0]
        ranked = self.placement.closest_shards(queries)  # (nq, S)
        S, P = self.num_shards, self.per_shard
        num_batches = -(-nq // self.batch_size)
        # per-shard FIFO backlogs in affinity order
        backlog: list[list[int]] = [[] for _ in range(S)]
        spill: list[int] = []
        for i in range(nq):
            backlog[ranked[i, 0]].append(i)
        perm = np.empty(num_batches * self.batch_size, dtype=np.int64)
        used = np.zeros((num_batches, S), dtype=np.int32)
        heads = [0] * S
        pad_pool: list[int] = []
        for b in range(num_batches):
            for s in range(S):
                lane = []
                while len(lane) < P and heads[s] < len(backlog[s]):
                    lane.append(backlog[s][heads[s]])
                    heads[s] += 1
                used[b, s] = len(lane)
                while len(lane) < P:
                    lane.append(-1)  # hole, filled by spill below
                perm[b * self.batch_size + s * P : b * self.batch_size + (s + 1) * P] = lane
        # spill remaining queries (over-quota shards) into holes of their
        # next-ranked shards, else anywhere
        remaining = [
            backlog[s][h] for s in range(S) for h in range(heads[s], len(backlog[s]))
        ]
        holes = np.where(perm < 0)[0]
        for pos, qi in zip(holes, remaining):
            perm[pos] = qi
        leftovers = remaining[len(holes):]
        if leftovers:
            raise AssertionError("router lost queries")  # conservation check
        holes = np.where(perm < 0)[0]
        # pad residual holes by repeating query 0 (masked out by caller)
        perm[holes] = nq  # sentinel: caller pads
        return perm, used

    @staticmethod
    def apply(
        queries: np.ndarray, perm: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Materialize the routed query tensor; sentinel rows (== nq) are
        zero-padded. Returns (routed (len(perm), d), valid mask)."""
        nq, d = queries.shape
        valid = perm < nq
        routed = np.zeros((len(perm), d), dtype=queries.dtype)
        routed[valid] = queries[perm[valid]]
        return routed, valid

    @staticmethod
    def unpermute(results: np.ndarray, perm: np.ndarray, nq: int) -> np.ndarray:
        """Scatter batched results back to original query order."""
        out = np.empty((nq,) + results.shape[1:], dtype=results.dtype)
        valid = perm < nq
        out[perm[valid]] = results[valid]
        return out
