"""IVF (inverted-file) index: clustered pruning on the MXU.

The TPU-idiomatic approximate index for bases too large for brute force
(models/flat.py). Where the reference prunes with graph traversal — a
latency-bound pointer chase per visited vertex (hnsw.hh:406-476) — IVF
prunes with *geometry*: vectors are partitioned into balanced clusters
(parallel/placement.py k-means, the same machinery the reference uses for
query routing, placement.hh/kmeans.hh); a query scores all centroids with
one matmul and then scans only the top-p clusters densely.

Fixed-shape TPU design:
  * clusters are stored as a padded dense (C, cap, d) bf16 tensor
    (cluster-major rows; -1-id padding) so a probed cluster is one coarse
    contiguous gather — no per-row scatter/gather;
  * queries are *sorted by their nearest centroid* and processed in tiles
    of G; each tile probes one shared top-p cluster set (pooled over the
    tile's scores). Affinity sorting makes the shared set nearly optimal
    per query — the same cache-locality trick as the reference's
    query-to-CN routing (router.py / query_router.hh), reused for probe
    locality;
  * stage-2 distances are one (T, G, p*cap) einsum + top-k.

Recall is tuned by p (probes) like ef in HNSW.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from shine_tpu.config import METRIC_IP, METRIC_L2, metric_id
from shine_tpu.ops.distance import pairwise_distance, rerank_topk


class IVFData(NamedTuple):
    centroids: jnp.ndarray  # (C, d) f32
    blocks: jnp.ndarray  # (C, cap, d) bf16
    block_sq: jnp.ndarray  # (C, cap) f32 (inf pad)
    block_ids: jnp.ndarray  # (C, cap) i32 (-1 pad)
    vectors: jnp.ndarray  # (n, d) f32 — id-ordered, for exact re-rank
    sqnorms: jnp.ndarray  # (n,) f32

    @property
    def num_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def cap(self) -> int:
        return self.blocks.shape[1]


def build_ivf_layout(
    vectors: np.ndarray,
    num_clusters: int,
    *,
    metric: int = METRIC_L2,
    train_size: int = 100_000,
    iters: int = 25,
    seed: int = 1234,
    cap_slack: float = 1.25,
) -> IVFData:
    """Balanced clustering + cluster-major dense layout.

    Points are assigned nearest-first with per-cluster capacity
    cap = ceil(slack * n / C); overflow spills to the next-nearest cluster
    with room (the capacity_assign scheme of parallel/placement.py, applied
    chunked so the (n, C) distance tile never fully materializes).
    """
    from shine_tpu.parallel.placement import _lloyd

    n, d = vectors.shape
    v32 = np.ascontiguousarray(vectors, dtype=np.float32)
    rng = np.random.default_rng(seed)
    train = v32[rng.choice(n, min(train_size, n), replace=False)]
    cents, _ = _lloyd(jnp.asarray(train), k=num_clusters, iters=iters, seed=seed)
    cents = np.asarray(cents)

    cap = int(np.ceil(cap_slack * n / num_clusters))
    # chunked nearest-centroid ranking (keep top 4 choices per point)
    R = min(4, num_clusters)
    choice = np.empty((n, R), dtype=np.int32)
    choice_d = np.empty((n, R), dtype=np.float32)
    for lo in range(0, n, 65536):
        hi = min(lo + 65536, n)
        dtile = np.asarray(
            pairwise_distance(jnp.asarray(v32[lo:hi]), jnp.asarray(cents))
        )
        part = np.argpartition(dtile, R - 1, axis=1)[:, :R]
        pd = np.take_along_axis(dtile, part, axis=1)
        order = np.argsort(pd, axis=1, kind="stable")
        choice[lo:hi] = np.take_along_axis(part, order, axis=1)
        choice_d[lo:hi] = np.take_along_axis(pd, order, axis=1)

    assign = np.full(n, -1, dtype=np.int64)
    room = np.full(num_clusters, cap, dtype=np.int64)
    for r in range(R):
        un = np.where(assign < 0)[0]
        if len(un) == 0:
            break
        c_r = choice[un, r]
        order = np.lexsort((choice_d[un, r], c_r))
        un, c_r = un[order], c_r[order]
        # rank within cluster group
        first = np.concatenate([[True], c_r[1:] != c_r[:-1]])
        group_start = np.maximum.accumulate(np.where(first, np.arange(len(c_r)), 0))
        rank = np.arange(len(c_r)) - group_start
        ok = rank < room[c_r]
        assign[un[ok]] = c_r[ok]
        np.subtract.at(room, c_r[ok], 1)
    # final fallback: any cluster with room, nearest-first by centroid dist
    un = np.where(assign < 0)[0]
    if len(un):
        open_cs = np.where(room > 0)[0]
        dtile = np.asarray(
            pairwise_distance(jnp.asarray(v32[un]), jnp.asarray(cents[open_cs]))
        )
        pref = np.argsort(dtile, axis=1, kind="stable")
        for i, qi in enumerate(un):
            for c in open_cs[pref[i]]:
                if room[c] > 0:
                    assign[qi] = c
                    room[c] -= 1
                    break
    assert (assign >= 0).all()

    blocks = np.zeros((num_clusters, cap, d), dtype=np.float32)
    block_sq = np.full((num_clusters, cap), np.inf, dtype=np.float32)
    block_ids = np.full((num_clusters, cap), -1, dtype=np.int32)
    fill = np.zeros(num_clusters, dtype=np.int64)
    order = np.argsort(assign, kind="stable")
    for qi in order:
        c = assign[qi]
        s = fill[c]
        blocks[c, s] = v32[qi]
        block_ids[c, s] = qi
        fill[c] += 1
    sq = (blocks * blocks).sum(-1)
    block_sq = np.where(block_ids >= 0, sq, np.inf)
    if metric != METRIC_L2:
        block_sq = np.where(block_ids >= 0, 0.0, np.inf).astype(np.float32)
    sqn = (v32 * v32).sum(-1) if metric == METRIC_L2 else np.zeros(n, np.float32)
    return IVFData(
        centroids=jnp.asarray(cents),
        blocks=jnp.asarray(blocks, dtype=jnp.bfloat16),
        block_sq=jnp.asarray(block_sq),
        block_ids=jnp.asarray(block_ids),
        vectors=jnp.asarray(v32),
        sqnorms=jnp.asarray(sqn.astype(np.float32)),
    )


@partial(jax.jit, static_argnames=("metric",))
def ivf_stage1(data: IVFData, queries: jnp.ndarray, *, metric: int):
    """(B, C) centroid scores — one MXU tile."""
    return pairwise_distance(queries.astype(jnp.float32), data.centroids, metric)


@partial(jax.jit, static_argnames=("k", "metric", "rerank"))
def ivf_stage2(
    data: IVFData,
    tiles_q: jnp.ndarray,  # (T, G, d) affinity-sorted query tiles
    probes: jnp.ndarray,  # (T, p) cluster ids per tile
    *,
    k: int,
    metric: int,
    rerank: int = 4,
):
    """Dense bf16 scan of each tile's probe clusters, then exact f32
    re-rank of the rerank*k survivors. Returns (dists, ids) (T, G, k)."""
    T, G, d = tiles_q.shape
    p = probes.shape[1]
    cap = data.cap
    q = tiles_q.astype(jnp.float32)
    qn = jnp.sum(q * q, axis=-1)  # (T, G)
    blk = data.blocks[probes]  # (T, p, cap, d) coarse gather, bf16
    sqs = data.block_sq[probes]  # (T, p, cap)
    ids = data.block_ids[probes]  # (T, p, cap)
    dots = jnp.einsum(
        "tgd,tpcd->tgpc",
        q.astype(jnp.bfloat16),
        blk,
        preferred_element_type=jnp.float32,
    )
    if metric == METRIC_L2:
        dd = qn[:, :, None, None] - 2.0 * dots + sqs[:, None, :, :]
    else:
        dd = 1.0 - dots
    dd = jnp.where(ids[:, None, :, :] >= 0, dd, jnp.inf)
    dd = dd.reshape(T, G, p * cap)
    flat_ids = jnp.broadcast_to(ids.reshape(T, 1, p * cap), (T, G, p * cap))
    kk = min(max(rerank, 1) * k, p * cap)
    nd, sel = jax.lax.top_k(-dd, kk)
    cand = jnp.take_along_axis(flat_ids, sel, axis=2)  # (T, G, kk)
    return rerank_topk(data.vectors, data.sqnorms, q, cand, k, metric)


class IVFIndex:
    """Clustered approximate index; probes tunes recall like ef."""

    def __init__(
        self,
        vectors: np.ndarray,
        *,
        num_clusters: int | None = None,
        metric: str | int = "l2",
        train_size: int = 100_000,
        seed: int = 1234,
    ):
        self.metric = metric_id(metric)
        n = vectors.shape[0]
        if num_clusters is None:
            num_clusters = max(8, int(np.sqrt(n) * 2))
        self.data = build_ivf_layout(
            vectors,
            num_clusters,
            metric=self.metric,
            train_size=train_size,
            seed=seed,
        )
        self.n = n

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        probes: int = 8,
        tile: int = 256,
    ) -> tuple[np.ndarray, np.ndarray]:
        nq, d = queries.shape
        q32 = queries.astype(np.float32)
        scores = np.asarray(ivf_stage1(self.data, jnp.asarray(q32), metric=self.metric))
        C = self.data.num_clusters
        top1 = np.argmin(scores, axis=1)
        order = np.argsort(top1, kind="stable")  # affinity sort
        T = -(-nq // tile)
        pad = T * tile - nq
        order_p = np.concatenate([order, np.full(pad, order[-1] if nq else 0)])
        tiles_q = q32[order_p].reshape(T, tile, d)
        # probe budget: every query's top-1 cluster is guaranteed coverage;
        # remaining slots ranked by the tile's pooled (min) distance
        tiles_top1 = top1[order_p].reshape(T, tile)
        tile_scores = scores[order_p].reshape(T, tile, -1).min(axis=1)  # (T, C)
        distinct = [np.unique(t) for t in tiles_top1]
        p = min(
            max(probes, max(len(u) for u in distinct) + probes // 2),
            C,
        )
        probe_ids = np.empty((T, p), dtype=np.int32)
        for t in range(T):
            u = distinct[t]
            rest = np.argsort(tile_scores[t], kind="stable")
            rest = rest[~np.isin(rest, u)]
            sel = np.concatenate([u, rest])[:p]
            if len(sel) < p:
                sel = np.concatenate([sel, np.full(p - len(sel), sel[0])])
            probe_ids[t] = sel
        dd, ii = ivf_stage2(
            self.data,
            jnp.asarray(tiles_q),
            jnp.asarray(probe_ids),
            k=k,
            metric=self.metric,
        )
        dd = np.asarray(dd).reshape(T * tile, k)
        ii = np.asarray(ii).reshape(T * tile, k)
        out_d = np.empty((nq, k), np.float32)
        out_i = np.empty((nq, k), np.int32)
        out_d[order] = dd[:nq]  # first nq rows map 1:1 onto `order`
        out_i[order] = ii[:nq]
        return out_i, out_d
