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
    (cluster-major rows; -1-id padding; cap targets ~128 rows) so a probed
    cluster is one coarse contiguous 32-64 KB gather — no per-row
    scatter/gather;
  * probing is fully per-query: stage 1 scores all centroids with one
    (B, C) MXU tile and takes each query's top-p; stage 2 gathers the
    (B, p, cap, d) probe blocks, computes one (B, p*cap) bf16 distance
    einsum, top-ks, and exactly re-ranks the survivors in f32. One jit,
    no host round-trips. (An earlier tile-shared-probe design lost 30+
    recall points on heterogeneous batches — per-query probe sets are
    cheap at small caps because the gather stays block-granular.)

Recall is tuned by p (probes) like ef in HNSW.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from shine_tpu.config import METRIC_L2, metric_id
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
    # vectorized cluster-major fill: slot = rank within the cluster group
    # (a per-row Python loop here is minutes at 1M rows)
    order = np.argsort(assign, kind="stable")
    sa = assign[order]
    first = np.searchsorted(sa, np.arange(num_clusters))
    slot = np.arange(n, dtype=np.int64) - first[sa]
    blocks[sa, slot] = v32[order]
    block_ids[sa, slot] = order.astype(np.int32)
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


@partial(jax.jit, static_argnames=("k", "p", "metric", "rerank", "probe_chunk"))
def ivf_search(
    data: IVFData,
    queries: jnp.ndarray,  # (B, d)
    *,
    k: int,
    p: int,
    metric: int,
    rerank: int = 4,
    probe_chunk: int | None = None,
):
    """Per-query probed search: centroid scores -> top-p probes -> dense
    bf16 scan of the probe blocks -> exact f32 re-rank of the rerank*k
    survivors. Returns (ids, dists) (B, k)."""
    q = queries.astype(jnp.float32)
    B = q.shape[0]
    d = q.shape[1]
    cap = data.cap
    scores = pairwise_distance(q, data.centroids, metric)  # (B, C)
    _, probes = jax.lax.top_k(-scores, p)  # (B, p)
    qn = jnp.sum(q * q, axis=-1)
    qb = q.astype(jnp.bfloat16)

    def probe_dists(cols):  # (B, pc) probe columns -> ((B, pc, cap) dd, ids)
        blk = data.blocks[cols]  # (B, pc, cap, d) bf16
        sqs = data.block_sq[cols]
        ids = data.block_ids[cols]
        dots = jnp.einsum(
            "bd,bpcd->bpc", qb, blk, preferred_element_type=jnp.float32
        )
        if metric == METRIC_L2:
            dd = qn[:, None, None] - 2.0 * dots + sqs
        else:
            dd = 1.0 - dots
        return jnp.where(ids >= 0, dd, jnp.inf), ids

    # the (B, p, cap, d) probe gather at full p OOMs a 16 GB chip (p=64,
    # B=4096, cap=160, d=128 is 10.7 GB bf16 before XLA's f32 upconvert);
    # stream it over probe chunks with lax.scan so peak footprint is one
    # (B, pc, cap, d) block, keeping only the (B, p, cap) f32 dists
    chunk_bytes = B * cap * d * 2
    pc = probe_chunk or max(1, min(p, (1 << 29) // max(chunk_bytes, 1)))
    if pc >= p:
        dd, ids = probe_dists(probes)
        dd = dd.reshape(B, p * cap)
        flat_ids = ids.reshape(B, p * cap)
    else:
        while p % pc:
            pc -= 1  # p is static and small; pick a divisor
        xs = jnp.moveaxis(probes.reshape(B, p // pc, pc), 1, 0)  # (p/pc, B, pc)
        _, (dd, ids) = jax.lax.scan(
            lambda _, cols: (None, probe_dists(cols)), None, xs
        )  # (p/pc, B, pc, cap)
        dd = jnp.moveaxis(dd, 0, 1).reshape(B, p * cap)
        flat_ids = jnp.moveaxis(ids, 0, 1).reshape(B, p * cap)
    kk = min(max(rerank, 1) * k, p * cap)
    nd, sel = jax.lax.top_k(-dd, kk)
    cand = jnp.take_along_axis(flat_ids, sel, axis=1)  # (B, kk)
    d_out, i_out = rerank_topk(data.vectors, data.sqnorms, q, cand, k, metric)
    return i_out, d_out


class IVFIndex:
    """Clustered approximate index; probes tunes recall like ef."""

    def __init__(
        self,
        vectors: np.ndarray,
        *,
        num_clusters: int | None = None,
        target_cap: int = 128,
        metric: str | int = "l2",
        train_size: int = 100_000,
        seed: int = 1234,
    ):
        self.metric = metric_id(metric)
        n = vectors.shape[0]
        if num_clusters is None:
            # cap ~ target_cap rows per cluster: small enough that per-query
            # (B, p, cap, d) probe gathers stay HBM-friendly, large enough
            # for MXU-efficient dense scans
            num_clusters = max(8, -(-n // target_cap))
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
        batch_size: int = 2048,
        rerank: int = 4,
    ) -> tuple[np.ndarray, np.ndarray]:
        nq, d = queries.shape
        p = min(probes, self.data.num_clusters)
        batch_size = min(batch_size, max(nq, 1))
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        for lo in range(0, nq, batch_size):
            hi = min(lo + batch_size, nq)
            q = queries[lo:hi].astype(np.float32)
            if hi - lo < batch_size:
                q = np.concatenate(
                    [q, np.zeros((batch_size - (hi - lo), d), np.float32)]
                )
            ii, dd = ivf_search(
                self.data, jnp.asarray(q), k=k, p=p, metric=self.metric,
                rerank=rerank,
            )
            out_i[lo:hi] = np.asarray(ii)[: hi - lo]
            out_d[lo:hi] = np.asarray(dd)[: hi - lo]
        return out_i, out_d

    def cost_counters(self, nq: int, k: int = 10, *, probes: int = 8,
                      batch_size: int = 2048, rerank: int = 4) -> dict:
        """Analytic cost: every query scores all C centroids (stage 1),
        densely scans p probe blocks of cap rows (stage 2, bf16 gather),
        and exactly re-ranks rerank*k survivors in f32."""
        C, cap, d = self.data.num_clusters, self.data.cap, self.data.vectors.shape[1]
        p = min(probes, C)
        kk = min(max(rerank, 1) * k, p * cap)
        batches = -(-nq // max(batch_size, 1))
        return {
            "distance_computations": nq * (C + p * cap + kk),
            "scanned_rows": nq * p * cap,
            "hbm_gather_bytes": batches * C * d * 4
            + nq * (p * cap * d * 2 + kk * d * 4),
            "ici_exchange_bytes": 0,
        }
