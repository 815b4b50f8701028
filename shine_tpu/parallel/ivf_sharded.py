"""Multi-chip IVF: clusters sharded over the mesh.

Cluster blocks (models/ivf.py layout) are row-sharded over the devices, so
index capacity scales with chips; each query tile's probe list is split by
owner (host-side, statically known), every shard scans only the probed
clusters it owns, and the per-shard top-k survivor sets are merged with one
`all_gather` + sort — the same tiny merge traffic as the sharded flat scan.
The exact f32 re-rank of the ~4k survivors per query runs on the host
against the numpy base (a few dozen rows per query), so no replicated f32
copy of the base is needed on device.

This is the closest structural analogue to the reference's cluster: the
k-means placement that routes queries to compute nodes
(/root/reference/src/cache/placement.hh) here decides *where the data
lives*, and probes that cross shards are handled by the owner — the MN
relay (memory_node.hh:211-362) becomes an all_gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from shine_tpu.config import METRIC_L2, metric_id
from shine_tpu.models.ivf import IVFData, build_ivf_layout, ivf_stage1
from shine_tpu.parallel.mesh import SHARD_AXIS


def _make_stage2(mesh: Mesh, kk: int, metric: int, clusters_per_shard: int):
    S = mesh.devices.size

    def spmd(blocks, block_sq, block_ids, tiles_q, probes_local):
        """blocks (C_loc, cap, d) bf16; probes_local (T, p) local cluster
        rows, -1 = not owned / pad."""
        T, G, d = tiles_q.shape
        p = probes_local.shape[1]
        cap = blocks.shape[1]
        q = tiles_q.astype(jnp.float32)
        qn = jnp.sum(q * q, axis=-1)
        safe = jnp.maximum(probes_local, 0)
        blk = blocks[safe]  # (T, p, cap, d)
        sqs = block_sq[safe]
        ids = block_ids[safe]
        owned = (probes_local >= 0)[:, :, None]  # (T, p, 1)
        ids = jnp.where(owned, ids, -1)
        dots = jnp.einsum(
            "tgd,tpcd->tgpc", q.astype(jnp.bfloat16), blk,
            preferred_element_type=jnp.float32,
        )
        if metric == METRIC_L2:
            dd = qn[:, :, None, None] - 2.0 * dots + sqs[:, None, :, :]
        else:
            dd = 1.0 - dots
        dd = jnp.where(ids[:, None, :, :] >= 0, dd, jnp.inf)
        dd = dd.reshape(T, G, p * cap)
        fid = jnp.broadcast_to(ids.reshape(T, 1, p * cap), (T, G, p * cap))
        nd, sel = jax.lax.top_k(-dd, kk)
        cand = jnp.take_along_axis(fid, sel, axis=2)
        # merge survivor sets across shards (cf. flat_sharded merge)
        all_d = jax.lax.all_gather(-nd, SHARD_AXIS)  # (S, T, G, kk)
        all_i = jax.lax.all_gather(cand, SHARD_AXIS)
        all_d = jnp.moveaxis(all_d, 0, 2).reshape(T, G, S * kk)
        all_i = jnp.moveaxis(all_i, 0, 2).reshape(T, G, S * kk)
        key_i = jnp.where(all_i < 0, jnp.int32(2**31 - 1), all_i)
        md, _, mi = jax.lax.sort((all_d, key_i, all_i), dimension=2, num_keys=2)
        return md[:, :, :kk], mi[:, :, :kk]

    @jax.jit
    def run(blocks, block_sq, block_ids, tiles_q, probes_local):
        fn = jax.shard_map(
            spmd,
            mesh=mesh,
            in_specs=(
                P(SHARD_AXIS),
                P(SHARD_AXIS),
                P(SHARD_AXIS),
                P(),
                P(SHARD_AXIS),  # (S*T, p) -> each shard sees its (T, p)
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(blocks, block_sq, block_ids, tiles_q, probes_local)

    return run


class ShardedIVFIndex:
    """Cluster-sharded approximate index over a device mesh."""

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        *,
        num_clusters: int | None = None,
        metric: str | int = "l2",
        train_size: int = 100_000,
        seed: int = 1234,
    ):
        self.metric = metric_id(metric)
        self.mesh = mesh
        S = mesh.devices.size
        n = vectors.shape[0]
        if num_clusters is None:
            num_clusters = max(8, int(np.sqrt(n) * 2))
        num_clusters = -(-num_clusters // S) * S  # pad C to the mesh
        data = build_ivf_layout(
            vectors, num_clusters, metric=self.metric,
            train_size=train_size, seed=seed,
        )
        row_sh = NamedSharding(mesh, P(SHARD_AXIS))
        rep = NamedSharding(mesh, P())
        self.blocks = jax.device_put(data.blocks, row_sh)
        self.block_sq = jax.device_put(data.block_sq, row_sh)
        self.block_ids = jax.device_put(data.block_ids, row_sh)
        self.centroids = jax.device_put(data.centroids, rep)
        self._cent_host = np.asarray(data.centroids)
        self.C = num_clusters
        self.C_loc = num_clusters // S
        self.cap = data.cap
        self.base = np.ascontiguousarray(vectors, dtype=np.float32)
        self.n = n
        self._runs: dict = {}

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        probes: int = 8,
        tile: int = 256,
        rerank: int = 4,
    ) -> tuple[np.ndarray, np.ndarray]:
        from shine_tpu.ops.distance import pairwise_distance

        nq, d = queries.shape
        S = self.mesh.devices.size
        q32 = queries.astype(np.float32)
        scores = np.asarray(
            pairwise_distance(
                jnp.asarray(q32), jnp.asarray(self._cent_host), self.metric
            )
        )
        top1 = np.argmin(scores, axis=1)
        order = np.argsort(top1, kind="stable")
        T = -(-nq // tile)
        pad = T * tile - nq
        order_p = np.concatenate([order, np.full(pad, order[-1] if nq else 0)])
        tiles_q = q32[order_p].reshape(T, tile, d)
        tiles_top1 = top1[order_p].reshape(T, tile)
        tile_scores = scores[order_p].reshape(T, tile, -1).min(axis=1)
        distinct = [np.unique(t) for t in tiles_top1]
        p = min(max(probes, max(len(u) for u in distinct) + probes // 2), self.C)
        probe_ids = np.empty((T, p), dtype=np.int64)
        for t in range(T):
            u = distinct[t]
            rest = np.argsort(tile_scores[t], kind="stable")
            rest = rest[~np.isin(rest, u)]
            sel = np.concatenate([u, rest])[:p]
            if len(sel) < p:
                sel = np.concatenate([sel, np.full(p - len(sel), sel[0])])
            probe_ids[t] = sel

        # split probes by owning shard -> local cluster rows, -1 pads
        probes_local = np.full((S, T, p), -1, dtype=np.int32)
        owner = probe_ids // self.C_loc
        local = (probe_ids % self.C_loc).astype(np.int32)
        for s in range(S):
            for t in range(T):
                mine = np.where(owner[t] == s)[0]
                probes_local[s, t, : len(mine)] = local[t][mine]

        kk = min(max(rerank, 1) * k, p * self.cap)
        key = (tiles_q.shape, p, kk)
        if key not in self._runs:
            self._runs[key] = _make_stage2(self.mesh, kk, self.metric, self.C_loc)
        run = self._runs[key]
        row_sh = NamedSharding(self.mesh, P(SHARD_AXIS))
        rep = NamedSharding(self.mesh, P())
        dd, ii = run(
            self.blocks,
            self.block_sq,
            self.block_ids,
            jax.device_put(jnp.asarray(tiles_q), rep),
            jax.device_put(
                jnp.asarray(probes_local.reshape(S * T, p)), row_sh
            ),
        )
        cand = np.asarray(ii).reshape(T * tile, kk)[: len(order_p)]

        # exact host-side f32 re-rank of the survivors
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        cand = cand[:nq]
        safe = np.maximum(cand, 0)
        cv = self.base[safe]  # (nq, kk, d)
        qr = q32[order_p[:nq]]
        dots = np.einsum("bd,bkd->bk", qr, cv)
        if self.metric == METRIC_L2:
            dist = (
                (qr * qr).sum(-1)[:, None]
                - 2.0 * dots
                + (cv * cv).sum(-1)
            )
        else:
            dist = 1.0 - dots
        dist = np.where(cand >= 0, dist, np.inf)
        ordk = np.lexsort(
            (np.where(cand < 0, 2**31 - 1, cand), dist), axis=1
        )[:, :k]
        dd_s = np.take_along_axis(dist, ordk, axis=1).astype(np.float32)
        ii_s = np.take_along_axis(cand, ordk, axis=1).astype(np.int32)
        out_i[order_p[:nq]] = ii_s
        out_d[order_p[:nq]] = dd_s
        return out_i, out_d
