"""Multi-chip IVF: clusters sharded over the mesh.

Cluster blocks (models/ivf.py layout) are row-sharded over the devices so
index capacity scales with chips. Probing is per-query (see models/ivf.py):
every chip computes the same (B, p) probe set from the replicated
centroids, masks the probes it does not own, scans its owned blocks, and
the per-shard survivor sets merge with one `all_gather` + sort — the same
tiny merge traffic as the sharded flat scan. The exact f32 re-rank of the
survivors runs host-side against the numpy base (a few dozen rows per
query), so no replicated f32 copy of the base is needed on device.

Masked (non-owned) probe lanes still occupy fixed einsum lanes — the
compute cost per chip is the full (B, p, cap) scan; what sharding buys is
HBM capacity and gather locality. Compacting owned probes into fewer lanes
is the planned next step once real multi-chip hardware is available to
measure on.

Structural analogue: the reference's k-means placement routes *queries* to
compute nodes (/root/reference/src/cache/placement.hh); here the same
clustering decides where the *data* lives, and cross-shard probes are
served by their owner — the MN relay (memory_node.hh:211-362) becomes an
all_gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P
from jax.sharding import PartitionSpec as P_  # alias where `P` names the
# routed union width

from shine_tpu.config import METRIC_L2, metric_id
from shine_tpu.models.ivf import build_ivf_layout
from shine_tpu.ops.distance import pairwise_distance
from shine_tpu.parallel.mesh import SHARD_AXIS


def _make_routed_search(
    mesh: Mesh, p: int, kk: int, metric: int, C_loc: int, P: int, tile: int
):
    """Sharded tile-shared probing (models/ivf.ivf_routed_search over a
    cluster-sharded layout). Stage 1, the affinity sort, and the per-tile
    rank-major unions are replicated deterministic compute (every shard
    derives the identical plan from the replicated centroids — the same
    trick the reference uses for Placement, kmeans.hh:169 seed 1234);
    each shard then scans only the union lanes it owns and the per-shard
    survivor sets merge with one all_gather. HBM gather per shard is
    ~the owned fraction of each union; masked lanes clip to block 0 (a
    cache-hot repeated fetch, not a real read)."""
    S = mesh.devices.size

    def spmd(blocks, block_sq, block_ids, centroids, queries):
        B, d = queries.shape
        cap = blocks.shape[1]
        G = B // tile
        T = tile
        C = S * C_loc
        q = queries.astype(jnp.float32)
        qn = jnp.sum(q * q, axis=-1)
        scores = pairwise_distance(q, centroids, metric)  # (B, C)
        if C >= 4096:
            _, probes = jax.lax.approx_max_k(-scores, p, recall_target=0.999)
        else:
            _, probes = jax.lax.top_k(-scores, p)
        if p > 1:
            perm = jnp.argsort(probes[:, 1], stable=True)
            perm = perm[jnp.argsort(probes[perm, 0], stable=True)]
        else:
            perm = jnp.argsort(probes[:, 0], stable=True)
        inv = jnp.argsort(perm, stable=True)
        q_s = q[perm]
        qn_s = qn[perm]
        probes_s = probes[perm].reshape(G, T, p)
        pos = jnp.broadcast_to(
            jnp.arange(T * p, dtype=jnp.int32).reshape(p, T).T, (G, T, p)
        )
        minpos = jnp.full((G, C), jnp.int32(2**30))
        minpos = minpos.at[jnp.arange(G)[:, None, None], probes_s].min(pos)
        neg, cols = jax.lax.top_k(-minpos, P)  # (G, P) global cluster ids
        colmask = neg > -(2**30)

        # owned lanes only: foreign lanes read block 0 and mask to -1
        my = jax.lax.axis_index(SHARD_AXIS)
        local = cols - my * C_loc
        mine = colmask & (local >= 0) & (local < C_loc)
        safe = jnp.clip(local, 0, C_loc - 1)
        blk = blocks[safe]  # (G, P, cap, d) bf16
        sqs = block_sq[safe]
        ids = jnp.where(mine[..., None], block_ids[safe], -1)
        qf = q_s.reshape(G, T, d)
        dots = jnp.einsum(
            "gtd,gpcd->gtpc", qf.astype(jnp.bfloat16), blk,
            preferred_element_type=jnp.float32,
        )
        if metric == METRIC_L2:
            dd = qn_s.reshape(G, T)[..., None, None] - 2.0 * dots + sqs[:, None]
        else:
            dd = 1.0 - dots
        dd = jnp.where(ids[:, None] >= 0, dd, jnp.inf).reshape(G, T, P * cap)
        fid = jnp.broadcast_to(ids.reshape(G, 1, P * cap), (G, T, P * cap))
        nd, sel = jax.lax.top_k(-dd, kk)
        cand = jnp.take_along_axis(fid, sel, axis=-1).reshape(B, kk)
        # merge per-shard survivors (each global survivor is in its owning
        # shard's top-kk, so the union contains the global top-kk)
        all_d = jax.lax.all_gather(-nd.reshape(B, kk), SHARD_AXIS)  # (S, B, kk)
        all_i = jax.lax.all_gather(cand, SHARD_AXIS)
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(B, S * kk)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(B, S * kk)
        key_i = jnp.where(all_i < 0, jnp.int32(2**31 - 1), all_i)
        md, _, mi = jax.lax.sort((all_d, key_i, all_i), dimension=1, num_keys=2)
        # undo the affinity sort so the host re-rank aligns with queries
        return md[:, :kk][inv], mi[:, :kk][inv]

    @jax.jit
    def run(blocks, block_sq, block_ids, centroids, queries):
        fn = jax.shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P_(SHARD_AXIS), P_(SHARD_AXIS), P_(SHARD_AXIS), P_(), P_()),
            out_specs=(P_(), P_()),
            check_vma=False,
        )
        return fn(blocks, block_sq, block_ids, centroids, queries)

    return run


def _make_search(mesh: Mesh, p: int, kk: int, metric: int, C_loc: int):
    S = mesh.devices.size

    def spmd(blocks, block_sq, block_ids, centroids, queries):
        B, d = queries.shape
        cap = blocks.shape[1]
        q = queries.astype(jnp.float32)
        qn = jnp.sum(q * q, axis=-1)
        scores = pairwise_distance(q, centroids, metric)  # (B, C) replicated
        _, probes = jax.lax.top_k(-scores, p)  # (B, p) global cluster ids
        my = jax.lax.axis_index(SHARD_AXIS)
        local = probes - my * C_loc
        mine = (local >= 0) & (local < C_loc)
        safe = jnp.clip(local, 0, C_loc - 1)
        blk = blocks[safe]  # (B, p, cap, d) bf16 — owned lanes real
        sqs = block_sq[safe]
        ids = jnp.where(mine[:, :, None], block_ids[safe], -1)
        dots = jnp.einsum(
            "bd,bpcd->bpc", q.astype(jnp.bfloat16), blk,
            preferred_element_type=jnp.float32,
        )
        if metric == METRIC_L2:
            dd = qn[:, None, None] - 2.0 * dots + sqs
        else:
            dd = 1.0 - dots
        dd = jnp.where(ids >= 0, dd, jnp.inf).reshape(B, p * cap)
        fid = ids.reshape(B, p * cap)
        nd, sel = jax.lax.top_k(-dd, kk)
        cand = jnp.take_along_axis(fid, sel, axis=1)  # (B, kk) local survivors
        all_d = jax.lax.all_gather(-nd, SHARD_AXIS)  # (S, B, kk)
        all_i = jax.lax.all_gather(cand, SHARD_AXIS)
        all_d = jnp.moveaxis(all_d, 0, 1).reshape(B, S * kk)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(B, S * kk)
        key_i = jnp.where(all_i < 0, jnp.int32(2**31 - 1), all_i)
        md, _, mi = jax.lax.sort((all_d, key_i, all_i), dimension=1, num_keys=2)
        return md[:, :kk], mi[:, :kk]

    @jax.jit
    def run(blocks, block_sq, block_ids, centroids, queries):
        fn = jax.shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(blocks, block_sq, block_ids, centroids, queries)

    return run


class ShardedIVFIndex:
    """Cluster-sharded approximate index over a device mesh."""

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        *,
        num_clusters: int | None = None,
        target_cap: int = 128,
        metric: str | int = "l2",
        train_size: int = 100_000,
        seed: int = 1234,
    ):
        self.metric = metric_id(metric)
        self.mesh = mesh
        S = mesh.devices.size
        n = vectors.shape[0]
        if num_clusters is None:
            num_clusters = max(8, -(-n // target_cap))
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
        batch_size: int = 2048,
        rerank: int = 4,
    ) -> tuple[np.ndarray, np.ndarray]:
        nq, d = queries.shape
        p = min(probes, self.C)
        kk = min(max(rerank, 1) * k, p * self.cap)
        batch_size = min(batch_size, max(nq, 1))
        key = (p, kk, batch_size)
        if key not in self._runs:
            self._runs[key] = _make_search(self.mesh, p, kk, self.metric, self.C_loc)
        run = self._runs[key]
        rep = NamedSharding(self.mesh, P())
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        for lo in range(0, nq, batch_size):
            hi = min(lo + batch_size, nq)
            q = queries[lo:hi].astype(np.float32)
            if hi - lo < batch_size:
                q = np.concatenate(
                    [q, np.zeros((batch_size - (hi - lo), d), np.float32)]
                )
            _, cand = run(
                self.blocks, self.block_sq, self.block_ids, self.centroids,
                jax.device_put(jnp.asarray(q), rep),
            )
            cand = np.asarray(cand)[: hi - lo]  # (b, kk)
            # exact host-side f32 re-rank of the survivors
            ii, dd = self._host_rerank(cand, q[: hi - lo], k)
            out_i[lo:hi] = ii
            out_d[lo:hi] = dd
        return out_i, out_d

    def _host_rerank(self, cand, q, k):
        """Exact f32 re-rank of device survivors against the numpy base."""
        safe = np.maximum(cand, 0)
        cv = self.base[safe]
        dots = np.einsum("bd,bkd->bk", q, cv)
        if self.metric == METRIC_L2:
            dist = (q * q).sum(-1)[:, None] - 2.0 * dots + (cv * cv).sum(-1)
        else:
            dist = 1.0 - dots
        dist = np.where(cand >= 0, dist, np.inf)
        ordk = np.lexsort(
            (np.where(cand < 0, 2**31 - 1, cand), dist), axis=1
        )[:, :k]
        return (
            np.take_along_axis(cand, ordk, axis=1),
            np.take_along_axis(dist, ordk, axis=1),
        )

    def search_routed(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        probes: int = 16,
        shared: int = 96,
        tile: int = 64,
        batch_size: int = 4096,
        rerank: int = 4,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Tile-shared probing over the cluster-sharded layout (see
        _make_routed_search). Results match the single-chip routed path's
        probe semantics; survivors re-rank exactly on the host."""
        nq, d = queries.shape
        p = min(probes, self.C)
        P = min(shared, self.C)
        kk = min(max(rerank, 1) * k, P * self.cap)
        batch_size = max(tile, -(-min(batch_size, max(nq, 1)) // tile) * tile)
        key = ("routed", p, kk, P, tile, batch_size)
        if key not in self._runs:
            self._runs[key] = _make_routed_search(
                self.mesh, p, kk, self.metric, self.C_loc, P, tile
            )
        run = self._runs[key]
        rep = NamedSharding(self.mesh, P_())
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        for lo in range(0, nq, batch_size):
            hi = min(lo + batch_size, nq)
            q = queries[lo:hi].astype(np.float32)
            if hi - lo < batch_size:
                q = np.concatenate(
                    [q, np.zeros((batch_size - (hi - lo), d), np.float32)]
                )
            _, cand = run(
                self.blocks, self.block_sq, self.block_ids, self.centroids,
                jax.device_put(jnp.asarray(q), rep),
            )
            cand = np.asarray(cand)[: hi - lo]
            ii, dd = self._host_rerank(cand, q[: hi - lo], k)
            out_i[lo:hi] = ii
            out_d[lo:hi] = dd
        return out_i, out_d

    def routed_cost_counters(self, nq: int, k: int = 10, *, probes: int = 16,
                             shared: int = 96, tile: int = 64,
                             rerank: int = 4) -> dict:
        """Analytic routed cost: the plan (stage 1 + sort + unions) is
        replicated on every shard; union blocks are fetched once per tile
        by their owners; per-shard survivors merge over ICI; exact re-rank
        on the host."""
        S = self.mesh.devices.size
        P = min(shared, self.C)
        kk = min(max(rerank, 1) * k, P * self.cap)
        d = self.base.shape[1]
        n_tiles = -(-nq // max(tile, 1))
        return {
            "distance_computations": nq * (self.C * S + P * self.cap * S + kk),
            "scanned_rows": nq * P * self.cap,
            "hbm_gather_bytes": n_tiles * P * self.cap * d * 2
            + nq * kk * d * 4,
            "ici_exchange_bytes": nq * d * 4 * (S - 1)
            + nq * kk * 8 * (S - 1),
        }

    def cost_counters(self, nq: int, k: int = 10, *, probes: int = 8,
                      batch_size: int = 2048, rerank: int = 4) -> dict:
        """Cluster-total analytic cost: centroid scoring is replicated on
        every shard; probed blocks are scanned by their owning shard; the
        (B, kk) candidate lanes are merged over ICI; the exact re-rank runs
        on the host against the id-ordered base."""
        S = self.mesh.devices.size
        p = min(probes, self.C)
        kk = min(max(rerank, 1) * k, p * self.cap)
        d = self.base.shape[1]
        batches = -(-nq // max(batch_size, 1))
        return {
            "distance_computations": nq * (self.C * S + p * self.cap + kk),
            "scanned_rows": nq * p * self.cap,
            "hbm_gather_bytes": batches * self.C * d * 4 * S
            + nq * (p * self.cap * d * 2 + kk * d * 4),
            "ici_exchange_bytes": nq * d * 4 * (S - 1) + nq * kk * 8 * (S - 1),
        }
