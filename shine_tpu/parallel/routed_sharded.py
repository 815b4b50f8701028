"""Cluster-sharded routed capacity serving: the multi-chip
RoutedSplitIndex (models/routed_split.py).

Clusters are dealt round-robin across the mesh (cluster c -> shard
c % S, local slot c // S — the owned-lane scheme of
parallel/ivf_sharded.py), each shard holds its (C/S + 1)*cap slice of
the cluster-major split tables (own PAD cluster last), and a search
batch runs SPMD:

  1. stage-1 probes + affinity sort + the rank-major column grant are
     computed identically on every shard (replicated queries/centroids,
     deterministic ops) — no exchange;
  2. each shard COMPACTS the granted columns to its owned lanes
     (stable sort keeps the rank-major priority order) and scans only
     those with the routed class-max kernel — P_loc ~ P/S lanes per
     shard instead of P, the S-fold work split;
  3. per-shard survivors carry GLOBAL row ids; one all_gather of the
     (B, kk) id lanes is the entire inter-chip traffic, and the exact
     regen re-rank of the S*kk union runs replicated.

Per-shard class-max states see only owned-cluster rows, so collision
loss is at most the single-chip kernel's; the gathered union is a
superset of any single shard's survivors. Lane overflow (a group
granted more owned columns than P_loc) is counted in last_overflow —
size shared_local against it; dropped columns degrade coverage
gracefully (lowest-priority first), never correctness.

Reference parity: the reference spreads its 100M envelope over 3-5
memory nodes and CNs READ only needed rows (memory_node.hh:112-125,
rdma_reads.hh:101-134); here the granted-column compaction plays the
owned-READ role and the id all_gather replaces the result RPC.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shine_tpu.parallel.mesh import SHARD_AXIS

P_ = jax.sharding.PartitionSpec


def _round_up(x: int, q: int) -> int:
    return -(-x // q) * q


class ShardedRoutedSplitIndex:
    """Cluster-sharded routed split serving. Build a single-chip
    RoutedSplitIndex (models/routed_split.py:build_routed_split with
    C % S == 0 via shards=) and wrap it with `from_single`."""

    def __init__(self, comp_sh, aux_sh, gid_sh, centroids, n, dim, metric,
                 mesh, *, C, cap, cls, row_source):
        self.comp = comp_sh  # (S*(C_loc+1)*cap, dpc) row-sharded
        self.aux_r = aux_sh  # (S*(C_loc+1), 2m, cls) sharded axis 0
        self.gid = gid_sh  # (S*(C_loc+1)*cap,) GLOBAL ids, row-sharded
        self.centroids = centroids  # replicated (C, d)
        self.n, self.dim, self.metric = n, dim, metric
        self.mesh = mesh
        self.C, self.cap, self.cls = C, cap, cls
        self.S = mesh.devices.size
        self.C_loc = C // self.S
        self.row_source = row_source
        self.last_coverage = None
        self.last_overflow = None
        self._runs: dict = {}

    @classmethod
    def from_single(klass, idx, mesh) -> "ShardedRoutedSplitIndex":
        """Re-deal a RoutedSplitIndex's cluster blocks round-robin onto
        the mesh. (At real scale per-shard tables would be ingested
        directly on their chips — this host re-layout is the
        CPU-mesh/test path; the SPMD search is the same either way.)"""
        assert idx.row_source is not None, (
            "sharded routed serving is capacity mode: needs a row-keyed "
            "row_source for the exact regen re-rank"
        )
        S = mesh.devices.size
        C, cap, cls = idx.C, idx.cap, idx.cls
        assert C % S == 0, f"C={C} not divisible by mesh size {S}; " \
            "build with shards=S"
        C_loc = C // S
        dpc = idx.comp.shape[1]
        members = cap // cls
        comp = np.asarray(idx.comp).reshape(C + 1, cap, dpc)
        aux = np.asarray(idx.aux_r)  # (C+1, 2m, cls)
        gid = np.asarray(idx.gid).reshape(C + 1, cap)
        own = np.arange(C).reshape(-1, S).T  # (S, C_loc): shard s owns s::S
        pad = C  # global pad cluster index
        comp_sh = np.concatenate(
            [np.concatenate([comp[own[s]], comp[pad:pad + 1]])
             for s in range(S)]
        ).reshape(S * (C_loc + 1) * cap, dpc)
        aux_sh = np.concatenate(
            [np.concatenate([aux[own[s]], aux[pad:pad + 1]])
             for s in range(S)]
        ).reshape(S * (C_loc + 1), 2 * members, cls)
        gid_sh = np.concatenate(
            [np.concatenate([gid[own[s]], gid[pad:pad + 1]])
             for s in range(S)]
        ).reshape(-1)
        from jax.sharding import NamedSharding

        row = NamedSharding(mesh, P_(SHARD_AXIS))
        ax0 = NamedSharding(mesh, P_(SHARD_AXIS, None, None))
        rep = NamedSharding(mesh, P_())
        return klass(
            jax.device_put(jnp.asarray(comp_sh), row),
            jax.device_put(jnp.asarray(aux_sh), ax0),
            jax.device_put(jnp.asarray(gid_sh), row),
            jax.device_put(idx.centroids, rep),
            idx.n, idx.dim, idx.metric, mesh,
            C=C, cap=cap, cls=cls, row_source=idx.row_source,
        )

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        probes: int = 32,
        shared: int = 0,
        shared_local: int = 0,
        tile: int = 64,
        kk: int = 0,
        batch_size: int = 2048,
        engine: str = "auto",
    ) -> tuple[np.ndarray, np.ndarray]:
        """SPMD routed search; knobs mirror RoutedSplitIndex.search.
        shared_local: per-shard compacted lane count P_loc (default
        2*ceil(P/S)+2, capped at P). kk here is PER-SHARD survivors
        (default max(4*k, 8*k//S))."""
        if engine == "auto":
            engine = "pallas" if jax.default_backend() == "tpu" else "xla"
        S = self.S
        if shared <= 0:
            shared = probes + probes // 2
        shared = min(shared, self.C)
        probes = min(probes, self.C)
        if shared_local <= 0:
            shared_local = min(shared, 2 * (-(-shared // S)) + 2)
        if kk <= 0:
            kk = max(4 * k, (8 * k) // S)
        kk = min(kk, self.cls)
        nq, d = queries.shape
        batch_size = max(tile, _round_up(min(batch_size, max(nq, 1)), tile))
        nq_pad = _round_up(nq, batch_size)
        q_all = np.zeros((nq_pad, d), np.float32)
        q_all[:nq] = queries.astype(np.float32)
        from jax.sharding import NamedSharding

        q_dev = jax.device_put(
            jnp.asarray(q_all), NamedSharding(self.mesh, P_())
        )
        key = (k, probes, shared, shared_local, tile, kk, batch_size,
               engine)
        if key not in self._runs:
            self._runs[key] = _make_routed_spmd(
                self.mesh, k, probes, shared, shared_local, tile, kk,
                self.metric, self.C, self.cap, self.cls, batch_size,
                engine,
            )
        run = self._runs[key]
        rs_key, rs_cents = self.row_source
        parts = []
        for lo in range(0, nq_pad, batch_size):
            parts.append(run(
                self.comp, self.aux_r, self.gid, self.centroids,
                q_dev, jnp.int32(lo), rs_key, rs_cents,
            ))
        out_d = np.asarray(jnp.concatenate([p[0] for p in parts]))[:nq]
        out_i = np.asarray(jnp.concatenate([p[1] for p in parts]))[:nq]
        self.last_coverage = float(np.mean(
            [np.asarray(p[2]) for p in parts]))
        self.last_overflow = int(np.sum([np.asarray(p[3]) for p in parts]))
        return out_i, out_d

    def cost_counters(self, nq: int, k: int = 10, *, probes: int = 32,
                      shared: int = 0, shared_local: int = 0,
                      tile: int = 64) -> dict:
        """Analytic per-run cost (statistics.hh:122-141 analogue)."""
        S = self.S
        if shared <= 0:
            shared = probes + probes // 2
        shared = min(shared, self.C)
        if shared_local <= 0:
            shared_local = min(shared, 2 * (-(-shared // S)) + 2)
        kk = max(4 * k, (8 * k) // S)
        groups = -(-nq // tile)
        row_bytes = self.comp.shape[1] * self.comp.dtype.itemsize + 12
        return {
            "distance_computations": nq * (self.C + shared * self.cap
                                           + S * kk),
            "scanned_rows": nq * min(shared, S * shared_local) * self.cap,
            "hbm_gather_bytes": groups * S * shared_local * self.cap
            * row_bytes,
            "ici_exchange_bytes": nq * kk * 4 * (S - 1)
            + nq * self.dim * 4 * (S - 1),
        }


def _make_routed_spmd(mesh, k, p, P, P_loc, T, kk, metric, C, cap, cls,
                      batch, engine):
    from shine_tpu.ops.distance import pairwise_distance, regen_rerank_topk
    from shine_tpu.models.routed_split import _route_cols, scan_select

    S = mesh.devices.size
    C_loc = C // S
    B = batch
    G = B // T

    def spmd(comp, aux_r, gid, cents, q_dev, lo, rs_key, rs_cents):
        q = jax.lax.dynamic_slice(q_dev, (lo, 0), (B, q_dev.shape[1]))
        q = q.astype(jnp.float32)
        # replicated stage-1 + routing: deterministic, no exchange
        scores1 = pairwise_distance(q, cents, metric)
        if C >= 4096 and p < C:
            _, probes_ = jax.lax.approx_max_k(
                -scores1, p, recall_target=0.999)
        else:
            _, probes_ = jax.lax.top_k(-scores1, p)
        if p > 1:
            perm = jnp.argsort(probes_[:, 1], stable=True)
            perm = perm[jnp.argsort(probes_[perm, 0], stable=True)]
        else:
            perm = jnp.argsort(probes_[:, 0], stable=True)
        inv = jnp.argsort(perm, stable=True)
        q_s = q[perm]
        cols, coverage = _route_cols(probes_[perm].reshape(G, T, p), C, P)
        # compact to owned lanes (stable: rank-major priority kept)
        my = jax.lax.axis_index(SHARD_AXIS)
        owned = (cols < C) & (cols % S == my)
        lcol = jnp.where(owned, cols // S, C_loc)
        order = jnp.argsort(
            jnp.where(owned, 0, 1).astype(jnp.int32), axis=1, stable=True
        )
        lcol_c = jnp.take_along_axis(lcol, order, axis=1)[:, :P_loc]
        n_owned = owned.sum(axis=1)
        overflow = jnp.sum(jnp.maximum(n_owned - P_loc, 0))
        cand = scan_select(
            comp, aux_r, gid, q_s, lcol_c, T=T, cap=cap, cls=cls, kk=kk,
            engine=engine,
        )
        # the whole inter-chip exchange: (S, B, kk) global-id lanes
        allc = jax.lax.all_gather(cand, SHARD_AXIS)
        allc = jnp.moveaxis(allc, 0, 1).reshape(B, S * kk)
        d_out, i_out = regen_rerank_topk(
            rs_key, rs_cents, q_s, allc, k, metric
        )
        overflow = jax.lax.psum(overflow, SHARD_AXIS)
        return d_out[inv], i_out[inv], coverage, overflow

    @jax.jit
    def run(comp, aux_r, gid, cents, q_dev, lo, rs_key, rs_cents):
        fn = jax.shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P_(SHARD_AXIS), P_(SHARD_AXIS, None, None),
                      P_(SHARD_AXIS), P_(), P_(), P_(), P_(), P_()),
            out_specs=(P_(), P_(), P_(), P_()),
            check_vma=False,
        )
        return fn(comp, aux_r, gid, cents, q_dev, lo, rs_key, rs_cents)

    return run
