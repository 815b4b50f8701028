"""Multi-chip FastFlat: the class-max scan kernel over a row-sharded base.

Each chip holds a row-range of the packed score table (capacity scales with
chips), runs the fused class-max sweep (ops/pallas_scan3.py) over its own
rows, selects its local top-kb candidates, re-ranks them *exactly* in f32
against its own rows (owners hold the vectors), and one `all_gather` of
(B, kb) (dist, id) lanes merges the shards — the same tiny merge as
flat_sharded.py with the v3 kernel underneath.

On the virtual CPU mesh the kernel runs in interpret mode automatically
(pallas TPU lowering needs the real chip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from shine_tpu.config import METRIC_L2, metric_id
from shine_tpu.ops.distance import rerank_topk
from shine_tpu.ops.pallas_scan import pack_ext_query, pack_ext_table
from shine_tpu.ops.pallas_scan3 import classmax_scan
from shine_tpu.parallel.mesh import SHARD_AXIS


def _local_scan(ext, q_ext, B, kb, tq, tn, cls, interpret, keep2,
                fused_sel=False):
    """Per-shard fused class-max sweep -> (local candidate rows, their
    stage-1 scores, kb_eff). The scores feed the FREE prerank trim
    (ops/distance.py:score_trim) — no table re-read."""
    kb_eff = min(kb, cls)
    if keep2:
        # per-class runner-up (ops/pallas_scan3.py v4): recovers bf16
        # near-tie losses at large rows-per-class
        if fused_sel and not interpret:
            from shine_tpu.ops.pallas_scan3 import classmax2_topk_scan

            v1, c1, v2, c2 = classmax2_topk_scan(
                ext, q_ext, kb=kb_eff, tq=min(tq, B), tn=tn, cls=cls,
            )
        else:
            from shine_tpu.ops.pallas_scan3 import classmax2_scan

            m, r, m2, r2 = classmax2_scan(
                ext, q_ext, tq=min(tq, B), tn=tn, cls=cls,
                interpret=interpret,
            )
            v1, sel = jax.lax.top_k(m, kb_eff)
            c1 = jnp.take_along_axis(r, sel, axis=1)
            c2 = jnp.take_along_axis(r2, sel, axis=1)
            v2 = jnp.take_along_axis(m2, sel, axis=1)
        return (
            jnp.concatenate([c1, jnp.where(v2 > -3e38, c2, -1)], axis=1),
            jnp.concatenate([v1, v2], axis=1),
            kb_eff,
        )
    if fused_sel and not interpret:
        # v5 fused in-kernel top-kb (bit-identical, tests/test_pallas.py)
        from shine_tpu.ops.pallas_scan3 import classmax_topk_scan

        vals, rows = classmax_topk_scan(
            ext, q_ext, kb=kb_eff, tq=min(tq, B), tn=tn, cls=cls,
        )
        return rows, vals, kb_eff
    m, r = classmax_scan(
        ext, q_ext, tq=min(tq, B), tn=tn, cls=cls, interpret=interpret,
    )
    vals, sel = jax.lax.top_k(m, kb_eff)
    return jnp.take_along_axis(r, sel, axis=1), vals, kb_eff  # local rows


def _merge_shards(dd, gi, k):
    """all_gather the per-shard (B, kb) (dist, global id) lanes and take
    the global (dist, id)-ascending top-k — the whole inter-chip cost."""
    B = dd.shape[0]
    all_d = jax.lax.all_gather(dd, SHARD_AXIS)  # (S, B, kb)
    all_i = jax.lax.all_gather(gi, SHARD_AXIS)
    all_d = jnp.moveaxis(all_d, 0, 1).reshape(B, -1)
    all_i = jnp.moveaxis(all_i, 0, 1).reshape(B, -1)
    key_i = jnp.where(all_i < 0, jnp.int32(2**31 - 1), all_i)
    md, _, mi = jax.lax.sort((all_d, key_i, all_i), dimension=1, num_keys=2)
    return md[:, :k], mi[:, :k]


def _make_search(
    mesh: Mesh, k: int, kb: int, tq: int, cls: int, tn: int, metric: int,
    rows_per_shard: int, interpret: bool, keep2: bool = False,
    prerank: int = 0, fused_sel: bool = False,
):
    def spmd(ext, vectors, sqnorms, queries):
        B = queries.shape[0]
        q = queries.astype(jnp.float32)
        q_ext = pack_ext_query(q, ext.shape[1]).astype(jnp.bfloat16)
        cand_local, vals, kb_eff = _local_scan(
            ext, q_ext, B, kb, tq, tn, cls, interpret, keep2, fused_sel
        )
        cand_local = jnp.where(cand_local < vectors.shape[0], cand_local, -1)
        if prerank and k <= prerank < cand_local.shape[1]:
            # FREE stage-1 trim from the scan's own scores: shrinks BOTH
            # the exact-re-rank gather and the merge's all_gather lanes
            # (kb -> prerank per shard) at the cost of one (B, K) sort
            from shine_tpu.ops.distance import score_trim

            cand_local = score_trim(vals, cand_local, prerank)
            kb_eff = prerank
        # exact f32 re-rank against OWNED rows
        dd, ii = rerank_topk(vectors, sqnorms, q, cand_local, kb_eff, metric)
        my = jax.lax.axis_index(SHARD_AXIS)
        gi = jnp.where(ii >= 0, ii + my * rows_per_shard, -1)
        return _merge_shards(dd, gi, k)

    @jax.jit
    def run(ext, vectors, sqnorms, queries):
        fn = jax.shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(ext, vectors, sqnorms, queries)

    return run


def _make_search_ext(
    mesh: Mesh, k: int, kb: int, tq: int, cls: int, tn: int, metric: int,
    rows_per_shard: int, interpret: bool, keep2: bool = False,
    with_regen: bool = False, prerank: int = 0, fused_sel: bool = False,
):
    """Capacity-mode SPMD search: each shard holds ONLY its slice of the
    packed bf16 ext table (no f32 base anywhere — per-chip capacity is
    set by the 2-byte ext row alone). Re-rank is either bf16 ext rows
    (rerank_topk_ext) or, with a row-keyed source, EXACT f32 rows
    regenerated from the candidates' global ids in-jit
    (ops/distance.py:regen_rerank_topk). This is the configuration that
    scales to the reference's 100M-row envelope
    (/root/reference/src/memory_node.hh:112-125 — 44 GB/MN x 5 MN; here
    512 B/row x 100M over 8 chips = 6.4 GB/chip)."""
    from shine_tpu.ops.distance import regen_rerank_topk, rerank_topk_ext

    def spmd(ext, queries, *rs):
        B = queries.shape[0]
        q = queries.astype(jnp.float32)
        q_ext = pack_ext_query(q, ext.shape[1]).astype(jnp.bfloat16)
        cand_local, vals, kb_eff = _local_scan(
            ext, q_ext, B, kb, tq, tn, cls, interpret, keep2, fused_sel
        )
        cand_local = jnp.where(cand_local < ext.shape[0], cand_local, -1)
        my = jax.lax.axis_index(SHARD_AXIS)
        if with_regen:
            if prerank and k <= prerank < cand_local.shape[1]:
                # FREE trim before the O(candidates) threefry regen —
                # the trim reuses the scan's own scores (score_trim),
                # whose precision equals the stage that picked the
                # candidates, so the exact stage keeps its recall
                from shine_tpu.ops.distance import score_trim

                cand_local = score_trim(vals, cand_local, prerank)
                kb_eff = prerank
            rkey, centers = rs
            gid = jnp.where(
                cand_local >= 0, cand_local + my * rows_per_shard, -1
            )
            dd, gi = regen_rerank_topk(rkey, centers, q, gid, kb_eff, metric)
        else:
            dd, ii = rerank_topk_ext(ext, q, cand_local, kb_eff, metric)
            gi = jnp.where(ii >= 0, ii + my * rows_per_shard, -1)
        return _merge_shards(dd, gi, k)

    @jax.jit
    def run(ext, queries, *rs):
        fn = jax.shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS), P()) + (P(),) * len(rs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(ext, queries, *rs)

    return run


def _local_scan_split(comp, aux, q_pad, B, kb, tq, cls, interpret, keep2,
                      fused_sel=False):
    """Per-shard split-layout class-max sweep -> local candidate rows
    (ops/pallas_scan_split.py; tn follows the 8*cls Mosaic rule)."""
    from shine_tpu.ops.pallas_scan_split import classmax_scan_split

    n_loc = comp.shape[0]
    if interpret:
        tn = min(max(1024, cls), n_loc)
    else:
        tn = 8 * cls
        if tn < 16384 and n_loc % (2 * tn) == 0:
            tn *= 2
    kb_eff = min(kb, cls)
    if fused_sel and not interpret:
        # v5 fused in-kernel top-kb (bit-identical, tests/test_split.py)
        from shine_tpu.ops.pallas_scan_split import classmax_topk_scan_split

        # tq capped at 256: the fused split kernel's scoped-VMEM bill
        # (sweep state + DMA buffers + epilogue temps) exceeds the cap
        # at tq=512 x cls=2048 (models/flat.py, r3f measurement)
        out = classmax_topk_scan_split(
            comp, aux, q_pad, kb=kb_eff, tq=min(tq, B, 256), tn=tn,
            cls=cls, keep2=keep2,
        )
        if keep2:
            v1, c1, v2, c2 = out
            return (
                jnp.concatenate(
                    [c1, jnp.where(v2 > -3e38, c2, -1)], axis=1
                ),
                jnp.concatenate([v1, v2], axis=1),
                kb_eff,
            )
        return out[1], out[0], kb_eff
    out = classmax_scan_split(
        comp, aux, q_pad, tq=min(tq, B), tn=tn, cls=cls, keep2=keep2,
        interpret=interpret,
    )
    if keep2:
        m, r, m2, r2 = out
        v1, sel = jax.lax.top_k(m, kb_eff)
        c1 = jnp.take_along_axis(r, sel, axis=1)
        c2 = jnp.take_along_axis(r2, sel, axis=1)
        v2 = jnp.take_along_axis(m2, sel, axis=1)
        return (
            jnp.concatenate([c1, jnp.where(v2 > -3e38, c2, -1)], axis=1),
            jnp.concatenate([v1, v2], axis=1),
            kb_eff,
        )
    m, r = out
    vals, sel = jax.lax.top_k(m, kb_eff)
    return jnp.take_along_axis(r, sel, axis=1), vals, kb_eff


def _make_search_split(
    mesh: Mesh, k: int, kb: int, tq: int, cls: int, metric: int,
    rows_per_shard: int, interpret: bool, keep2: bool = False,
    with_regen: bool = False, prerank: int = 0, fused_sel: bool = False,
):
    """Capacity-mode SPMD search on the SPLIT layout: each shard holds
    its slice of the component table (bf16: 264 B/row, int8: 136 B/row
    at d=128) + the f32 aux pair — per-chip capacity 2-3.8x the packed
    ext layout, so an 8-chip slice reaches 500M-1B rows (the reference's
    whole-cluster envelope is 100M, memory_node.hh:112-125). Re-rank is
    split-table dequant or EXACT f32 regen via row_source."""
    from shine_tpu.ops.distance import regen_rerank_topk, rerank_topk_split
    from shine_tpu.ops.pallas_scan_split import pack_split_query

    def spmd(comp, aux, queries, *rs):
        B = queries.shape[0]
        q = queries.astype(jnp.float32)
        q_pad = pack_split_query(q, comp.shape[1])
        cand_local, vals, kb_eff = _local_scan_split(
            comp, aux, q_pad, B, kb, tq, cls, interpret, keep2, fused_sel
        )
        cand_local = jnp.where(cand_local < comp.shape[0], cand_local, -1)
        my = jax.lax.axis_index(SHARD_AXIS)
        if with_regen:
            if prerank and k <= prerank < cand_local.shape[1]:
                # FREE stage-1 trim from the scan's own scores before
                # the exact regen re-rank (same win as _make_search_ext)
                from shine_tpu.ops.distance import score_trim

                cand_local = score_trim(vals, cand_local, prerank)
                kb_eff = prerank
            rkey, centers = rs
            gid = jnp.where(
                cand_local >= 0, cand_local + my * rows_per_shard, -1
            )
            dd, gi = regen_rerank_topk(rkey, centers, q, gid, kb_eff, metric)
        else:
            dd, ii = rerank_topk_split(comp, aux, q, cand_local, kb_eff,
                                       metric)
            gi = jnp.where(ii >= 0, ii + my * rows_per_shard, -1)
        return _merge_shards(dd, gi, k)

    @jax.jit
    def run(comp, aux, queries, *rs):
        fn = jax.shard_map(
            spmd,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS), P(None, SHARD_AXIS), P())
            + (P(),) * len(rs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(comp, aux, queries, *rs)

    return run


class ShardedSplitFlatIndex:
    """Row-sharded capacity-mode k-NN on the split layout — the
    100M-1B-class serving configuration (see _make_search_split)."""

    def __init__(
        self,
        comp_dev,
        aux_dev,
        n: int,
        mesh: Mesh,
        metric: str | int = "l2",
        *,
        dim: int | None = None,
        row_source=None,
        interpret: bool | None = None,
    ):
        from shine_tpu.ops.pallas_scan_split import SPLIT_QUANTUM

        self.metric = metric_id(metric)
        self.mesh = mesh
        S = mesh.devices.size
        n_pad, dpc = comp_dev.shape
        assert n_pad % (SPLIT_QUANTUM * S) == 0 and n <= n_pad
        assert aux_dev.shape == (2, n_pad)
        row_sh = NamedSharding(mesh, P(SHARD_AXIS))
        aux_sh = NamedSharding(mesh, P(None, SHARD_AXIS))
        self.comp = jax.device_put(comp_dev, row_sh)
        self.aux = jax.device_put(aux_dev, aux_sh)
        self.n = n
        self.dim = dim if dim is not None else dpc
        self.rows = n_pad // S
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        self.row_source = row_source
        self.perm = None  # from_host shuffle map: packed id -> original
        self._runs: dict = {}

    @classmethod
    def from_host(
        cls,
        vectors: np.ndarray,
        mesh: Mesh,
        metric: str | int = "l2",
        *,
        comp_dtype: str = "int8",
        shuffle: bool = True,
        seed: int = 0,
    ) -> "ShardedSplitFlatIndex":
        """Pack a HOST-resident base into row-sharded split tables — the
        CLI/file-ingest route to mesh capacity serving (the row-keyed
        datasets take from_dataset instead). shuffle decorrelates class
        membership from file order (the class-collision model assumes
        it); search output maps packed ids back through the stored perm.
        Re-rank runs from the split tables (near-exact); attach a
        row_source afterwards for the exact-regen path."""
        from shine_tpu.ops.pallas_scan_split import (
            SPLIT_QUANTUM,
            pack_split_tables,
        )

        v = np.ascontiguousarray(vectors, dtype=np.float32)
        n, d = v.shape
        perm = None
        if shuffle:
            rng = np.random.default_rng(seed)
            perm = rng.permutation(n).astype(np.int32)
            v = v[perm]
        S = mesh.devices.size
        quantum = SPLIT_QUANTUM * S
        n_pad = -(-n // quantum) * quantum
        comp, aux = pack_split_tables(
            v, metric_id(metric), n_pad,
            comp_dtype=np.int8 if comp_dtype == "int8" else np.float16,
        )
        comp_dev = jnp.asarray(comp) if comp_dtype == "int8" else (
            jnp.asarray(comp).astype(jnp.bfloat16)
        )
        self = cls(comp_dev, jnp.asarray(aux), n, mesh, metric, dim=d)
        self.perm = perm
        return self

    @classmethod
    def from_dataset(cls, ds, mesh: Mesh, **kw) -> "ShardedSplitFlatIndex":
        """From io/device_synth.device_rowkeyed_split_dataset (already
        mesh-sharded when built with mesh=...)."""
        return cls(
            ds.comp_dev, ds.aux_dev, ds.n, mesh, ds.metric,
            row_source=ds.row_source, **kw,
        )

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        kb: int = 32,
        batch_size: int = 4096,
        tq: int = 512,
        cls: int = 0,
        keep2: bool | None = None,
        prerank: int = 0,
        fused_sel: bool | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        from shine_tpu.models.flat import keep2_auto

        if cls <= 0:
            cls = 1024 if keep2_auto(self.rows, 2048) else 2048
        if keep2 is None:
            keep2 = keep2_auto(self.rows, cls)
        kb = max(kb, k)
        if fused_sel is None:
            # the FastFlatIndex.search measured rule (r3f ablation);
            # keep2 fusion capped at kb<=32 (Mosaic register-spill OOM
            # at kb=81/dp=256, chip_plan_r4a stage C)
            fused_sel = (keep2 and kb <= 32) or kb <= 16
        nq, d = queries.shape
        batch_size = min(batch_size, max(nq, 1))
        batch_size = max(tq, -(-batch_size // tq) * tq)
        key = (k, kb, tq, cls, batch_size, keep2, prerank, fused_sel)
        if key not in self._runs:
            self._runs[key] = _make_search_split(
                self.mesh, k, kb, tq, cls, self.metric, self.rows,
                self.interpret, keep2=keep2,
                with_regen=self.row_source is not None, prerank=prerank,
                fused_sel=fused_sel,
            )
        run = self._runs[key]
        rep = NamedSharding(self.mesh, P())
        extra = tuple(self.row_source) if self.row_source is not None else ()
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        for lo in range(0, nq, batch_size):
            hi = min(lo + batch_size, nq)
            q = queries[lo:hi].astype(np.float32)
            if hi - lo < batch_size:
                q = np.concatenate(
                    [q, np.zeros((batch_size - (hi - lo), d), np.float32)]
                )
            qd = jax.device_put(jnp.asarray(q), rep)
            dd, ii = run(self.comp, self.aux, qd, *extra)
            out_d[lo:hi] = np.asarray(dd)[: hi - lo]
            out_i[lo:hi] = np.asarray(ii)[: hi - lo]
        out_i = np.where(out_i < self.n, out_i, -1)
        if self.perm is not None:  # from_host shuffle: map back
            out_i = np.where(
                out_i >= 0, self.perm[np.maximum(out_i, 0)], -1
            )
        return out_i, out_d

    def cost_counters(self, nq: int, k: int = 10, *, kb: int = 32,
                      batch_size: int = 4096) -> dict:
        S = self.mesh.devices.size
        n_pad = int(self.comp.shape[0])
        batches = -(-nq // max(batch_size, 1))
        table = int(self.comp.nbytes) + int(self.aux.nbytes)
        return {
            "distance_computations": nq * n_pad + nq * kb * S,
            "scanned_rows": nq * n_pad,
            "hbm_gather_bytes": batches * table
            + nq * kb * S * self.dim * 4,
            "ici_exchange_bytes": nq * self.dim * 4 * (S - 1)
            + nq * kb * 8 * (S - 1),
        }


class ShardedFastFlatIndex:
    """Row-sharded exact-ish k-NN with the fused class-max kernel."""

    def __init__(
        self,
        vectors: np.ndarray,
        mesh: Mesh,
        metric: str | int = "l2",
        *,
        tn: int = 1024,
        shuffle: bool = True,
        seed: int = 0,
        interpret: bool | None = None,
    ):
        self.metric = metric_id(metric)
        self.mesh = mesh
        S = mesh.devices.size
        v = np.ascontiguousarray(vectors, dtype=np.float32)
        n, d = v.shape
        self.perm = None
        if shuffle:
            rng = np.random.default_rng(seed)
            self.perm = rng.permutation(n).astype(np.int32)
            v = v[self.perm]
        quantum = 4096 * S
        n_pad = -(-n // quantum) * quantum
        ext = pack_ext_table(v, self.metric, n_pad)
        vpad = np.zeros((n_pad, d), np.float32)
        vpad[:n] = v
        sq = (vpad * vpad).sum(-1) if self.metric == METRIC_L2 else np.zeros(
            n_pad, np.float32
        )
        sq[n:] = np.inf
        row_sh = NamedSharding(mesh, P(SHARD_AXIS))
        self.ext = jax.device_put(jnp.asarray(ext, jnp.bfloat16), row_sh)
        self.vectors = jax.device_put(jnp.asarray(vpad), row_sh)
        self.sqnorms = jax.device_put(jnp.asarray(sq.astype(np.float32)), row_sh)
        self.n, self.dim, self.tn = n, d, tn
        self.rows = n_pad // S
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        self.row_source = None
        self._runs: dict = {}

    @classmethod
    def from_ext(
        cls,
        ext_dev,
        n: int,
        mesh: Mesh,
        metric: str | int = "l2",
        *,
        dim: int | None = None,
        row_source=None,
        tn: int = 1024,
        interpret: bool | None = None,
    ) -> "ShardedFastFlatIndex":
        """Sharded CAPACITY mode: row-shard the packed bf16 score table
        over the mesh with NO per-shard f32 base — per-chip rows are
        limited by the 2-byte ext row alone (~2x the exact-rerank
        layout; d=128 -> 512 B/row -> ~25M rows per 16 GB chip, so an
        8-chip v5e slice holds a 100-200M-row table, the reference's
        serving envelope, memory_node.hh:112-125). Re-rank per shard is
        bf16 ext rows, or EXACT f32 via row_source=(key, centers)
        regeneration (io/device_synth.py row-keyed datasets). Pair with
        device_rowkeyed_ext_dataset(mesh=...) for sharded streaming
        ingestion that never materializes the base."""
        self = cls.__new__(cls)
        self.metric = metric_id(metric)
        self.mesh = mesh
        S = mesh.devices.size
        n_pad, dp = ext_dev.shape
        assert n_pad % (4096 * S) == 0 and n <= n_pad
        row_sh = NamedSharding(mesh, P(SHARD_AXIS))
        self.ext = jax.device_put(ext_dev.astype(jnp.bfloat16), row_sh)
        self.vectors = None
        self.sqnorms = None
        self.perm = None
        if dim is None:
            dim = dp - 2 if self.metric == METRIC_L2 else dp
        self.n, self.dim, self.tn = n, dim, tn
        self.rows = n_pad // S
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        self.row_source = row_source
        self._runs = {}
        return self

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        kb: int = 0,
        batch_size: int = 4096,
        tq: int = 512,
        cls: int = 0,
        keep2: bool | None = None,
        prerank: int = 0,
        fused_sel: bool | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        from shine_tpu.models.flat import kb_auto, keep2_auto

        if kb <= 0:
            # per-shard row count: the scan (and its kb candidate margin)
            # is shard-local; the r4f kb rule applies at the shard scale
            kb = kb_auto(self.rows, self.dim)
        if cls <= 0:
            # same measured auto-cls rule as FastFlatIndex.search, on the
            # per-shard row count (the scan is shard-local)
            cls = 1024 if keep2_auto(self.rows, 2048) else 2048
        if keep2 is None:
            keep2 = keep2_auto(self.rows, cls)
        kb = max(kb, k)
        if fused_sel is None:
            # the FastFlatIndex.search measured rule (r3f ablation);
            # keep2 fusion capped at kb<=32 (Mosaic register-spill OOM
            # at kb=81/dp=256, chip_plan_r4a stage C)
            fused_sel = (keep2 and kb <= 32) or kb <= 16
        nq, d = queries.shape
        batch_size = min(batch_size, max(nq, 1))
        batch_size = max(tq, -(-batch_size // tq) * tq)
        capacity = self.vectors is None
        key = (k, kb, tq, cls, batch_size, keep2, prerank, fused_sel)
        if key not in self._runs:
            if capacity:
                self._runs[key] = _make_search_ext(
                    self.mesh, k, kb, tq, cls, max(self.tn, cls),
                    self.metric, self.rows, self.interpret, keep2=keep2,
                    with_regen=self.row_source is not None,
                    prerank=prerank, fused_sel=fused_sel,
                )
            else:
                self._runs[key] = _make_search(
                    self.mesh, k, kb, tq, cls, max(self.tn, cls),
                    self.metric, self.rows, self.interpret, keep2=keep2,
                    prerank=prerank, fused_sel=fused_sel,
                )
        run = self._runs[key]
        rep = NamedSharding(self.mesh, P())
        extra = ()
        if capacity and self.row_source is not None:
            extra = tuple(self.row_source)
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        for lo in range(0, nq, batch_size):
            hi = min(lo + batch_size, nq)
            q = queries[lo:hi].astype(np.float32)
            if hi - lo < batch_size:
                q = np.concatenate(
                    [q, np.zeros((batch_size - (hi - lo), d), np.float32)]
                )
            qd = jax.device_put(jnp.asarray(q), rep)
            if capacity:
                dd, ii = run(self.ext, qd, *extra)
            else:
                dd, ii = run(self.ext, self.vectors, self.sqnorms, qd)
            out_d[lo:hi] = np.asarray(dd)[: hi - lo]
            out_i[lo:hi] = np.asarray(ii)[: hi - lo]
        # shards whose row range is entirely padding return pad rows with
        # inf dists; inside shard_map the local `cand_local < rows` mask
        # can't see the global n, so drop ids >= n here before the perm
        # remap (which is only n long)
        out_i = np.where(out_i < self.n, out_i, -1)
        if self.perm is not None:
            out_i = np.where(out_i >= 0, self.perm[np.maximum(out_i, 0)], -1)
        return out_i, out_d

    def cost_counters(self, nq: int, k: int = 10, *, kb: int = 0,
                      batch_size: int = 4096) -> dict:
        """Cluster-total analytic cost: each batch streams the full (row-
        sharded) ext table once; each shard re-ranks kb local survivors;
        the merge all_gathers (B, kb) (dist, id) lanes. kb=0 resolves via
        the same kb_auto rule search() uses, so the counters report the
        actual auto serving config."""
        if kb <= 0:
            from shine_tpu.models.flat import kb_auto

            kb = kb_auto(self.rows, self.dim)
        S = self.mesh.devices.size
        n_pad = int(self.ext.shape[0])
        batches = -(-nq // max(batch_size, 1))
        return {
            "distance_computations": nq * n_pad + nq * kb * S,
            "scanned_rows": nq * n_pad,
            "hbm_gather_bytes": batches * int(self.ext.nbytes)
            + nq * kb * S * self.dim * 4,
            "ici_exchange_bytes": nq * self.dim * 4 * (S - 1)
            + nq * kb * 8 * (S - 1),
        }
