"""Exact brute-force k-NN — the MXU-native fast path.

The reference exists because CPU distance computation over a large base is
too slow, so it prunes with an HNSW graph (~0.1% of points visited per
query at the cost of pointer-chasing). On TPU the trade flips: a dense
(B, N) distance tile runs on the 128x128 systolic array at hundreds of
TFLOP/s with perfectly sequential HBM reads, while graph traversal is
gather-latency-bound. Up to ~10M rows per chip, *exact* search at recall
1.0 outruns the reference's approximate QPS envelope — so this framework
ships brute force as a first-class index (the same role brute force plays
as the reference's ground-truth oracle, compute_node.cc:578-600, promoted
to the serving path).

Distances stream in base-chunks with a running top-k (jax.lax.top_k over
[current top-k | chunk]), so HBM working memory stays O(B x chunk) for any
N. Matmuls run in bf16 with f32 accumulation by default (~4x MXU rate);
exact f32 re-ranking of the top candidates recovers full precision
ordering.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from shine_tpu.config import METRIC_L2, metric_id


class FlatData(NamedTuple):
    vectors: jnp.ndarray  # (N_pad, d) f32, zero rows beyond n
    vectors_bf16: jnp.ndarray  # (N_pad, d) bf16
    sqnorms: jnp.ndarray  # (N_pad,) f32 (inf beyond n)
    n: jnp.ndarray  # () i32 — real row count (N_pad is a multiple of
    # CHUNK_QUANTUM so dynamic_slice never clamps and ids stay aligned)


CHUNK_QUANTUM = 1024

# from_device auto-shuffle ceiling: the on-device permutation costs one
# extra f32 base copy in HBM during the gather; above this it is skipped
# (the 10M+ paths were measured without it — see from_device docstring).
SHUFFLE_MAX_BYTES = int(
    os.environ.get("SHINE_SHUFFLE_MAX_BYTES", 3 << 30)
)


@jax.jit
def _row_sq(v: jnp.ndarray) -> jnp.ndarray:
    """Fused row squared-norms. MUST stay jitted: called eagerly,
    `v * v` materializes a second base-sized buffer — at 16.78M x 128
    f32 that is +8.6 GB and the 16 GB chip OOMs (chip_plan_r4a stage
    B); under jit XLA fuses the contraction into the row reduction.
    Rides squared_norms: these norms rank rows (re-rank term), so they
    must carry HIGHEST precision (ops/distance.py docstring)."""
    from shine_tpu.ops.distance import squared_norms

    return squared_norms(v)


@partial(
    jax.jit,
    static_argnames=("k", "chunk", "metric", "use_bf16", "rerank", "approx"),
)
def flat_search(
    data: FlatData,
    queries: jnp.ndarray,  # (B, d)
    *,
    k: int,
    chunk: int = 65536,
    metric: int = METRIC_L2,
    use_bf16: bool = True,
    rerank: int = 4,
    approx: bool = False,
):
    """Streaming exact top-k. Returns (dists (B, k), ids (B, k)).

    With use_bf16, the scan keeps rerank*k candidates (bf16 rounding can
    reorder near-ties) and the f32 re-rank picks the final k."""
    q = queries.astype(jnp.float32)
    B = q.shape[0]
    N_pad = data.vectors.shape[0]
    chunk = min(chunk, N_pad)
    if chunk % CHUNK_QUANTUM and chunk != N_pad:
        raise ValueError(f"chunk must be a multiple of {CHUNK_QUANTUM}")
    qn = jnp.sum(q * q, axis=-1)
    qc = q.astype(jnp.bfloat16) if use_bf16 else q
    base = data.vectors_bf16 if use_bf16 else data.vectors
    kk = min(max(rerank, 1) * k, N_pad) if use_bf16 else k

    def scan_chunk(off, carry, width):
        bd, bi = carry
        blk = jax.lax.dynamic_slice_in_dim(base, off, width, 0)
        bsq = jax.lax.dynamic_slice_in_dim(data.sqnorms, off, width, 0)
        # With f32 inputs (use_bf16=False — the exact path every device
        # ground truth rides) the precision arg is load-bearing: TPU
        # DEFAULT matmul precision truncates f32 operands to bf16, which
        # silently degraded device GT to bf16-grade at >=1M rows where
        # top-k gaps sit below bf16 noise (the r4 "1M x 128 recall
        # 0.9296" anomaly: every exact search scored ~0.93 against the
        # perturbed GT while CPU/interpret read 1.0). bf16 inputs hit
        # the MXU natively; precision only matters for the f32 leg.
        dots = jax.lax.dot_general(
            qc, blk, (((1,), (1,)), ((), ())),
            precision=None if use_bf16 else jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if metric == METRIC_L2:
            dd = qn[:, None] - 2.0 * dots + bsq[None, :]
        else:
            dd = 1.0 - dots
        ids = off + jax.lax.broadcasted_iota(jnp.int32, (B, width), 1)
        # mask construction padding: rows >= n, plus inf-sqnorm sentinel
        # rows (covers the IP metric, whose distance ignores sqnorms)
        dd = jnp.where((ids < data.n) & jnp.isfinite(bsq)[None, :], dd, jnp.inf)
        all_d = jnp.concatenate([bd, dd], axis=1)
        all_i = jnp.concatenate([bi, ids], axis=1)
        if approx:
            # TPU-optimized approximate top-k (recall_target trades a tiny
            # chance of dropping a true neighbor for much faster reduction;
            # the f32 re-rank below keeps ordering exact for survivors)
            nd, sel = jax.lax.approx_max_k(-all_d, kk, recall_target=0.99)
        else:
            nd, sel = jax.lax.top_k(-all_d, kk)
        return -nd, jnp.take_along_axis(all_i, sel, axis=1)

    bd = jnp.full((B, kk), jnp.inf, jnp.float32)
    bi = jnp.full((B, kk), -1, jnp.int32)
    num_full = N_pad // chunk
    bd, bi = jax.lax.fori_loop(
        0, num_full, lambda i, c: scan_chunk(i * chunk, c, chunk), (bd, bi)
    )
    rem = N_pad - num_full * chunk
    if rem:
        bd, bi = scan_chunk(jnp.int32(num_full * chunk), (bd, bi), rem)
    if use_bf16:
        # exact f32 re-rank of the survivors
        cv = data.vectors[jnp.maximum(bi, 0)]  # (B, k, d)
        dots = jnp.einsum(
            "bd,bkd->bk", q, cv, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        if metric == METRIC_L2:
            bd = qn[:, None] - 2.0 * dots + data.sqnorms[jnp.maximum(bi, 0)]
        else:
            bd = 1.0 - dots
        bd = jnp.where(bi >= 0, bd, jnp.inf)
        order = jnp.argsort(bd, axis=1)[:, :k]
        bd = jnp.take_along_axis(bd, order, axis=1)
        bi = jnp.take_along_axis(bi, order, axis=1)
    return bd, bi


class FlatIndex:
    """Exact k-NN index (recall 1.0 by construction)."""

    def __init__(self, vectors: np.ndarray, metric: str | int = "l2"):
        self.metric = metric_id(metric)
        v = np.ascontiguousarray(vectors, dtype=np.float32)
        n, dim = v.shape
        n_pad = -(-n // CHUNK_QUANTUM) * CHUNK_QUANTUM
        if n_pad != n:
            v = np.concatenate([v, np.zeros((n_pad - n, dim), np.float32)])
        vj = jnp.asarray(v)
        sq = (
            _row_sq(vj)
            if self.metric == METRIC_L2
            else jnp.zeros(n_pad, jnp.float32)
        )
        sq = jnp.where(jnp.arange(n_pad) < n, sq, jnp.inf)
        self.data = FlatData(
            vj, vj.astype(jnp.bfloat16), sq, jnp.int32(n)
        )
        self.n, self.dim = n, dim

    @classmethod
    def from_device(
        cls, v_dev, metric: str | int = "l2", *, with_bf16: bool = True
    ) -> "FlatIndex":
        """Build from a device-resident base without a host round trip.
        with_bf16=False aliases the bf16 slot to the f32 array (no copy) —
        for exact-only use, e.g. on-device ground truth at 10M rows where
        the extra 2.5 GB copy matters."""
        self = cls.__new__(cls)
        self.metric = metric_id(metric)
        n, dim = v_dev.shape
        n_pad = -(-n // CHUNK_QUANTUM) * CHUNK_QUANTUM
        vj = v_dev.astype(jnp.float32)
        if n_pad != n:
            vj = jnp.concatenate(
                [vj, jnp.zeros((n_pad - n, dim), jnp.float32)]
            )
        sq = (
            _row_sq(vj)
            if self.metric == METRIC_L2
            else jnp.zeros(n_pad, jnp.float32)
        )
        sq = jnp.where(jnp.arange(n_pad) < n, sq, jnp.inf)
        vb = vj.astype(jnp.bfloat16) if with_bf16 else vj
        self.data = FlatData(vj, vb, sq, jnp.int32(n))
        self.n, self.dim = n, dim
        return self

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        batch_size: int = 4096,
        chunk: int = 65536,
        use_bf16: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        nq, d = queries.shape
        out_i = np.empty((nq, k), dtype=np.int32)
        out_d = np.empty((nq, k), dtype=np.float32)
        batch_size = min(batch_size, max(nq, 1))
        for lo in range(0, nq, batch_size):
            hi = min(lo + batch_size, nq)
            q = queries[lo:hi].astype(np.float32)
            if hi - lo < batch_size:
                q = np.concatenate(
                    [q, np.zeros((batch_size - (hi - lo), d), np.float32)]
                )
            dd, ii = flat_search(
                self.data,
                jnp.asarray(q),
                k=k,
                chunk=chunk,
                metric=self.metric,
                use_bf16=use_bf16,
            )
            out_d[lo:hi] = np.asarray(dd)[: hi - lo]
            out_i[lo:hi] = np.asarray(ii)[: hi - lo]
        return out_i, out_d

    def cost_counters(self, nq: int, k: int = 10, *, batch_size: int = 4096,
                      use_bf16: bool = True) -> dict:
        """Analytic per-run cost (reference ThreadStatistics analogue,
        statistics.hh:122-141): a dense scan's costs are exact functions of
        the shapes — every query scores every row, and every batch streams
        the whole table from HBM once."""
        n_pad = int(self.data.vectors.shape[0])
        batches = -(-nq // max(batch_size, 1))
        table = n_pad * self.dim * (2 if use_bf16 else 4)
        rerank = (2 * k) * self.dim * 4 if use_bf16 else 0
        return {
            "distance_computations": nq * n_pad + (nq * 2 * k if use_bf16 else 0),
            "scanned_rows": nq * n_pad,
            "hbm_gather_bytes": batches * table + nq * rerank,
            "ici_exchange_bytes": 0,
        }


@partial(jax.jit, static_argnames=("metric", "dp", "rchunk"))
def _pack_ext_device(v: jnp.ndarray, *, metric: int, dp: int,
                     rchunk: int = 65536):
    """On-device bf16 packing of the fused-scan score table (the device
    twin of ops/pallas_scan.pack_ext_table, minus pad rows — callers
    guarantee n % 4096 == 0). scan stacks chunks straight into the output
    so peak extra HBM is one (rchunk, dp) tile."""
    n, d = v.shape
    rchunk = min(rchunk, n)
    while n % rchunk:
        rchunk //= 2
    xs = v.reshape(n // rchunk, rchunk, d)

    def body(_, x):
        e = jnp.zeros((rchunk, dp), jnp.bfloat16)
        if metric == METRIC_L2:
            e = e.at[:, :d].set((2.0 * x).astype(jnp.bfloat16))
            # residual-encoded norm (see pack_ext_table): c0 + c1 carry
            # ~16 mantissa bits of -||v||^2 — worthless unless t itself
            # is exact f32, hence squared_norms (HIGHEST precision)
            from shine_tpu.ops.distance import squared_norms

            t = -squared_norms(x)
            c0 = t.astype(jnp.bfloat16)
            e = e.at[:, d].set(c0)
            e = e.at[:, d + 1].set(
                (t - c0.astype(jnp.float32)).astype(jnp.bfloat16)
            )
        else:
            e = e.at[:, :d].set(x.astype(jnp.bfloat16))
        return None, e

    _, ext = jax.lax.scan(body, None, xs)
    return ext.reshape(n, dp)


def kb_auto(n_rows: int, dim: int) -> int:
    """Measured kb default (r4f chip ablation against exact GT,
    results/diag_1m_recall.jsonl): kb=32 holds >=0.992 below ~1M rows at
    d<512, but at 1M x 128 the candidate margin thins — keep2 kb32 scores
    0.9914 vs kb64 = 1.0000 for ~6% QPS — so kb rises to 64 once the row
    count crosses 1M. bf16 score near-ties widen with dimension: d>=512
    keeps the kb=128 margin (measured: d=960 needs 128 for 0.988)."""
    if dim >= 512:
        return 128
    return 64 if n_rows >= 1_000_000 else 32


def keep2_auto(n_rows: int, cls: int) -> bool:
    """Measured keep2 default (TPU_NOTES '1M x 64 keep2 refresh'): the
    per-class runner-up slot pays for itself once rows-per-class reaches
    ~500 — the regime where a single bf16 class slot starts losing
    one-decoy near-ties (at 1M x 64 keep2 lifts recall 0.995 -> 0.9999
    for ~14% QPS; at 200k rows/cls ~195 it only costs QPS)."""
    return n_rows // max(cls, 1) >= 500


class FastFlatIndex:
    """Near-exact brute force via the fused block-max Pallas scan
    (ops/pallas_scan.py): ~64x less HBM traffic than the streaming scan.

    Recall is ~0.997 at k=10 (two true neighbors sharing one 128-row block
    can shadow each other; rows are shuffled at build so block membership
    is independent of id order). kb (candidate blocks per query) trades
    recall for re-rank cost.
    """

    def __init__(
        self,
        vectors: np.ndarray,
        metric: str | int = "l2",
        *,
        tn: int = 1024,  # v1/interpret chunk rows (v2 fixes its own TN)
        shuffle: bool = True,
        seed: int = 0,
        interpret: bool = False,
    ):
        from shine_tpu.ops.pallas_scan import pack_ext_table

        self.metric = metric_id(metric)
        v = np.ascontiguousarray(vectors, dtype=np.float32)
        n, d = v.shape
        self.perm = None
        if shuffle:
            rng = np.random.default_rng(seed)
            self.perm = rng.permutation(n).astype(np.int32)
            v = v[self.perm]
        quantum = 4096  # lcm of v1 tiles and v2's TN
        n_pad = -(-n // quantum) * quantum
        ext = pack_ext_table(v, self.metric, n_pad)
        self.ext = jnp.asarray(ext, dtype=jnp.bfloat16)
        self.vectors = jnp.asarray(v)
        sq = (v * v).sum(-1) if self.metric == METRIC_L2 else np.zeros(n, np.float32)
        self.sqnorms = jnp.asarray(sq.astype(np.float32))
        self.n, self.dim, self.tn = n, d, tn
        self.dp = ext.shape[1]
        self.interpret = interpret
        self.row_source = None

    @classmethod
    def from_ext(
        cls,
        ext_dev,
        n: int,
        metric: str | int = "l2",
        *,
        dim: int | None = None,
        row_source=None,
    ) -> "FastFlatIndex":
        """Capacity mode: build from a packed bf16 score table alone —
        no f32 base in HBM, re-rank via rerank_topk_ext. Halves the
        per-row footprint (the exact-rerank layout keeps base + ext,
        ceiling ~10-12M rows at d=128 on 16 GB; ext-only reaches ~2x).
        Pair with io/device_synth.device_synthetic_ext_dataset for
        beyond-base-scale ingestion.

        dim is the TRUE feature dimension (the ext table is lane-padded,
        so it can't be recovered from the shape); it drives the kb
        auto-sizing threshold in search(). Defaults to the padded width
        minus the norm columns — pass the real value when you have it.

        row_source=(key, centers) (io/device_synth.py row-keyed datasets)
        switches the re-rank from bf16 ext rows to EXACT f32 rows
        regenerated in-jit from the ids (ops/distance.py:
        regen_rerank_topk) — exact-re-rank recall at ext-only HBM cost."""
        self = cls.__new__(cls)
        self.metric = metric_id(metric)
        n_pad, dp = ext_dev.shape
        assert n_pad % 4096 == 0 and n <= n_pad
        self.ext = ext_dev.astype(jnp.bfloat16)
        self.vectors = None
        self.sqnorms = None
        self.perm = None
        self.row_source = row_source
        if dim is None:
            dim = dp - 2 if self.metric == METRIC_L2 else dp
        self.n, self.dim, self.tn = n, dim, 1024
        self.dp = dp
        self.interpret = jax.default_backend() == "cpu"
        return self

    @classmethod
    def from_device(
        cls,
        v_dev,
        metric: str | int = "l2",
        *,
        shuffle: bool | None = None,
        seed: int = 0,
    ) -> "FastFlatIndex":
        """Build from a device-resident base; the packed score table is
        assembled on-chip in bf16 chunks (peak extra HBM = the final ext
        table + one chunk — a host round trip of a 10M x 128 base would
        take minutes on the ~20 MB/s dev tunnel). Requires n % 4096 == 0
        (generate padded bases; host constructor handles ragged n).

        shuffle=None auto-enables the on-device row permutation when the
        gather transient (one extra f32 base copy) fits SHUFFLE_MAX_BYTES:
        'device bases are iid-ordered' turned out to be wrong — keeping
        generator order correlates same-class decoys and costs ~0.008
        recall vs the (shuffling) host constructor at 1M x 128 (r4f chip
        ablation: from_device auto 0.9914 vs host auto 0.9999,
        results/diag_1m_recall.jsonl)."""
        import jax

        self = cls.__new__(cls)
        self.metric = metric_id(metric)
        n, d = v_dev.shape
        quantum = 4096
        if n % quantum:
            raise ValueError("from_device requires n % 4096 == 0")
        v = v_dev.astype(jnp.float32)
        if shuffle is None:
            shuffle = n * d * 4 <= SHUFFLE_MAX_BYTES
        self.perm = None
        if shuffle:
            perm = jax.random.permutation(jax.random.PRNGKey(seed), n)
            v = v[perm]
            self.perm = np.asarray(perm).astype(np.int32)
        dp = -(-(d + 2) // 128) * 128
        self.ext = _pack_ext_device(v, metric=self.metric, dp=dp)
        self.vectors = v
        sq = (
            _row_sq(v)
            if self.metric == METRIC_L2
            else jnp.zeros(n, jnp.float32)
        )
        self.sqnorms = sq.astype(jnp.float32)
        self.n, self.dim, self.tn = n, d, 1024
        self.dp = dp
        # CPU backend can only run the kernel in interpret mode (same
        # auto-rule as ShardedFastFlatIndex) — the CPU suite exercises
        # from_device paths directly
        self.interpret = jax.default_backend() == "cpu"
        self.row_source = None
        return self

    def preload(self, queries: np.ndarray, *, batch_size: int = 4096):
        """Stage queries in HBM once (the reference stages queries in CN
        RAM before its timed runs, compute_node.cc:277-319; the dev-tunnel
        here moves ~20 MB/s so this matters doubly)."""
        nq, d = queries.shape
        nq_pad = -(-nq // batch_size) * batch_size
        q_all = np.zeros((nq_pad, d), np.float32)
        q_all[:nq] = queries.astype(np.float32)
        q_dev = jnp.asarray(q_all)
        q_dev.block_until_ready()
        return q_dev, nq

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        kb: int = 0,
        batch_size: int = 4096,
        tq: int = 512,
        cls: int = 0,
        preloaded=None,
        with_dists: bool = True,
        keep2: bool | None = None,
        approx_sel: bool = False,
        prerank: int = 0,
        fused_sel: bool | None = None,
        megabatch: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """kb=0 auto-sizes the re-rank margin: bf16 score near-ties widen
        with dimension, so high-dim needs a bigger margin (measured:
        kb=32 holds 0.992 at d=128; d=960 needs kb=128 for 0.988).
        cls=0 auto-sizes the class count: 2048 classes halve the
        collision loss (~C(k,2)/cls) at identical QPS (measured at 200k:
        0.9953 -> 0.9977, TPU_NOTES r3 'tune grid'), EXCEPT at ~1M+ rows
        where keep2@cls=1024 is the measured-best regime.
        keep2=None auto-enables the per-class runner-up kernel once
        rows-per-class exceeds ~500 — the regime where single-slot bf16
        near-tie losses appear (measured: at 1M x 64 keep2 lifts recall
        0.995 -> 0.9999 for ~14% QPS; at 200k, rows/cls ~195, it only
        costs QPS — TPU_NOTES '1M x 64 keep2 refresh').
        with_dists=False skips the distance download (the dev tunnel
        moves ~20 MB/s; recall-only callers save a transfer).
        prerank>0 trims kb -> prerank candidates before the exact f32
        re-rank using the scan's own scores (ops/distance.py:score_trim
        — free); the gather + re-rank tail is ~2.4x the scan in the
        small-N dispatch (TPU_NOTES 'Dispatch stage profile'); measure
        with scripts/tune_dispatch_trims.py before changing the default.
        megabatch=True folds the whole batch loop into ONE dispatched
        program (fast_flat_search_mega, lax.map over batches) — for
        sustained streams where the per-dispatch launch cost binds."""
        kb, cls, keep2, fused_sel = self._resolve_knobs(
            kb, cls, keep2, fused_sel, approx_sel
        )
        out_i, out_d = _fast_flat_search_host(
            self, queries, k, kb, batch_size, tq, cls, preloaded=preloaded,
            with_dists=with_dists, keep2=keep2, approx_sel=approx_sel,
            prerank=prerank, fused_sel=fused_sel, megabatch=megabatch,
        )
        if self.perm is not None:
            out_i = np.where(out_i >= 0, self.perm[np.maximum(out_i, 0)], -1)
        return out_i, out_d

    def _resolve_knobs(self, kb, cls, keep2, fused_sel, approx_sel):
        if kb <= 0:
            kb = kb_auto(int(self.ext.shape[0]), self.dim)
        if cls <= 0:
            cls = 1024 if keep2_auto(int(self.ext.shape[0]), 2048) else 2048
        if keep2 is None:
            keep2 = keep2_auto(int(self.ext.shape[0]), cls)
        if fused_sel is None:
            # measured rule (r3f chip ablation, results/
            # tune_dispatch_trims.jsonl): the in-kernel select wins for
            # keep2 (159k vs 116k, identical ids) and kb<=16 (190.6k vs
            # 159.3k); the kb=32 keep1 epilogue loses (142k vs 158.6k).
            # kb is capped at 32 for the keep2 fusion: the per-kb
            # epilogue unrolls, and at kb=81/dp=256 the Mosaic register
            # allocator spills 122 MB of VMEM (chip_plan_r4a stage C
            # compile OOM) — big-kb sweeps take the unfused select.
            fused_sel = (
                (keep2 and kb <= 32) or kb <= 16
            ) and not approx_sel
        return kb, cls, keep2, fused_sel

    def search_device(
        self,
        preloaded,
        k: int = 10,
        *,
        kb: int = 0,
        batch_size: int = 4096,
        tq: int = 512,
        cls: int = 0,
        keep2: bool | None = None,
        approx_sel: bool = False,
        prerank: int = 0,
        fused_sel: bool | None = None,
        megabatch: bool = True,
    ):
        """Device-resident twin of search(): same programs, same knob
        auto-rules, but returns (ids, dists) as DEVICE arrays with the
        shuffle permutation applied on-device — no host download. This
        is the production serving shape (a colocated host, or results
        feeding further on-device work); over this environment's dev
        tunnel (~20-40 MB/s) the download otherwise dominates the timed
        wall (docs/TPU_NOTES.md r4 'Mega profile'). Callers sync with
        np.asarray(jnp.sum(ids)) and download outside the timed region.
        Reference analogue: the CN keeps results in its own RAM and only
        aggregates recall (compute_node.cc:277-319)."""
        q_dev, nq = preloaded
        kb, cls, keep2, fused_sel = self._resolve_knobs(
            kb, cls, keep2, fused_sel, approx_sel
        )
        all_d, all_i = _fast_flat_search_dispatch(
            self, q_dev, k, kb, batch_size, tq, cls, keep2=keep2,
            approx_sel=approx_sel, prerank=prerank, fused_sel=fused_sel,
            megabatch=megabatch,
        )
        if self.perm is not None:
            if getattr(self, "_perm_dev", None) is None:
                self._perm_dev = jnp.asarray(self.perm)
            all_i = jnp.where(
                all_i >= 0, jnp.take(self._perm_dev, jnp.maximum(all_i, 0)),
                -1,
            )
        return all_i[:nq], all_d[:nq]

    def cost_counters(self, nq: int, k: int = 10, *, kb: int = 0,
                      batch_size: int = 4096) -> dict:
        """Analytic cost: each batch streams the packed bf16 ext table once
        through the fused scan; kb survivors per query are re-ranked in f32."""
        if kb <= 0:
            kb = kb_auto(int(self.ext.shape[0]), self.dim)
        n_pad = int(self.ext.shape[0])
        batches = -(-nq // max(batch_size, 1))
        return {
            "distance_computations": nq * n_pad + nq * kb,
            "scanned_rows": nq * n_pad,
            "hbm_gather_bytes": batches * int(self.ext.nbytes)
            + nq * kb * self.dim * 4,
            "ici_exchange_bytes": 0,
        }


class SplitFlatIndex:
    """Near-exact brute force on the SPLIT layout (ops/pallas_scan_split):
    lane-exact component table (bf16 or int8) + one f32 (nrm, scl) pair
    per row, fused class-max scan + re-rank.

    vs FastFlatIndex's packed ext rows at d % 128 == 0 this halves both
    the HBM bytes AND the MXU work per row (dp 256 -> 128 at d=128 — the
    norm columns forced a whole extra 128-lane tile), and the f32 norm
    carries more precision than the residual-encoded bf16 column pair.
    comp_dtype="int8" halves bytes again (136 B/row at d=128) for
    ~3.8x FastFlatIndex capacity; pair with row_source regen re-rank
    (exact f32) to keep the recall envelope.

    Reference role: the serving-scale flat scan (the promoted
    ground-truth oracle, compute_node.cc:578-600) at the reference's
    100M-rows-per-cluster class on single chips.
    """

    def __init__(
        self,
        vectors: np.ndarray,
        metric: str | int = "l2",
        *,
        comp_dtype: str = "bf16",
        shuffle: bool = True,
        seed: int = 0,
        interpret: bool = False,
    ):
        from shine_tpu.ops.pallas_scan_split import pack_split_tables

        self.metric = metric_id(metric)
        v = np.ascontiguousarray(vectors, dtype=np.float32)
        n, d = v.shape
        self.perm = None
        if shuffle:
            rng = np.random.default_rng(seed)
            self.perm = rng.permutation(n).astype(np.int32)
            v = v[self.perm]
        from shine_tpu.ops.pallas_scan_split import SPLIT_QUANTUM

        n_pad = -(-n // SPLIT_QUANTUM) * SPLIT_QUANTUM
        comp, aux = pack_split_tables(
            v, self.metric, n_pad,
            comp_dtype=np.int8 if comp_dtype == "int8" else np.float16,
        )
        self.comp = jnp.asarray(comp) if comp_dtype == "int8" else (
            jnp.asarray(comp).astype(jnp.bfloat16)
        )
        self.aux = jnp.asarray(aux)
        self.vectors = jnp.asarray(v)
        sq = (v * v).sum(-1) if self.metric == METRIC_L2 else np.zeros(
            n, np.float32
        )
        self.sqnorms = jnp.asarray(sq.astype(np.float32))
        self.n, self.dim = n, d
        self.comp_dtype = comp_dtype
        self.interpret = interpret
        self.row_source = None

    @classmethod
    def from_device(
        cls,
        v_dev,
        metric: str | int = "l2",
        *,
        comp_dtype: str = "bf16",
        keep_base: bool = True,
    ) -> "SplitFlatIndex":
        """Build from a device-resident base (n % 4096 == 0). With
        keep_base=False the f32 base is dropped after packing (capacity
        mode; re-rank falls back to the split tables unless a row_source
        is attached afterwards)."""
        from shine_tpu.ops.pallas_scan_split import (
            NEG,
            SPLIT_QUANTUM,
            comp_width,
            pack_split_device,
        )

        self = cls.__new__(cls)
        self.metric = metric_id(metric)
        n, d = v_dev.shape
        if n % 4096:
            raise ValueError("from_device requires n % 4096 == 0")
        v = v_dev.astype(jnp.float32)
        self.perm = None
        self.comp, self.aux = pack_split_device(
            v, metric=self.metric, dpc=comp_width(d),
            int8=(comp_dtype == "int8"),
        )
        if n % SPLIT_QUANTUM:
            pad = SPLIT_QUANTUM - n % SPLIT_QUANTUM
            self.comp = jnp.concatenate(
                [self.comp, jnp.zeros((pad, self.comp.shape[1]),
                                      self.comp.dtype)]
            )
            aux_pad = jnp.concatenate([
                jnp.full((1, pad), NEG, jnp.float32),
                jnp.ones((1, pad), jnp.float32),
            ])
            self.aux = jnp.concatenate([self.aux, aux_pad], axis=1)
        if keep_base:
            self.vectors = v
            sq = (
                _row_sq(v)
                if self.metric == METRIC_L2
                else jnp.zeros(n, jnp.float32)
            )
            self.sqnorms = sq.astype(jnp.float32)
        else:
            self.vectors = None
            self.sqnorms = None
        self.n, self.dim = n, d
        self.comp_dtype = comp_dtype
        self.interpret = jax.default_backend() == "cpu"
        self.row_source = None
        return self

    @classmethod
    def from_parts(
        cls,
        comp_dev,
        aux_dev,
        n: int,
        metric: str | int = "l2",
        *,
        dim: int | None = None,
        row_source=None,
    ) -> "SplitFlatIndex":
        """Capacity mode: adopt pre-packed split tables (e.g. from
        io/device_synth streaming ingestion). row_source=(key, centers)
        switches re-ranking to EXACT f32 regen (regen_rerank_topk)."""
        self = cls.__new__(cls)
        self.metric = metric_id(metric)
        n_pad, dpc = comp_dev.shape
        assert n_pad % 4096 == 0 and n <= n_pad
        assert aux_dev.shape == (2, n_pad)
        self.comp = comp_dev
        self.aux = aux_dev
        self.vectors = None
        self.sqnorms = None
        self.perm = None
        self.row_source = row_source
        self.n = n
        self.dim = dim if dim is not None else dpc
        self.comp_dtype = "int8" if comp_dev.dtype == jnp.int8 else "bf16"
        self.interpret = jax.default_backend() == "cpu"
        return self

    preload = FastFlatIndex.preload

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        kb: int = 0,
        batch_size: int = 4096,
        tq: int = 512,
        cls: int = 0,
        preloaded=None,
        with_dists: bool = True,
        keep2: bool | None = None,
        approx_sel: bool = False,
        prerank: int = 0,
        fused_sel: bool | None = None,
        megabatch: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Same defaults/auto-rules as FastFlatIndex.search (measured:
        TPU_NOTES r3 'tune grid' + keep2_auto); int8 components widen
        bf16-class score noise to ~s/127 per row, so int8 keeps the same
        kb margin but leans on keep2 + exact regen re-rank for recall."""
        if kb <= 0:
            kb = 32 if self.dim < 512 else 128
        exact_rerank = self.row_source is not None or self.vectors is not None
        if cls <= 0:
            # Measured rule (TPU_NOTES r3 'split kernel operating points',
            # 16.7M x 128 int8): with an EXACT re-rank downstream the
            # scan's only loss is same-class decoys, and keep2-off at
            # cls=4096 holds recall 0.9994 at 1.65x the keep2 QPS
            # (10.7k vs 6.5k); without exact re-rank keep2 remains the
            # precision backstop (keep2_auto).
            if exact_rerank and keep2 is None and keep2_auto(
                int(self.comp.shape[0]), 2048
            ):
                cls, keep2 = 4096, False
            else:
                cls = 1024 if keep2_auto(
                    int(self.comp.shape[0]), 2048
                ) else 2048
        if keep2 is None:
            keep2 = keep2_auto(int(self.comp.shape[0]), cls)
        if fused_sel is None:
            # the FastFlatIndex.search measured rule (r3f ablation);
            # keep2 fusion capped at kb<=32 (register-spill OOM above)
            fused_sel = (
                (keep2 and kb <= 32) or kb <= 16
            ) and not approx_sel
        nq, d = queries.shape
        if self.interpret:
            tq = min(tq, 128)
        elif cls >= 4096:
            # the (tq, tn=8*cls) f32 dots intermediate at tq=512 blows
            # the 100 MB VMEM cap (measured OOM at cls=4096); halving
            # the query tile keeps the select-bound wall unchanged
            # (select ops/row scale with TOTAL B, not tq)
            tq = min(tq, 256)
        batch_size = max(tq, -(-min(batch_size, max(nq, 1)) // tq) * tq)
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        if preloaded is not None:
            q_dev, nq_real = preloaded
            assert nq_real == nq and q_dev.shape[0] % batch_size == 0
            nq_pad = q_dev.shape[0]
        else:
            nq_pad = -(-nq // batch_size) * batch_size
            q_all = np.zeros((nq_pad, d), np.float32)
            q_all[:nq] = queries.astype(np.float32)
            q_dev = jnp.asarray(q_all)
        n_pad = int(self.comp.shape[0])
        if self.interpret:
            tn = max(1024, cls)
        else:
            # aux chunk slices need tn/cls % 8 == 0 (Mosaic sublane
            # tiling); double up when that halves the chunk count
            tn = 8 * cls
            if tn < 16384 and n_pad % (2 * tn) == 0:
                tn *= 2
            if n_pad % tn:
                raise ValueError(
                    f"n_pad={n_pad} not divisible by tn={tn}; pad split "
                    f"tables to SPLIT_QUANTUM or lower cls"
                )
        if megabatch and nq_pad > batch_size:
            # one lax.map program over the batch loop (see
            # fast_flat_search_mega — kills the per-dispatch launch cost)
            all_d, all_i = split_flat_search_mega(
                self.comp, self.aux, self.vectors, self.sqnorms, q_dev,
                k=k, kb=kb, tq=tq, tn=tn, cls=cls, metric=self.metric,
                batch=batch_size, interpret=self.interpret, keep2=keep2,
                n=self.n, row_source=self.row_source,
                approx_sel=approx_sel, prerank=prerank,
                fused_sel=fused_sel,
            )
        else:
            parts = []
            for lo in range(0, nq_pad, batch_size):
                parts.append(
                    split_flat_search_at(
                        self.comp, self.aux, self.vectors, self.sqnorms,
                        q_dev, lo, k=k, kb=kb, tq=tq, tn=tn, cls=cls,
                        metric=self.metric, batch=batch_size,
                        interpret=self.interpret, keep2=keep2, n=self.n,
                        row_source=self.row_source, approx_sel=approx_sel,
                        prerank=prerank, fused_sel=fused_sel,
                    )
                )
            if len(parts) == 1:
                all_d, all_i = parts[0]
            else:
                all_d = jnp.concatenate([p[0] for p in parts], axis=0)
                all_i = jnp.concatenate([p[1] for p in parts], axis=0)
        out_i[:] = np.asarray(all_i)[:nq]
        if with_dists:
            out_d[:] = np.asarray(all_d)[:nq]
        else:
            out_d.fill(0)
        if self.perm is not None:
            out_i = np.where(out_i >= 0, self.perm[np.maximum(out_i, 0)], -1)
        return out_i, out_d

    def cost_counters(self, nq: int, k: int = 10, *, kb: int = 0,
                      batch_size: int = 4096) -> dict:
        if kb <= 0:
            kb = 32 if self.dim < 512 else 128
        n_pad = int(self.comp.shape[0])
        batches = -(-nq // max(batch_size, 1))
        table = int(self.comp.nbytes) + int(self.aux.nbytes)
        return {
            "distance_computations": nq * n_pad + nq * kb,
            "scanned_rows": nq * n_pad,
            "hbm_gather_bytes": batches * table + nq * kb * self.dim * 4,
            "ici_exchange_bytes": 0,
        }


def _select_kb(m1, kb_eff, approx):
    """Class-winner selection: exact top_k, or the TPU-optimized
    approx_max_k (PartialReduce) — the select over (B, cls) is part of
    the fixed per-dispatch cost T0 (docs/TPU_NOTES.md 'Scan perf
    model'), so a faster reduction converts directly to small-N QPS.
    recall_target=0.99 bounds the chance of dropping a true class."""
    if approx:
        return jax.lax.approx_max_k(m1, kb_eff, recall_target=0.99)
    return jax.lax.top_k(m1, kb_eff)


@partial(
    jax.jit,
    static_argnames=(
        "k", "kb", "tq", "tn", "cls", "metric", "batch", "interpret",
        "keep2", "n", "approx_sel", "prerank", "fused_sel",
    ),
)
def split_flat_search_at(
    comp, aux, vectors, sqnorms, q_dev, lo, *, k, kb, tq, tn, cls, metric,
    batch, interpret=False, keep2=False, n=0, row_source=None,
    approx_sel=False, prerank=0, fused_sel=False,
):
    """One fused program on the split layout: slice queries, pad to the
    component lanes, class-max scan, select, re-rank.

    q_dev=None means self-sweep (the queries ARE the base rows, layer-0
    kNN of the graph build): the slice comes from `vectors` so the 8.6 GB
    base isn't passed twice — the axon AOT compile accounts each program
    parameter separately and the duplicate blew the 16.78M sweep past
    HBM (chip_plan_r4b stage B: arguments 20.19G of 15.75G)."""
    qj = jax.lax.dynamic_slice_in_dim(
        vectors if q_dev is None else q_dev, lo, batch, 0
    )
    return _split_flat_batch(
        comp, aux, vectors, sqnorms, qj, k=k, kb=kb, tq=tq, tn=tn, cls=cls,
        metric=metric, interpret=interpret, keep2=keep2, n=n,
        row_source=row_source, approx_sel=approx_sel, prerank=prerank,
        fused_sel=fused_sel,
    )


@partial(
    jax.jit,
    static_argnames=(
        "k", "kb", "tq", "tn", "cls", "metric", "batch", "interpret",
        "keep2", "n", "approx_sel", "prerank", "fused_sel",
    ),
)
def split_flat_search_mega(
    comp, aux, vectors, sqnorms, q_dev, *, k, kb, tq, tn, cls, metric,
    batch, interpret=False, keep2=False, n=0, row_source=None,
    approx_sel=False, prerank=0, fused_sel=False,
):
    """The split twin of fast_flat_search_mega: the whole query stream as
    ONE lax.map program — no per-batch launch cost (bit-identical to the
    per-batch loop, tests)."""
    assert q_dev.shape[0] % batch == 0, (
        f"mega path needs rows % batch == 0 (got {q_dev.shape[0]} % {batch});"
        " pad the query stream like FastFlatIndex.search does"
    )
    L = q_dev.shape[0] // batch
    qs = q_dev[: L * batch].reshape(L, batch, q_dev.shape[1])

    def body(qj):
        return _split_flat_batch(
            comp, aux, vectors, sqnorms, qj, k=k, kb=kb, tq=tq, tn=tn,
            cls=cls, metric=metric, interpret=interpret, keep2=keep2, n=n,
            row_source=row_source, approx_sel=approx_sel, prerank=prerank,
            fused_sel=fused_sel,
        )

    d, i = jax.lax.map(body, qs)
    return d.reshape(L * batch, -1), i.reshape(L * batch, -1)


def _split_flat_batch(
    comp, aux, vectors, sqnorms, qj, *, k, kb, tq, tn, cls, metric,
    interpret=False, keep2=False, n=0, row_source=None,
    approx_sel=False, prerank=0, fused_sel=False,
):
    from shine_tpu.ops.pallas_scan_split import (
        classmax_scan_split,
        pack_split_query,
    )

    q_pad = pack_split_query(qj, comp.shape[1])
    kb_eff = min(kb, cls)
    if fused_sel and not approx_sel and not interpret:
        # v5 fused in-kernel top-kb (ops/pallas_scan3.py:_topk_epilogue;
        # bit-identical to the unfused select, tests/test_split.py).
        # tq halved: sweep state + DMA buffers + epilogue temps hit the
        # scoped-VMEM cap at tq=512 x cls=2048 (r3f measured 110.9 MB >
        # 100 MB); the select wall scales with total B, not tq.
        from shine_tpu.ops.pallas_scan_split import classmax_topk_scan_split

        out = classmax_topk_scan_split(
            comp, aux, q_pad, kb=kb_eff, tq=min(tq, 256), tn=tn, cls=cls,
            keep2=keep2,
        )
        if keep2:
            v1, cand1, v2, c2 = out
            cand = jnp.concatenate(
                [cand1, jnp.where(v2 > -3e38, c2, -1)], axis=1
            )
            vals = jnp.concatenate([v1, v2], axis=1)
        else:
            vals, cand = out
    else:
        out = classmax_scan_split(
            comp, aux, q_pad, tq=tq, tn=tn, cls=cls, keep2=keep2,
            interpret=interpret,
        )
        if keep2:
            m1, a1, m2, a2 = out
            v1, sel = _select_kb(m1, kb_eff, approx_sel)
            cand1 = jnp.take_along_axis(a1, sel, axis=1)
            c2 = jnp.take_along_axis(a2, sel, axis=1)
            v2 = jnp.take_along_axis(m2, sel, axis=1)
            cand = jnp.concatenate(
                [cand1, jnp.where(v2 > -3e38, c2, -1)], axis=1
            )
            vals = jnp.concatenate([v1, v2], axis=1)
        else:
            m1, a1 = out
            vals, sel = _select_kb(m1, kb_eff, approx_sel)
            cand = jnp.take_along_axis(a1, sel, axis=1)
    limit = n or comp.shape[0]
    cand = jnp.where(cand < limit, cand, -1)
    if (
        prerank
        and max(prerank, k) < cand.shape[-1]
        and (vectors is not None or row_source is not None)
    ):
        # FREE stage-1 trim from the scan's own candidate scores (see
        # fast_flat_search); at capacity scale the regen re-rank cost is
        # O(candidates) threefry, so the trim converts directly
        from shine_tpu.ops.distance import score_trim

        cand = score_trim(vals, cand, max(prerank, k))
    if vectors is not None:
        from shine_tpu.ops.distance import rerank_topk

        return rerank_topk(vectors, sqnorms, qj, cand, k, metric)
    if row_source is not None:
        from shine_tpu.ops.distance import regen_rerank_topk

        rkey, centers = row_source
        return regen_rerank_topk(rkey, centers, qj, cand, k, metric)
    from shine_tpu.ops.distance import rerank_topk_split

    return rerank_topk_split(comp, aux, qj, cand, k, metric)


@partial(
    jax.jit,
    static_argnames=(
        "k", "kb", "tq", "tn", "cls", "metric", "batch", "interpret",
        "keep2", "n", "approx_sel", "prerank", "fused_sel",
    ),
)
def fast_flat_search_at(
    ext, vectors, sqnorms, q_dev, lo, *, k, kb, tq, tn, cls, metric, batch,
    interpret=False, keep2=False, n=0, row_source=None, approx_sel=False,
    prerank=0, fused_sel=False,
):
    """One fused program: slice the preloaded queries, pack the extended
    query, scan, select, re-rank — a single dispatch per batch.

    q_dev=None: self-sweep — slice from `vectors` (see
    split_flat_search_at; avoids passing the base as two parameters)."""
    from shine_tpu.ops.pallas_scan import pack_ext_query

    qj = jax.lax.dynamic_slice_in_dim(
        vectors if q_dev is None else q_dev, lo, batch, 0
    )
    q_ext = pack_ext_query(qj, ext.shape[1]).astype(jnp.bfloat16)
    return fast_flat_search(
        ext, vectors, sqnorms, q_ext, qj, k=k, kb=kb, tq=tq, tn=tn, cls=cls,
        metric=metric, interpret=interpret, keep2=keep2, n=n,
        row_source=row_source, approx_sel=approx_sel, prerank=prerank,
        fused_sel=fused_sel,
    )


@partial(
    jax.jit,
    static_argnames=(
        "k", "kb", "tq", "tn", "cls", "metric", "interpret", "keep2", "n",
        "approx_sel", "prerank", "fused_sel",
    ),
)
def fast_flat_search(
    ext, vectors, sqnorms, q_ext, q, *, k, kb, tq, tn, cls, metric,
    interpret=False, keep2=False, n=0, row_source=None, approx_sel=False,
    prerank=0, fused_sel=False,
):
    from shine_tpu.ops.distance import rerank_topk

    if interpret:
        from shine_tpu.ops.pallas_scan import blockmax_scan

        m1, a1, m2, a2 = blockmax_scan(ext, q_ext, tq=tq, tn=tn, interpret=True)
        nb = m1.shape[1]
        kb_eff = min(kb, nb)
        v1, sel = jax.lax.top_k(m1, kb_eff)
        cand1 = jnp.take_along_axis(a1, sel, axis=1)  # block best rows
        m2_sel = jnp.take_along_axis(m2, sel, axis=1)
        cand2 = jnp.take_along_axis(a2, sel, axis=1)  # runner-ups
        # same sentinel mask as every kernel keep2 path: a -inf runner-up
        # score must not carry a valid-looking row id downstream
        cand2 = jnp.where(m2_sel > -3e38, cand2, -1)
        cand = jnp.concatenate([cand1, cand2], axis=1)
        vals = jnp.concatenate([v1, m2_sel], axis=1)
    elif keep2:
        kb_eff = min(kb, cls)
        if fused_sel and not approx_sel:
            # v5: the select runs inside the kernel epilogue — the XLA
            # TopK program and the (B, cls) HBM round-trip disappear
            # from the dispatch tail (bit-identical outputs, tested)
            from shine_tpu.ops.pallas_scan3 import classmax2_topk_scan

            v1, cand1, v2, c2 = classmax2_topk_scan(
                ext, q_ext, kb=kb_eff, tq=tq, tn=tn, cls=cls
            )
        else:
            from shine_tpu.ops.pallas_scan3 import classmax2_scan

            m1, a1, m2, a2 = classmax2_scan(
                ext, q_ext, tq=tq, tn=tn, cls=cls
            )
            v1, sel = _select_kb(m1, kb_eff, approx_sel)
            cand1 = jnp.take_along_axis(a1, sel, axis=1)
            c2 = jnp.take_along_axis(a2, sel, axis=1)
            v2 = jnp.take_along_axis(m2, sel, axis=1)
        # runner-up of each selected class (recovers the one-decoy bf16
        # near-tie loss at large rows-per-class; ops/pallas_scan3.py v4)
        cand2 = jnp.where(v2 > -3e38, c2, -1)
        cand = jnp.concatenate([cand1, cand2], axis=1)
        vals = jnp.concatenate([v1, v2], axis=1)
    else:
        kb_eff = min(kb, cls)
        if fused_sel and not approx_sel:
            from shine_tpu.ops.pallas_scan3 import classmax_topk_scan

            vals, cand = classmax_topk_scan(
                ext, q_ext, kb=kb_eff, tq=tq, tn=tn, cls=cls
            )
        else:
            from shine_tpu.ops.pallas_scan3 import classmax_scan

            m1, a1 = classmax_scan(ext, q_ext, tq=tq, tn=tn, cls=cls)
            vals, sel = _select_kb(m1, kb_eff, approx_sel)
            cand = jnp.take_along_axis(a1, sel, axis=1)
    limit = n or vectors.shape[0]
    cand = jnp.where(cand < limit, cand, -1)
    if (
        prerank
        and max(prerank, k) < cand.shape[-1]
        and (vectors is not None or row_source is not None)
    ):
        # FREE stage-1 trim: the scan already scored every candidate
        # (kernel epilogue values / top_k values), so the kb -> prerank
        # cut before the exact re-rank is a (B, K) sort — no table
        # re-read (prerank_trim_ext re-gathered K bf16 rows to recompute
        # the same scores). Shrinks the gather + re-rank tail that binds
        # the small-N dispatch (round-4 candidate #3).
        from shine_tpu.ops.distance import score_trim

        cand = score_trim(vals, cand, max(prerank, k))
    if vectors is None:
        if row_source is not None:
            # capacity mode, EXACT: regenerate candidate rows from their
            # ids (row-keyed synthetic base) and re-rank in f32
            from shine_tpu.ops.distance import regen_rerank_topk

            rkey, centers = row_source
            return regen_rerank_topk(rkey, centers, q, cand, k, metric)
        # capacity mode: the f32 base is not HBM-resident — re-rank from
        # the packed bf16 table (ops/distance.py:rerank_topk_ext)
        from shine_tpu.ops.distance import rerank_topk_ext

        return rerank_topk_ext(ext, q, cand, k, metric)
    return rerank_topk(vectors, sqnorms, q, cand, k, metric)


@partial(
    jax.jit,
    static_argnames=(
        "k", "kb", "tq", "tn", "cls", "metric", "batch", "interpret",
        "keep2", "n", "approx_sel", "prerank", "fused_sel",
    ),
)
def fast_flat_search_mega(
    ext, vectors, sqnorms, q_dev, *, k, kb, tq, tn, cls, metric, batch,
    interpret=False, keep2=False, n=0, row_source=None, approx_sel=False,
    prerank=0, fused_sel=False,
):
    """The whole query stream in ONE dispatch: `lax.map` over (L, batch)
    query slabs. The per-batch host loop pays a fixed program-launch +
    tunnel cost per dispatch (~4.7 ms/batch measured even with async
    dispatches — docs/TPU_NOTES.md 'Dispatch stage profile'); folding the
    batch loop into the program leaves only device time. Same per-batch
    program as fast_flat_search, bit-identical outputs (tests)."""
    from shine_tpu.ops.pallas_scan import pack_ext_query

    assert q_dev.shape[0] % batch == 0, (
        f"mega path needs rows % batch == 0 (got {q_dev.shape[0]} % {batch});"
        " pad the query stream like FastFlatIndex.search does"
    )
    L = q_dev.shape[0] // batch
    qs = q_dev[: L * batch].reshape(L, batch, q_dev.shape[1])

    def body(qj):
        q_ext = pack_ext_query(qj, ext.shape[1]).astype(jnp.bfloat16)
        return fast_flat_search(
            ext, vectors, sqnorms, q_ext, qj, k=k, kb=kb, tq=tq, tn=tn,
            cls=cls, metric=metric, interpret=interpret, keep2=keep2, n=n,
            row_source=row_source, approx_sel=approx_sel, prerank=prerank,
            fused_sel=fused_sel,
        )

    d, i = jax.lax.map(body, qs)
    return d.reshape(L * batch, -1), i.reshape(L * batch, -1)


def _fast_flat_search_host(idx, queries, k, kb, batch_size, tq, cls=1024,
                           preloaded=None, with_dists=True, keep2=False,
                           approx_sel=False, prerank=0, fused_sel=False,
                           megabatch=False):
    nq, d = queries.shape
    if idx.interpret:
        tq = min(tq, 128)
    batch_size = max(tq, -(-min(batch_size, max(nq, 1)) // tq) * tq)
    out_i = np.empty((nq, k), np.int32)
    out_d = np.empty((nq, k), np.float32)
    # one host->device upload for the whole query set (the tunnel in this
    # environment moves ~20 MB/s — per-batch uploads would dominate);
    # batches are sliced on-device
    if preloaded is not None:
        q_dev, nq_real = preloaded
        assert nq_real == nq and q_dev.shape[0] % batch_size == 0
    else:
        nq_pad = -(-nq // batch_size) * batch_size
        q_all = np.zeros((nq_pad, d), np.float32)
        q_all[:nq] = queries.astype(np.float32)
        q_dev = jnp.asarray(q_all)
    all_d, all_i = _fast_flat_search_dispatch(
        idx, q_dev, k, kb, batch_size, tq, cls, keep2=keep2,
        approx_sel=approx_sel, prerank=prerank, fused_sel=fused_sel,
        megabatch=megabatch,
    )
    out_i[:] = np.asarray(all_i)[:nq]
    if with_dists:
        out_d[:] = np.asarray(all_d)[:nq]
    else:
        out_d.fill(0)
    return out_i, out_d


def _fast_flat_search_dispatch(idx, q_dev, k, kb, batch_size, tq, cls,
                               keep2=False, approx_sel=False, prerank=0,
                               fused_sel=False, megabatch=False):
    """Dispatch the scan programs over a staged (nq_pad, d) device query
    array; returns DEVICE (dists, ids) — download is the caller's call."""
    if idx.interpret:
        tq = min(tq, 128)
    nq_pad = q_dev.shape[0]
    assert nq_pad % batch_size == 0
    # the scan kernel needs tn % cls == 0; raise the DMA chunk when the
    # class count grows (cls scales with N to bound collision loss)
    tn = max(idx.tn, cls)
    if megabatch and nq_pad > batch_size:
        # one program for the whole stream (lax.map over batches): kills
        # the per-dispatch launch cost that binds the sustained cadence
        all_d, all_i = fast_flat_search_mega(
            idx.ext, idx.vectors, idx.sqnorms, q_dev,
            k=k, kb=kb, tq=tq, tn=tn, cls=cls, metric=idx.metric,
            batch=batch_size, interpret=idx.interpret, keep2=keep2,
            n=idx.n, row_source=idx.row_source, approx_sel=approx_sel,
            prerank=prerank, fused_sel=fused_sel,
        )
    else:
        parts = []
        for lo in range(0, nq_pad, batch_size):
            parts.append(
                fast_flat_search_at(
                    idx.ext, idx.vectors, idx.sqnorms, q_dev, lo,
                    k=k, kb=kb, tq=tq, tn=tn, cls=cls, metric=idx.metric,
                    batch=batch_size, interpret=idx.interpret, keep2=keep2,
                    n=idx.n, row_source=idx.row_source,
                    approx_sel=approx_sel, prerank=prerank,
                    fused_sel=fused_sel,
                )
            )
        # batches dispatch asynchronously; one host transfer at the end
        # (the tunnel round-trip costs ~50-100 ms, so per-batch syncs
        # dominate)
        if len(parts) == 1:
            all_d, all_i = parts[0]
        else:
            all_d = jnp.concatenate([p[0] for p in parts], axis=0)
            all_i = jnp.concatenate([p[1] for p in parts], axis=0)
    return all_d, all_i
