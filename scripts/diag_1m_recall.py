#!/usr/bin/env python
"""Diagnose the 1M x 128 fastflat recall gap (chip 0.9296 vs model 0.9996).

scripts/study_kb_1m.py established (CPU, same generator/seed):
  - the GT pipeline is exact (numpy crosscheck overlap 1.0),
  - a faithful bf16 selection sim says keep2/kb=32/cls=1024 -> 0.9996.
The chip's measured 0.9296 (results/scale_1m_hnsw.jsonl) therefore
points at a chip-side defect. This script localizes it:

CPU leg (SHINE_DIAG_CPU=1): run the REAL classmax2 kernels in interpret
mode at the exact production shapes (tq=512, tn=1024, cls=1024, kb=32,
dp=256, num_chunks=1024) + the real merge/re-rank helpers — validates
the kernel LOGIC end to end; a clean result pins the defect on Mosaic
lowering or on-chip GT.

Chip leg (default): on-chip GT crosscheck (numpy exact GT on a query
subset vs the device GT) + a config ablation of the public search()
(fused on/off, keep2 on/off, cls 1024/2048, kb 32/64, tq 512/256, host
vs from_device constructor), each scored against device GT and numpy GT.

Results: results/diag_1m_recall.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CPU = os.environ.get("SHINE_DIAG_CPU") == "1"
N = int(os.environ.get("SHINE_DIAG_N", 1_048_576))
D = 128
NQ = int(os.environ.get("SHINE_DIAG_Q", 2048))
NEVAL = int(os.environ.get("SHINE_DIAG_EVAL", 512))  # numpy-GT subset
OUT = os.path.join(ROOT, "results", "diag_1m_recall.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, "leg": "cpu" if CPU else "chip", **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    import jax

    if CPU:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from shine_tpu.io.device_synth import device_synthetic_dataset
    from shine_tpu.io.recall import recall_at_k

    t0 = time.time()
    ds = device_synthetic_dataset(n=N, dim=D, num_queries=NQ, seed=23,
                                  gt_k=11)
    gt_dev = np.asarray(ds.ground_truth)
    queries = np.asarray(ds.queries, np.float32)
    emit({"stage": "gen+gt", "seconds": round(time.time() - t0, 1)})

    t0 = time.time()
    base = np.asarray(ds.base_dev)  # ~0.54 GB download on chip
    emit({"stage": "base-download", "seconds": round(time.time() - t0, 1)})

    # numpy exact GT on a subset — platform-independent oracle
    t0 = time.time()
    ne = min(NEVAL, NQ)
    qe = queries[:ne]
    bn = (base.astype(np.float32) ** 2).sum(axis=1)
    gt_np = np.empty((ne, 10), np.int64)
    best_d = np.full((ne, 32), np.inf, np.float32)
    best_i = np.full((ne, 32), -1, np.int64)
    chunk = 131072
    for lo in range(0, N, chunk):
        hi = min(lo + chunk, N)
        dd = -2.0 * (qe @ base[lo:hi].astype(np.float32).T) + bn[lo:hi]
        ids = np.arange(lo, hi, dtype=np.int64)[None, :].repeat(ne, axis=0)
        ad = np.concatenate([best_d, dd], axis=1)
        ai = np.concatenate([best_i, ids], axis=1)
        part = np.argpartition(ad, 31, axis=1)[:, :32]
        pd = np.take_along_axis(ad, part, axis=1)
        pi = np.take_along_axis(ai, part, axis=1)
        order = np.lexsort((pi, pd), axis=1)
        best_d = np.take_along_axis(pd, order, axis=1)
        best_i = np.take_along_axis(pi, order, axis=1)
    gt_np = best_i[:, :10]
    overlap = recall_at_k(gt_dev[:ne], gt_np, 10)
    emit({"stage": "gt-crosscheck", "seconds": round(time.time() - t0, 1),
          "device_gt_vs_numpy_overlap": round(overlap, 4)})

    def score(name: str, ids: np.ndarray, extra: dict | None = None) -> None:
        r_dev = recall_at_k(ids, gt_dev, 10)
        r_np = recall_at_k(ids[:ne], gt_np, 10)
        emit({"stage": "config", "config": name,
              "recall10_vs_device_gt": round(r_dev, 4),
              "recall10_vs_numpy_gt": round(r_np, 4), **(extra or {})})

    if CPU:
        # real kernels, interpret mode, exact production shapes
        from shine_tpu.ops.pallas_scan import pack_ext_query
        from shine_tpu.ops.pallas_scan3 import (
            classmax2_scan,
            classmax2_topk_scan,
        )
        from shine_tpu.models.flat import FastFlatIndex
        from shine_tpu.ops.distance import rerank_topk

        # shuffle=False: this leg scores RAW kernel ids against GT
        idx = FastFlatIndex.from_device(jnp.asarray(base), shuffle=False)
        vecs, sq = idx.vectors, idx.sqnorms
        nq_k = 512  # one tq=512 grid step
        qj = jnp.asarray(queries[:nq_k])
        q_ext = pack_ext_query(qj, idx.ext.shape[1]).astype(jnp.bfloat16)

        def keep2_rerank(v1, c1, v2, c2, tag):
            cand2 = jnp.where(v2 > -3e38, c2, -1)
            cand = jnp.concatenate([c1, cand2], axis=1)
            cand = jnp.where(cand < N, cand, -1)
            dd, ii = rerank_topk(vecs, sq, qj, cand, 10, idx.metric)
            ids = np.asarray(ii)
            r = recall_at_k(ids, gt_dev[:nq_k], 10)
            rn = recall_at_k(ids[:ne], gt_np[: min(ne, nq_k)], 10)
            emit({"stage": "kernel-interpret", "config": tag,
                  "recall10_vs_device_gt": round(r, 4),
                  "recall10_vs_numpy_gt": round(rn, 4)})

        t0 = time.time()
        v1, c1, v2, c2 = classmax2_topk_scan(
            idx.ext, q_ext, kb=32, tq=512, tn=1024, cls=1024, interpret=True
        )
        keep2_rerank(v1, c1, v2, c2, "fused keep2 kb32 cls1024 tq512")
        emit({"stage": "timing", "config": "fused-interpret",
              "seconds": round(time.time() - t0, 1)})

        t0 = time.time()
        m1, a1, m2, a2 = classmax2_scan(
            idx.ext, q_ext, tq=512, tn=1024, cls=1024, interpret=True
        )
        vv, sel = jax.lax.top_k(m1, 32)
        c1u = jnp.take_along_axis(a1, sel, axis=1)
        v2u = jnp.take_along_axis(m2, sel, axis=1)
        c2u = jnp.take_along_axis(a2, sel, axis=1)
        keep2_rerank(vv, c1u, v2u, c2u, "unfused keep2 kb32 cls1024 tq512")
        emit({"stage": "timing", "config": "unfused-interpret",
              "seconds": round(time.time() - t0, 1)})
        return

    # ---- chip leg: public search() config ablation ----
    from shine_tpu.models.flat import FastFlatIndex, FlatIndex

    # 0. pure-XLA scan paths (no Pallas): discriminate MXU bf16 numerics
    # from kernel codegen. f32 should be ~1.0 by construction; bf16 tells
    # us what the MXU's bf16 rounding really costs at 1M (the CPU sim
    # says the selection itself only costs ~4e-4).
    fidx = FlatIndex.from_device(ds.base_dev)
    for tag, bf in (("xla flat f32", False), ("xla flat bf16+rerank", True)):
        t0 = time.time()
        ii, _ = fidx.search(queries, 10, batch_size=2048, use_bf16=bf)
        score(tag, ii, {"seconds": round(time.time() - t0, 1)})

    # shuffle=False: section 0b scores raw kernel ids, and the search()
    # config ablation below deliberately measures the UNSHUFFLED ingest
    # (the historical from_device behavior); the shuffled default gets
    # its own row at the end
    idx = FastFlatIndex.from_device(ds.base_dev, shuffle=False)

    # 0b. the REAL Pallas kernel in interpret mode ON the TPU backend
    # (same shapes/logic, executed as XLA ops instead of Mosaic codegen):
    # a clean score here + a dirty compiled score pins Mosaic lowering.
    try:
        from shine_tpu.ops.pallas_scan import pack_ext_query
        from shine_tpu.ops.pallas_scan3 import classmax2_topk_scan
        from shine_tpu.ops.distance import rerank_topk

        nq_k = 512
        qj = jnp.asarray(queries[:nq_k])
        q_ext = pack_ext_query(qj, idx.ext.shape[1]).astype(jnp.bfloat16)
        t0 = time.time()
        v1, c1, v2, c2 = classmax2_topk_scan(
            idx.ext, q_ext, kb=32, tq=512, tn=1024, cls=1024,
            interpret=True,
        )
        cand2 = jnp.where(v2 > -3e38, c2, -1)
        cand = jnp.concatenate([c1, cand2], axis=1)
        cand = jnp.where(cand < N, cand, -1)
        _, ii = rerank_topk(idx.vectors, idx.sqnorms, qj, cand, 10,
                            idx.metric)
        ids = np.asarray(ii)
        emit({"stage": "config", "config": "interpret-on-tpu keep2 kb32",
              "recall10_vs_device_gt":
                  round(recall_at_k(ids, gt_dev[:nq_k], 10), 4),
              "recall10_vs_numpy_gt":
                  round(recall_at_k(ids[:ne], gt_np[:min(ne, nq_k)], 10), 4),
              "seconds": round(time.time() - t0, 1)})
    except Exception as e:  # pragma: no cover - diagnostic resilience
        emit({"stage": "config", "config": "interpret-on-tpu keep2 kb32",
              "error": repr(e)[:300]})

    pre = idx.preload(queries, batch_size=2048)

    def run(name, **kw):
        t0 = time.time()
        ids, _ = idx.search(queries, 10, batch_size=2048, preloaded=pre,
                            with_dists=False, **kw)
        score(name, ids, {"seconds": round(time.time() - t0, 1)})

    run("auto (keep2 kb32 cls1024 fused)")
    run("unfused keep2 kb32 cls1024", fused_sel=False)
    run("keep1 kb32 cls1024 unfused", keep2=False, fused_sel=False)
    run("keep1 kb32 cls1024 fused... kb16", keep2=False, kb=16)
    run("keep2 kb32 cls2048 fused", cls=2048)
    run("keep2 kb32 cls2048 unfused", cls=2048, fused_sel=False)
    run("keep2 kb64 cls1024 unfused", kb=64, fused_sel=False)
    run("auto tq256", tq=256)

    # host-constructor variant (shuffle + host ext pack): separates
    # from_device packing/order from the kernel itself
    t0 = time.time()
    hidx = FastFlatIndex(base)
    hpre = hidx.preload(queries, batch_size=2048)
    ids, _ = hidx.search(queries, 10, batch_size=2048, preloaded=hpre,
                         with_dists=False)
    score("host-constructor auto", ids,
          {"seconds": round(time.time() - t0, 1)})

    # the r4 production default: from_device WITH the on-device ingest
    # permutation (auto below SHUFFLE_MAX_BYTES) — should match the
    # host-constructor row (both break same-class decoy correlation)
    t0 = time.time()
    sidx = FastFlatIndex.from_device(ds.base_dev, shuffle=True)
    spre = sidx.preload(queries, batch_size=2048)
    ids, _ = sidx.search(queries, 10, batch_size=2048, preloaded=spre,
                         with_dists=False)
    score("from_device shuffled auto", ids,
          {"seconds": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
