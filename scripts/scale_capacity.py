#!/usr/bin/env python
"""Capacity-mode scale validation (r3): row-keyed streaming ingestion +
ext-only serving with the EXACT regen re-rank.

The r2 capacity mode reached 20.97M rows/chip but its bf16 ext re-rank
capped recall at ~0.72 on the synthetic density (TPU_NOTES "Capacity
mode"). Row-keyed datasets (io/device_synth.py:regen_rows) regenerate
any row exactly from fold_in(key, id), so the re-rank can use exact f32
rows at zero extra HBM — this script measures that escape hatch at
capacity scale, plus the bf16 re-rank baseline on the same table.

This single-chip run IS the per-shard recipe of the sharded capacity
mode (ShardedFastFlatIndex.from_ext): the sharded path adds one
(B, kb)-lane all_gather on top of exactly this per-shard work, so a
measured N-row point here grounds the S-chip cluster arithmetic at
S x N rows (reference envelope: 100M rows over 5 MNs,
/root/reference/src/memory_node.hh:112-125).

Env: SHINE_CAP_N (default 20_971_520), SHINE_CAP_D (128),
SHINE_CAP_METRIC (l2|ip — ip measures the DEEP/TTI-class
inner-product envelope), SHINE_CAP_RCHUNK (65536),
SHINE_CAP_SKIP_BF16, SHINE_CAP_CPU=1 (host-CPU pre-flight).
Results append to results/scale_capacity.jsonl.

BASELINE.md config lines this script covers beyond the 128-d L2
headline: GIST1M-class high-dim (SHINE_CAP_D=960 — VMEM tiling at
dp=1024 lanes) and DEEP10M-class IP (SHINE_CAP_D=96
SHINE_CAP_METRIC=ip).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# SHINE_CAP_CPU=1: whole script on host CPU (tiny N pre-flight; Pallas
# kernels run in interpret mode)
_CPU_SMOKE = os.environ.get("SHINE_CAP_CPU") == "1"
if _CPU_SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")

from shine_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

N = int(os.environ.get("SHINE_CAP_N", 20_971_520))
D = int(os.environ.get("SHINE_CAP_D", 128))
# "ip" measures the DEEP/TTI-class inner-product envelope
# (BASELINE.md: DEEP10M 96-d IP, TTI ip at 200-d)
METRIC = os.environ.get("SHINE_CAP_METRIC", "l2")
NQ = int(os.environ.get("SHINE_CAP_NQ", 2048))
BATCH = int(os.environ.get("SHINE_CAP_B", 2048))
RCHUNK = int(os.environ.get("SHINE_CAP_RCHUNK", 65_536))
OUT = os.path.join(
    ROOT, "results",
    "scale_capacity.smoke.jsonl" if _CPU_SMOKE else "scale_capacity.jsonl",
)


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, "metric": METRIC, **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def timed_search(idx, queries, pre, **kw):
    """Best-of-2 wall; np.asarray forces completion (block_until_ready
    does not block on axon — docs/TPU_NOTES.md)."""
    ids, _ = idx.search(queries, 10, preloaded=pre, with_dists=False, **kw)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        ids, _ = idx.search(
            queries, 10, preloaded=pre, with_dists=False, **kw
        )
        best = min(best, time.time() - t0)
    return len(queries) / best, ids


def main() -> None:
    from shine_tpu.io import recall_at_k
    from shine_tpu.io.device_synth import (
        device_rowkeyed_ext_dataset,
        streaming_eps_recall,
    )
    from shine_tpu.models.flat import FastFlatIndex

    t0 = time.time()
    # gt_k=11: the extra column feeds margin_mask (artifact-free
    # id-recall on real-boundary queries; L2 only — margin skipped on
    # other metrics, its distance model is squared-L2)
    ds = device_rowkeyed_ext_dataset(
        n=N, dim=D, num_queries=NQ, seed=17, gt_k=11, rchunk=RCHUNK,
        metric=METRIC,
    )
    np.asarray(ds.ext_dev[:1])  # force
    emit({"stage": "rowkeyed-ingest+gt", "seconds": round(time.time() - t0, 1),
          "ext_gb": round(ds.ext_dev.nbytes / 1e9, 2)})
    if os.environ.get("SHINE_GT_CROSSCHECK", "1") == "1":
        # scorer self-certification (VERDICT r4 #6): device exact scorer
        # vs numpy oracle on a regenerated row subset
        from shine_tpu.io.device_synth import rowkeyed_scorer_crosscheck

        t0 = time.time()
        ov = rowkeyed_scorer_crosscheck(
            ds.row_source, np.asarray(ds.queries), metric=METRIC,
            n_sub=int(os.environ.get("SHINE_GT_NSUB", 524_288)),
        )
        emit({"stage": "gt-crosscheck", "gt_overlap": round(float(ov), 4),
              "seconds": round(time.time() - t0, 1)})
        assert ov > 0.995, f"device scorer corrupt (overlap {ov})"
    mm = None
    if METRIC == "l2":
        from shine_tpu.io import margin_mask

        mm = margin_mask(ds.queries, None, ds.ground_truth, 10,
                         row_source=ds.row_source)
        emit({"stage": "margin",
              "margin_frac": round(float(mm.mean()), 4)})

    def margin(ids):
        if mm is None:
            return None
        return round(recall_at_k(ids[mm], ds.ground_truth[mm], 10), 4)

    # exact regen re-rank (the escape hatch)
    idx = FastFlatIndex.from_ext(
        ds.ext_dev, ds.n, METRIC, dim=D, row_source=ds.row_source
    )
    idx.interpret = _CPU_SMOKE
    pre = idx.preload(ds.queries, batch_size=BATCH)
    for kb, keep2 in ((32, None), (64, None), (32, False)):
        qps, ids = timed_search(
            idx, ds.queries, pre, kb=kb, batch_size=BATCH, keep2=keep2
        )
        rec = recall_at_k(ids, ds.ground_truth, 10)
        eps = streaming_eps_recall(ds, ids, 10, rtol=1e-4)
        emit({"stage": "regen-exact", "kb": kb,
              "keep2": "auto" if keep2 is None else keep2,
              "qps": round(qps, 1), "recall10": round(rec, 4),
              "eps_recall10": round(eps, 4),
              "recall10_margin": margin(ids)})

    if os.environ.get("SHINE_CAP_SKIP_BF16", "") != "1":
        # bf16 ext re-rank baseline on the same table (r2 behavior)
        bf = FastFlatIndex.from_ext(ds.ext_dev, ds.n, METRIC, dim=D)
        bf.interpret = _CPU_SMOKE
        qps, ids = timed_search(bf, ds.queries, pre, kb=32, batch_size=BATCH)
        rec = recall_at_k(ids, ds.ground_truth, 10)
        eps = streaming_eps_recall(ds, ids, 10, rtol=1e-4)
        emit({"stage": "bf16-rerank", "kb": 32, "qps": round(qps, 1),
              "recall10": round(rec, 4), "eps_recall10": round(eps, 4),
              "recall10_margin": margin(ids)})


if __name__ == "__main__":
    main()
