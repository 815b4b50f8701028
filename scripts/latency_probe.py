#!/usr/bin/env python
"""Low-batch latency probe (r3): quantify the graph family's claimed
niche — per-dispatch latency at batch 1-512 for HNSW vs the fused scan.

The scan streams the WHOLE table per dispatch regardless of batch, so
its latency is ~flat in B; HNSW touches ~ef*M rows per query, so small
batches should win on latency even though the scan dominates batch
throughput. Walls include the dev-tunnel round trip (~30 ms constant,
absent in production serving) — the RELATIVE gap is the signal.

Uses the bench dataset cache (200k x 128). Appends
results/latency_probe.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from shine_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

OUT = os.path.join(ROOT, "results", "latency_probe.jsonl")


def emit(rec: dict) -> None:
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def bestof(fn, reps: int = 5) -> float:
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from shine_tpu.config import HNSWParams, SearchParams
    from shine_tpu.io import Dataset, index_path, load_graph, recall_at_k
    from shine_tpu.models import HNSWIndex
    from shine_tpu.models.flat import FastFlatIndex

    cache_dir = os.path.join(ROOT, ".bench_cache")
    z = np.load(os.path.join(cache_dir, "ds_200000x128_q10000.npz"))
    ds = Dataset(z["base"], z["queries"], z["gt"], name="synth-200000x128")
    params = HNSWParams(M=16, ef_construction=200)
    graph = load_graph(index_path(cache_dir, ds.name, params))
    hnsw = HNSWIndex(graph)
    fast = FastFlatIndex(ds.base)

    for B in (1, 8, 64, 512):
        q = ds.queries[:B]
        gt = ds.ground_truth[:B]
        sp = SearchParams(k=10, ef=64, frontier=8)
        w = bestof(lambda: hnsw.search(q, sp, batch_size=B))
        ids, _ = hnsw.search(q, sp, batch_size=B)
        emit({"engine": "hnsw", "batch": B, "ms": round(w * 1e3, 2),
              "qps": round(B / w, 1),
              "recall10": round(recall_at_k(ids, gt, 10), 4)})
        tq = min(512, max(128, B))
        w = bestof(
            lambda: fast.search(q, 10, batch_size=B, tq=tq, with_dists=False)
        )
        ids, _ = fast.search(q, 10, batch_size=B, tq=tq, with_dists=False)
        emit({"engine": "fastflat", "batch": B, "ms": round(w * 1e3, 2),
              "qps": round(B / w, 1),
              "recall10": round(recall_at_k(ids, gt, 10), 4)})


if __name__ == "__main__":
    main()
