#!/usr/bin/env python
"""Serve the 10M HNSW checkpoint with quantized row storage.

Traversal is gather-bandwidth-bound, so bf16 rows (256 B at d=128) and
int8 rows (132 B) should convert byte savings into QPS the way the r3
norm-column removal did (512 B -> ~1.5x QPS). Serves the checkpointed
graph (no rebuild — quantization happens at upload, host-side), measures
QPS + id-recall + eps-recall per (rows, ef).

f32 serving at 10M is skipped: base (5.4 GB for eps) + f32 rows (5.4) +
M=32 neighbors (2.7) exceeds HBM; the f32 baseline rows are in
results/scale_10m_hnsw.jsonl from the build run.

Env: SHINE_10MH_M (checkpoint selector), SHINE_10MH_ROWS (default
"bf16,int8"). Appends results/scale_10m_hnsw.jsonl.
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

N, D, NQ = 10_485_760, 128, 2048
M = int(os.environ.get("SHINE_10MH_M", 32))
ROWS = os.environ.get("SHINE_10MH_ROWS", "bf16,int8").split(",")
OUT = os.path.join(ROOT, "results", "scale_10m_hnsw.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, "m": M, **rec}
    print("#", json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.config import SearchParams
    from shine_tpu.io import load_graph, recall_at_k
    from shine_tpu.io.device_synth import device_synthetic_dataset
    from shine_tpu.io.recall import recall_at_k_eps
    from shine_tpu.models import HNSWIndex

    t0 = time.time()
    ds = device_synthetic_dataset(n=N, dim=D, num_queries=NQ, seed=29,
                                  gt_k=10)
    emit({"stage": "gen+gt(quant)", "seconds": round(time.time() - t0, 1)})
    queries, gt = ds.queries, ds.ground_truth
    # the M=32 graph (2.7 GB edges + rows) cannot share HBM with the
    # 5.4 GB f32 base: free it and regenerate AFTER the searches for the
    # eps-recall pass (the base is a pure fn of the seed)
    ds.base_dev = None
    ds = None
    ckpt = os.path.join(
        ROOT, ".bench_cache",
        f"hnsw10m_{N}x{D}.npz" if M == 16 else f"hnsw10m_{N}x{D}_m{M}.npz",
    )
    graph = load_graph(ckpt)
    kept: list[tuple[str, int, np.ndarray]] = []  # eps pass at the end
    for rows in ROWS:
        t0 = time.time()
        idx = HNSWIndex(graph, rows=rows)
        emit({"stage": "upload", "rows": rows,
              "seconds": round(time.time() - t0, 1)})
        for ef in (64, 96, 128):
            sp = SearchParams(k=10, ef=ef, frontier=8)
            ids, _ = idx.search(queries, sp, batch_size=2048)
            best = float("inf")
            for _ in range(2):
                t1 = time.time()
                ids, _ = idx.search(queries, sp, batch_size=2048)
                best = min(best, time.time() - t1)
            emit({
                "stage": "hnsw-quant", "rows": rows, "ef": ef,
                "qps": round(NQ / best, 1),
                "id_recall10": round(recall_at_k(ids, gt, 10), 4),
            })
            if ef >= 96:
                kept.append((rows, ef, ids))
        del idx
    graph = None
    t0 = time.time()
    ds = device_synthetic_dataset(n=N, dim=D, num_queries=NQ, seed=29,
                                  compute_gt=False)
    emit({"stage": "regen(eps)", "seconds": round(time.time() - t0, 1)})
    for rows, ef, ids in kept:
        emit({"stage": "hnsw-quant-eps", "rows": rows, "ef": ef,
              "eps_recall10": round(recall_at_k_eps(
                  ids, queries, ds.base_dev, gt, 10, rtol=1e-4), 4)})


if __name__ == "__main__":
    main()
