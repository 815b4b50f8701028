#!/usr/bin/env python
"""Distance-tolerance recall for the 10M HNSW graph (r3 follow-up).

The 10M serve rows report id-recall (0.75-0.82 at ef 64-128), but this
synthetic family's id-recall ceiling is ~0.92 from near-ties (r2 10M
eps analysis). With the graph layout halved, the 5 GB base and the
graph now fit HBM together, so recall_at_k_eps can score the SAME
search against exact distances. Appends results/scale_10m_hnsw.jsonl.
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
M = int(os.environ.get("SHINE_10MH_M", 16))
OUT = os.path.join(ROOT, "results", "scale_10m_hnsw.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, "m": M, **rec}
    print("#", json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.config import HNSWParams, SearchParams
    from shine_tpu.io import load_graph, recall_at_k
    from shine_tpu.io.device_synth import device_synthetic_dataset
    from shine_tpu.io.recall import recall_at_k_eps
    from shine_tpu.models import HNSWIndex

    t0 = time.time()
    ds = device_synthetic_dataset(
        n=N, dim=D, num_queries=NQ, seed=29, gt_k=10
    )
    emit({"stage": "gen+gt(eps)", "seconds": round(time.time() - t0, 1)})
    ckpt = os.path.join(
        ROOT, ".bench_cache",
        f"hnsw10m_{N}x{D}.npz" if M == 16 else f"hnsw10m_{N}x{D}_m{M}.npz",
    )
    graph = load_graph(ckpt)
    idx = HNSWIndex(graph)
    for ef in (96, 128):
        sp = SearchParams(k=10, ef=ef, frontier=8)
        ids, _ = idx.search(ds.queries, sp, batch_size=2048)
        rid = recall_at_k(ids, ds.ground_truth, 10)
        eps = recall_at_k_eps(
            ids, ds.queries, ds.base_dev, ds.ground_truth, 10, rtol=1e-4
        )
        emit({"stage": "hnsw-eps", "ef": ef,
              "id_recall10": round(rid, 4), "eps_recall10": round(eps, 4)})


if __name__ == "__main__":
    main()
