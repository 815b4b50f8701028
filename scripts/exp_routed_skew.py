#!/usr/bin/env python
"""Routed-IVF x Zipf skew: the reference's skew experiment
(exp_cache_size_and_skew.py) applied to on-chip probe routing.

Under Zipf-skewed workloads repeated/nearby queries probe the same
clusters, so affinity tiles get more homogeneous and the shared union
covers more wishes — the same mechanism that heats the reference's CN
cache (cache.hh) heats the tile unions here. This script measures
recall / probe coverage / QPS per alpha at a fixed routed config.

Works on the CPU mesh (coverage/recall; slow QPS) or the real chip.
Appends JSONL to results/routed_skew.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

if os.environ.get("SHINE_FORCE_CPU_DEVICES"):
    from shine_tpu.cli import _maybe_force_cpu_mesh

    _maybe_force_cpu_mesh()

from shine_tpu.io import recall_at_k, synthetic_dataset  # noqa: E402
from shine_tpu.io.skew import skewed_workload  # noqa: E402
from shine_tpu.models.ivf import IVFIndex  # noqa: E402

N = int(os.environ.get("SHINE_SKEW_N", 200_000))
D = int(os.environ.get("SHINE_SKEW_D", 128))
NQ = int(os.environ.get("SHINE_SKEW_Q", 10_000))
OUT = os.path.join(ROOT, "results", "routed_skew.jsonl")


def main() -> None:
    cache = os.path.join(ROOT, ".bench_cache", f"ds_{N}x{D}_q{NQ}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        base, pool, gt = z["base"], z["queries"], z["gt"]
    else:
        ds = synthetic_dataset(n=N, dim=D, num_queries=NQ, seed=7, gt_k=10)
        base, pool, gt = ds.base, ds.queries, ds.ground_truth
    ivf = IVFIndex(base, seed=7)
    cfg = dict(probes=16, shared=128, tile=64)
    for alpha in (0.0, 0.75, 1.25):
        _, q, pool_idx = skewed_workload(
            pool, total=NQ, alpha=alpha, warmup=0, seed=3
        )
        g = gt[pool_idx]
        pre = ivf.preload(q, batch_size=4096)
        ivf.search_routed(q, 10, **cfg, preloaded=pre)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            ids, _, st = ivf.search_routed(
                q, 10, **cfg, preloaded=pre, with_stats=True
            )
            best = min(best, time.time() - t0)
        rec = {
            "alpha": alpha,
            "qps": round(len(q) / best),
            "recall10": round(float(recall_at_k(ids, g, 10)), 4),
            "coverage": round(float(st["probe_coverage"]), 4),
            **cfg,
            "n": N,
        }
        print("#", json.dumps(rec), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
