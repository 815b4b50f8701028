#!/usr/bin/env python
"""Validate the r3 measured defaults at 1M on chip (VERDICT r2 weak #6).

r2 measured the failure this fixes: at 1M, `IVFIndex.from_device`
defaulted to a fine C=7813 layout whose routed coverage collapsed to
0.45 and recall to 0.55. The defaults now encode the measured rules:
layout="routed" -> coarse C<=2048, and search_routed spills queries
with granted fraction < 0.5 to the exact probe path. This script
measures the DEFAULT configuration end-to-end at 1M x 128.

Appends results/routed_defaults.jsonl.
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

N = int(os.environ.get("SHINE_RD_N", 1_048_576))
D = int(os.environ.get("SHINE_RD_D", 128))
NQ = 2048
OUT = os.path.join(ROOT, "results", "routed_defaults.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.io import recall_at_k
    from shine_tpu.io.device_synth import device_synthetic_dataset
    from shine_tpu.models.ivf import IVFIndex

    t0 = time.time()
    ds = device_synthetic_dataset(n=N, dim=D, num_queries=NQ, seed=31,
                                  gt_k=10)
    emit({"stage": "gen+gt", "seconds": round(time.time() - t0, 1)})

    t0 = time.time()
    idx = IVFIndex.from_device(ds.base_dev, layout="routed", seed=7)
    emit({"stage": "build", "seconds": round(time.time() - t0, 1),
          "C": idx.data.num_clusters, "cap": idx.data.cap})

    pre = idx.preload(ds.queries, batch_size=4096)
    for fb in (None, 0.0):  # default (0.5 floor) vs disabled
        kw = dict(probes=16, shared=128, tile=64, batch_size=4096,
                  preloaded=pre, with_stats=True)
        if fb is not None:
            kw["fallback"] = fb
        ids, _, st = idx.search_routed(ds.queries, 10, **kw)
        best = float("inf")
        for _ in range(2):
            t1 = time.time()
            ids, _, st = idx.search_routed(ds.queries, 10, **kw)
            best = min(best, time.time() - t1)
        emit({"stage": "routed", "fallback": "default" if fb is None else fb,
              "qps": round(NQ / best, 1),
              "recall10": round(recall_at_k(ids, ds.ground_truth, 10), 4),
              "coverage": round(st["probe_coverage"], 4),
              "spilled": st["fallback_queries"]})


if __name__ == "__main__":
    main()
