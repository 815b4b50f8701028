#!/usr/bin/env python
"""10M-row single-chip validation — everything device-resident.

At this scale the base (10M x 128 f32 = 5 GB) cannot round-trip the
~20 MB/s dev tunnel, so the whole pipeline runs in HBM: generation
(io/device_synth), exact ground truth (FlatIndex.from_device, f32),
index construction (FastFlatIndex.from_device / IVFIndex.from_device),
and search. Only queries, ground-truth ids, and result ids touch the
host. This is the reference's 100M-class regime scaled to one chip
(its 5-MN cluster holds ~20M rows per node, memory_node.hh:112-125).

Phases:
  fastflat — generate + GT + fused-scan QPS/recall (O(N) per query)
  ivf      — device-built IVF: per-query and routed QPS/recall sweeps

Env: SHINE_10M_N (default 10_000_000), SHINE_10M_D (128).
Results append to results/scale_10m.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = int(os.environ.get("SHINE_10M_N", 10_000_000))
D = int(os.environ.get("SHINE_10M_D", 128))
NQ = 2048
OUT = os.path.join(ROOT, "results", "scale_10m.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, **rec}
    print("#", json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def make_dataset():
    from shine_tpu.io.device_synth import device_synthetic_dataset

    t0 = time.time()
    ds = device_synthetic_dataset(n=N, dim=D, num_queries=NQ, seed=17,
                                  gt_k=10)
    emit({"stage": "gen+gt", "seconds": round(time.time() - t0, 1)})
    return ds


def phase_fastflat():
    from shine_tpu.io import recall_at_k
    from shine_tpu.models.flat import FastFlatIndex

    ds = make_dataset()
    t0 = time.time()
    fast = FastFlatIndex.from_device(ds.base_dev)
    emit({"stage": "fastflat_build", "seconds": round(time.time() - t0, 1)})
    pre = fast.preload(ds.queries, batch_size=2048)
    # at 10M the bf16 near-tie margin (kb) and class-collision rate (cls)
    # both need to scale: more rows -> more near-ties per query and more
    # rows per class (two true neighbors in one class shadow each other)
    # tq drops at cls=4096: the running (tq, cls) f32 state x2 must fit
    # scoped VMEM (16 MB)
    # keep2 (ops/pallas_scan3.py v4) keeps each class's runner-up: at
    # 2441+ rows/class a true neighbor is lost whenever ONE bf16
    # near-tie decoy beats it — the measured 0.91 recall ceiling here.
    # VMEM doubles, so tq halves at a given cls.
    for kb, cls, tq, keep2 in (
        (32, 1024, 512, False),
        (96, 2048, 512, False),
        (128, 4096, 256, False),
        (96, 2048, 256, True),
        (128, 4096, 64, True),  # tq=128 overflows scoped VMEM by 52 KB
    ):
        fast.search(ds.queries[:2048], 10, batch_size=2048, tq=tq, kb=kb,
                    cls=cls, preloaded=None, with_dists=False, keep2=keep2)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            ids, _ = fast.search(ds.queries, 10, batch_size=2048, tq=tq,
                                 kb=kb, cls=cls, preloaded=pre,
                                 with_dists=False, keep2=keep2)
            best = min(best, time.time() - t0)
        r = recall_at_k(ids, ds.ground_truth, 10)
        from shine_tpu.io import recall_at_k_eps

        re_ = recall_at_k_eps(ids, ds.queries, ds.base_dev,
                              ds.ground_truth, 10, rtol=1e-4)
        emit({"stage": f"fastflat_kb{kb}_cls{cls}"
              + ("_keep2" if keep2 else ""),
              "qps": round(NQ / best), "recall10": round(float(r), 4),
              "recall10_eps1e-4": round(float(re_), 4)})


def phase_ivf():
    from shine_tpu.io import recall_at_k
    from shine_tpu.models.ivf import IVFIndex

    ds = make_dataset()
    t0 = time.time()
    # target_cap=1024 -> C=9766: keeps the Lloyd train set at ~33 points
    # per centroid (train_size 16*8192*2.5). target_cap=256 (C=39k on
    # 262k train = 6.7/centroid) measured recall@p32 = 0.48 — undertrained
    # centroids, see docs/TPU_NOTES.md
    ivf = IVFIndex.from_device(ds.base_dev, target_cap=1024, seed=7,
                               train_size=327_680, iters=20)
    emit({"stage": "ivf_build", "seconds": round(time.time() - t0, 1),
          "clusters": ivf.data.num_clusters, "cap": ivf.data.cap})
    for p in (8, 16, 32):
        ivf.search(ds.queries[:512], 10, probes=p, batch_size=512)
        t0 = time.time()
        ids, _ = ivf.search(ds.queries, 10, probes=p, batch_size=512)
        dt = time.time() - t0
        r = recall_at_k(ids, ds.ground_truth, 10)
        emit({"stage": f"ivf_p{p}", "qps": round(NQ / dt),
              "recall10": round(float(r), 4)})
    # routed probing wants a separate COARSE layout (C ~ 1-2k regardless
    # of N so tile neighbors share probes — docs/TPU_NOTES.md '1M x 64
    # refresh'); the fine layout above is the per-query operating point
    del ivf
    t0 = time.time()
    ivf_c = IVFIndex.from_device(ds.base_dev, num_clusters=2048, seed=7,
                                 train_size=262_144, iters=20)
    emit({"stage": "ivf_coarse_build", "seconds": round(time.time() - t0, 1),
          "clusters": ivf_c.data.num_clusters, "cap": ivf_c.data.cap})
    pre = ivf_c.preload(ds.queries, batch_size=2048)
    for pr, sh, t in ((16, 128, 64), (16, 160, 128), (24, 192, 128)):
        ivf_c.search_routed(ds.queries, 10, probes=pr, shared=sh, tile=t,
                            batch_size=2048, preloaded=pre)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            ids, _, st = ivf_c.search_routed(
                ds.queries, 10, probes=pr, shared=sh, tile=t,
                batch_size=2048, preloaded=pre, with_stats=True,
            )
            best = min(best, time.time() - t0)
        r = recall_at_k(ids, ds.ground_truth, 10)
        emit({"stage": f"ivf_routed_p{pr}_s{sh}_t{t}", "qps": round(NQ / best),
              "recall10": round(float(r), 4),
              "coverage": round(float(st["probe_coverage"]), 3)})


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "fastflat"
    {"fastflat": phase_fastflat, "ivf": phase_ivf}[phase]()
