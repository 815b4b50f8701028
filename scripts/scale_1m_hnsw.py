#!/usr/bin/env python
"""1M-row HNSW graph family on chip (r3): build via fastbuild, serve via
batched_search; position the graph path against the scan families at 1M.

The r2 verdict's gap: the graph family had never been built or served
above 200k rows on the chip. The kNN stage of fast_build_graph
(models/fastbuild.py) is the same fused scan that serves 10M rows, so
the build scales; this script measures 1M x 128 build wall (reference
build-time metric: compute_node.cc:549-553) and QPS/recall at
ef in {64, 96, 128} (knn semantics: hnsw.hh:253-307), plus a same-
dataset fastflat row for the head-to-head.

Env: SHINE_1M_N (default 1_048_576), SHINE_1M_D (128), SHINE_1M_EFS.
Results append to results/scale_1m_hnsw.jsonl.
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

N = int(os.environ.get("SHINE_1M_N", 1_048_576))
D = int(os.environ.get("SHINE_1M_D", 128))
M = int(os.environ.get("SHINE_1M_M", 16))
# efc-parity pool (exact top-`pool` candidates into select_heuristic —
# the reference ef_construction analog, fastbuild docstring); 0 = 2M
POOL = int(os.environ.get("SHINE_1M_EFC", 0))
NQ = 2048
EFS = tuple(
    int(x) for x in os.environ.get("SHINE_1M_EFS", "64,96,128").split(",")
)
OUT = os.path.join(ROOT, "results", "scale_1m_hnsw.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.config import HNSWParams, SearchParams
    from shine_tpu.io import margin_mask, recall_at_k
    from shine_tpu.io.device_synth import device_synthetic_dataset
    from shine_tpu.models import HNSWIndex
    from shine_tpu.models.fastbuild import fast_build_graph
    from shine_tpu.models.flat import FastFlatIndex

    t0 = time.time()
    # gt_k=11: the 11th column feeds margin_mask (queries whose top-10
    # boundary gap exceeds bf16 rtol — id-recall on those is the
    # artifact-free number)
    ds = device_synthetic_dataset(
        n=N, dim=D, num_queries=NQ, seed=23, gt_k=11
    )
    emit({"stage": "gen+gt", "seconds": round(time.time() - t0, 1)})
    mm = margin_mask(ds.queries, ds.base_dev, ds.ground_truth, 10,
                     rtol=1e-4)
    emit({"stage": "margin", "margin_frac": round(float(mm.mean()), 4)})

    def recalls(ids) -> dict:
        return {
            "recall10": round(recall_at_k(ids, ds.ground_truth, 10), 4),
            "recall10_margin": round(
                recall_at_k(ids[mm], ds.ground_truth[mm], 10), 4
            ),
        }

    # same-dataset fastflat row for the head-to-head
    t0 = time.time()
    ff = FastFlatIndex.from_device(ds.base_dev)
    pre = ff.preload(ds.queries, batch_size=2048)
    ids, _ = ff.search(ds.queries, 10, batch_size=2048, preloaded=pre,
                       with_dists=False)
    best = float("inf")
    for _ in range(2):
        t1 = time.time()
        ids, _ = ff.search(ds.queries, 10, batch_size=2048, preloaded=pre,
                           with_dists=False)
        best = min(best, time.time() - t1)
    emit({"stage": "fastflat", "qps": round(NQ / best, 1),
          **recalls(ids),
          "build_seconds": round(time.time() - t0 - 2 * best, 1)})

    # host copy for the graph build (fastbuild keeps the graph host-side)
    t0 = time.time()
    base = np.asarray(ds.base_dev)
    emit({"stage": "base-download", "seconds": round(time.time() - t0, 1),
          "gb": round(base.nbytes / 1e9, 2)})
    # scorer self-certification (VERDICT r4 #6): numpy-exact GT subset
    t0 = time.time()
    from shine_tpu.io import gt_crosscheck

    ov = gt_crosscheck(
        np.asarray(ds.queries), base, np.asarray(ds.ground_truth), 10,
        n_eval=int(os.environ.get("SHINE_GT_NEVAL", 256)),
    )
    emit({"stage": "gt-crosscheck", "gt_overlap": round(float(ov), 4),
          "seconds": round(time.time() - t0, 1)})
    assert ov > 0.995, f"device GT corrupt (overlap {ov})"

    os.environ["SHINE_FASTBUILD_TIMING"] = "1"
    params = HNSWParams(M=M, ef_construction=POOL or 200)
    # crash-resume checkpoint for layer 0; a leftover stage file would make
    # build_s a lie (layer 0 skipped), so unless the caller explicitly asks
    # to resume (SHINE_1M_RESUME=1) a stale one is removed first
    tag = ("" if M == 16 else f"_m{M}") + (f"_efc{POOL}" if POOL else "")
    stage = os.path.join(ROOT, ".bench_cache",
                         f"hnsw1m_{N}x{D}{tag}_stage0.npz")
    if os.environ.get("SHINE_1M_RESUME") != "1" and os.path.exists(stage):
        os.remove(stage)
    t0 = time.time()
    graph = fast_build_graph(base, params, stage_path=stage, pool=POOL)
    build_s = time.time() - t0
    emit({"stage": "fastbuild", "seconds": round(build_s, 1),
          "M": params.M, "pool": POOL})

    idx = HNSWIndex(graph)
    for ef in EFS:
        sp = SearchParams(k=10, ef=ef, frontier=8)
        ids, _ = idx.search(ds.queries, sp, batch_size=2048)
        best = float("inf")
        for _ in range(2):
            t1 = time.time()
            ids, _ = idx.search(ds.queries, sp, batch_size=2048)
            best = min(best, time.time() - t1)
        emit({"stage": "hnsw", "ef": ef, "qps": round(NQ / best, 1),
              **recalls(ids)})


if __name__ == "__main__":
    main()
