#!/usr/bin/env python
"""Split-scan operating-point sweep: is keep2 worth 2x VPU select work?

The split kernel's measured 15.7 ns/row marginal (vs the ext kernel's
6.05) is NOT the MXU — dpc=128 is HALF the ext dp=256 MXU work — it is
the VPU class-max select: the capacity defaults run keep2 (2x select
state + ~2.6x select ops) plus the per-member aux multiply-add. With
the EXACT regen re-rank downstream (ops/distance.py:regen_rerank_topk)
the scan only has to get true neighbors into their class slot; this
sweep measures on the real chip whether keep2-off at a larger cls
(collision loss ~ decoys/cls) holds recall 1.0 at a ~2x lower wall.

Env: SHINE_TSK_N (default 16_777_216), SHINE_TSK_COMP (int8).
Appends results/tune_split_kernel.jsonl.
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

N = int(os.environ.get("SHINE_TSK_N", 16_777_216))
D = 128
COMP = os.environ.get("SHINE_TSK_COMP", "int8")
NQ = 2048
OUT = os.path.join(ROOT, "results", "tune_split_kernel.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, "comp": COMP, **rec}
    print("#", json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.io import recall_at_k
    from shine_tpu.io.device_synth import device_rowkeyed_split_dataset
    from shine_tpu.models.flat import SplitFlatIndex

    t0 = time.time()
    ds = device_rowkeyed_split_dataset(
        n=N, dim=D, num_queries=NQ, seed=17, gt_k=10, comp_dtype=COMP
    )
    emit({"stage": "ingest", "seconds": round(time.time() - t0, 1)})

    idx = SplitFlatIndex.from_parts(
        ds.comp_dev, ds.aux_dev, ds.n, dim=D, row_source=ds.row_source
    )
    pre = idx.preload(ds.queries, batch_size=2048)

    # (keep2, cls, kb): current default first, then the keep2-off ladder
    configs = [(False, 4096, 32), (False, 4096, 64)]
    for keep2, cls, kb in configs:
        kw = dict(kb=kb, cls=cls, keep2=keep2, batch_size=2048,
                  preloaded=pre, with_dists=False)
        ids, _ = idx.search(ds.queries, 10, **kw)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t1 = time.time()
            ids, _ = idx.search(ds.queries, 10, **kw)
            best = min(best, time.time() - t1)
        emit({
            "stage": "search", "keep2": keep2, "cls": cls, "kb": kb,
            "wall_s": round(best, 4),
            "qps": round(NQ / best, 1),
            "ns_per_row": round(best / N * 1e9, 3),
            "recall10": round(recall_at_k(ids, ds.ground_truth, 10), 4),
        })


if __name__ == "__main__":
    main()
