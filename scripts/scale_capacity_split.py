#!/usr/bin/env python
"""Split-layout capacity validation: how many rows can ONE chip serve?

The packed-ext capacity mode tops out ~21-25M rows/chip at d=128
(512 B/row). The split layout (ops/pallas_scan_split.py) stores
lane-exact components + f32 (nrm, scl): 264 B/row (bf16) or 136 B/row
(int8) — so one chip reaches the 40-100M class, and an 8-chip v5e slice
the 0.3-0.8B class, vs the reference's 100M across a 5-MN cluster
(/root/reference/src/memory_node.hh:112-125, scripts/datasets.py:13-20).

Search re-ranks against EXACT f32 rows regenerated in-jit from the
row-keyed PRNG (ops/distance.py:regen_rerank_topk), so the recall
envelope is set by scan candidate quality, not storage precision.

Env: SHINE_CAPS_N (rows, default 41_943_040), SHINE_CAPS_D (128),
SHINE_CAPS_COMP (int8|bf16), SHINE_CAPS_KB (comma list, default 32,64),
SHINE_CAPS_MODE (auto|exact|turbo: auto follows the measured search
defaults; exact forces keep2 cls=1024 — recall 1.0; turbo forces
keep2-off cls=4096 — ~1.7x QPS at recall ~0.999).
Appends results/scale_capacity_split.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# SHINE_CAPS_CPU=1: pre-flight the WHOLE script on the host CPU (tiny N,
# interpret-mode kernel) before an unattended on-chip queue runs it
_CPU_SMOKE = os.environ.get("SHINE_CAPS_CPU") == "1"
if _CPU_SMOKE:
    import jax

    jax.config.update("jax_platforms", "cpu")

from shine_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

N = int(os.environ.get("SHINE_CAPS_N", 41_943_040))
D = int(os.environ.get("SHINE_CAPS_D", 128))
COMP = os.environ.get("SHINE_CAPS_COMP", "int8")
KBS = [int(x) for x in os.environ.get("SHINE_CAPS_KB", "32,64").split(",")]
MODE = os.environ.get("SHINE_CAPS_MODE", "auto")
# stage-1 trim before the exact regen re-rank (0 = off); the split int8
# layout is where the trim's byte arithmetic is a clear win (TPU_NOTES
# "prerank" section)
PRERANK = int(os.environ.get("SHINE_CAPS_PRERANK", 0))
MODE_KW = {
    "auto": {},
    "exact": {"keep2": True, "cls": 1024},
    "turbo": {"keep2": False, "cls": 4096},
}[MODE]
NQ = 2048
OUT = os.path.join(
    ROOT, "results",
    "scale_capacity_split.smoke.jsonl" if _CPU_SMOKE
    else "scale_capacity_split.jsonl",
)


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, "comp": COMP, "mode": MODE, **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
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
    gb = (ds.comp_dev.nbytes + ds.aux_dev.nbytes) / 1e9
    emit({"stage": "ingest", "seconds": round(time.time() - t0, 1),
          "table_gb": round(gb, 2)})
    if os.environ.get("SHINE_GT_CROSSCHECK", "1") == "1":
        # scorer self-certification (VERDICT r4 #6): device exact scorer
        # vs numpy oracle on a regenerated row subset
        from shine_tpu.io.device_synth import rowkeyed_scorer_crosscheck

        t0 = time.time()
        ov = rowkeyed_scorer_crosscheck(
            ds.row_source, np.asarray(ds.queries),
            n_sub=int(os.environ.get("SHINE_GT_NSUB", 524_288)),
        )
        emit({"stage": "gt-crosscheck", "gt_overlap": round(float(ov), 4),
              "seconds": round(time.time() - t0, 1)})
        assert ov > 0.995, f"device scorer corrupt (overlap {ov})"

    idx = SplitFlatIndex.from_parts(
        ds.comp_dev, ds.aux_dev, ds.n, dim=D, row_source=ds.row_source
    )
    if _CPU_SMOKE:
        idx.interpret = True
    pre = idx.preload(ds.queries, batch_size=2048)
    for kb in KBS:
        kw = dict(kb=kb, batch_size=2048, preloaded=pre, with_dists=False,
                  prerank=PRERANK, **MODE_KW)
        ids, _ = idx.search(ds.queries, 10, **kw)
        best = float("inf")
        for _ in range(2):
            t1 = time.time()
            ids, _ = idx.search(ds.queries, 10, **kw)
            best = min(best, time.time() - t1)
        emit({
            "stage": "search", "kb": kb, "prerank": PRERANK,
            "qps": round(NQ / best, 1),
            "recall10": round(recall_at_k(ids, ds.ground_truth, 10), 4),
        })


if __name__ == "__main__":
    main()
