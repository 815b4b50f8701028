#!/usr/bin/env python
"""Grid-tune the class-max scan's (tq, tn) at headline shape (r3).

Perf model (docs/TPU_NOTES.md 'Scan perf model'): at 200k rows the sweep
is per-chunk-step overhead-bound, not MXU- or HBM-bound — 784 chunk
steps x ~35 us vs ~1.4 us of MXU work each. Fewer, larger steps (bigger
tq -> fewer grid steps; bigger tn -> fewer chunks) should close part of
the 8x gap to the 10M sustained rate.

Env: SHINE_TUNE_N (200_000), SHINE_TUNE_D (128), SHINE_TUNE_Q (10_000).
Appends results/tune_scan_grid.jsonl.
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from shine_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

N = int(os.environ.get("SHINE_TUNE_N", 200_000))
D = int(os.environ.get("SHINE_TUNE_D", 128))
NQ = int(os.environ.get("SHINE_TUNE_Q", 10_000))
OUT = os.path.join(ROOT, "results", "tune_scan_grid.jsonl")


def emit(rec: dict) -> None:
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.io import recall_at_k
    from shine_tpu.models.flat import FastFlatIndex

    cache = os.path.join(ROOT, ".bench_cache", f"ds_{N}x{D}_q{NQ}.npz")
    z = np.load(cache)
    base, queries, gt = z["base"], z["queries"], z["gt"]
    idx = FastFlatIndex(base)
    pre = idx.preload(queries, batch_size=4096)
    n_pad = int(idx.ext.shape[0])
    for tq, tn, cls in itertools.product(
        (512, 1024), (2048, 4096), (1024, 2048)
    ):
        if n_pad % tn or tn % cls:
            continue
        idx.tn = tn
        kw = dict(batch_size=4096, tq=tq, cls=cls, preloaded=pre,
                  with_dists=False, keep2=False)
        ids, _ = idx.search(queries, 10, **kw)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ids, _ = idx.search(queries, 10, **kw)
            best = min(best, time.perf_counter() - t0)
        emit({
            "n": N, "d": D, "tq": tq, "tn": tn, "cls": cls,
            "qps": round(NQ / best, 1),
            "recall10": round(recall_at_k(ids, gt, 10), 4),
            "tflops": round(2.0 * NQ * n_pad * idx.dp / best / 1e12, 1),
        })


if __name__ == "__main__":
    main()
