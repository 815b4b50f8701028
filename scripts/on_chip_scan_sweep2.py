#!/usr/bin/env python
"""Probe: is the 200k fastflat '34 ms wall' per-chunk compute or
amortizable overhead?

Evidence that sparked this: the identical classmax kernel (pallas_scan3)
measures ~21.7 us per (tq=512, tn=1024) chunk-step at 200k rows but
~2.5 us per chunk-step at 10M rows (scripts/scale_10m_validation.py) —
an 8.7x per-chunk gap for the same tile shapes. If the gap is
per-program/per-dispatch overhead, fewer/bigger programs (larger tq,
larger batch) should lift the 200k headline well past 138k QPS.

Sweeps (batch, tq, cls, kb) on the cached 200k x 128 dataset; prints
QPS + recall. VMEM bound: scoped (tq, cls) f32 x2 must stay < ~14 MB.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from shine_tpu.io import Dataset, recall_at_k  # noqa: E402
from shine_tpu.models.flat import FastFlatIndex  # noqa: E402

z = np.load(os.path.join(ROOT, ".bench_cache", "ds_200000x128_q10000.npz"))
ds = Dataset(z["base"], z["queries"], z["gt"], name="synth-200k")
nq = len(ds.queries)

fast = FastFlatIndex(ds.base)

GRID = [
    # (batch, tq, cls, kb) — baseline first
    (4096, 512, 1024, 32),
    (4096, 1024, 1024, 32),
    (8192, 1024, 1024, 32),
    (16384, 1024, 1024, 32),
    (8192, 2048, 512, 48),
    (16384, 2048, 512, 48),
    (4096, 256, 1024, 32),
]

for batch, tq, cls, kb in GRID:
    try:
        pre = fast.preload(ds.queries, batch_size=batch)
        fast.search(ds.queries, 10, batch_size=batch, tq=tq, cls=cls,
                    kb=kb, preloaded=pre, with_dists=False)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            ids, _ = fast.search(ds.queries, 10, batch_size=batch, tq=tq,
                                 cls=cls, kb=kb, preloaded=pre,
                                 with_dists=False)
            best = min(best, time.time() - t0)
        r = recall_at_k(ids, ds.ground_truth, 10)
        print(f"# batch={batch} tq={tq} cls={cls} kb={kb}: "
              f"qps={nq/best:.0f} recall@10={r:.4f}", flush=True)
    except Exception as e:
        print(f"# batch={batch} tq={tq} cls={cls} kb={kb}: FAIL {e!r}",
              flush=True)
