#!/usr/bin/env python
"""Sustained-stream batch-size sweep at the 200k headline shape.

The sustained bench row replays the GT query set as one preloaded
stream (the reference replays Zipf-sampled queries WITH replacement,
scripts/data/create_queries.py + skew.py), so the fixed per-call sync
amortizes and the per-dispatch terms bind:

    wall/dispatch ~ send(~4.7 ms on this tunnel) + on-device(B)

On-device cost is ~linear in B (docs/TPU_NOTES.md 'Dispatch stage
profile': 8.68 ms at B=4096), so larger B amortizes the send term:
predicted sustained QPS 307k (B=4096) -> ~371k (B=8192). This measures
it; the winner becomes SHINE_BENCH_SUSTAIN_B's default in bench.py.

Env: SHINE_SB_N (200704), SHINE_SB_REPS (5), SHINE_SB_BS
("2048,4096,8192,16384"), SHINE_SB_CPU=1 (interpret smoke).
Appends results/sustained_b_sweep.jsonl.
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

import jax  # noqa: E402

_CPU = os.environ.get("SHINE_SB_CPU") == "1"
if _CPU:
    jax.config.update("jax_platforms", "cpu")

N = int(os.environ.get("SHINE_SB_N", 200_704))
D = int(os.environ.get("SHINE_SB_D", 128))
NQ = int(os.environ.get("SHINE_SB_Q", 10_000))
REPS = int(os.environ.get("SHINE_SB_REPS", 5))
BS = [int(b) for b in os.environ.get(
    "SHINE_SB_BS", "2048,4096,8192,16384").split(",")]
OUT = os.path.join(ROOT, "results", "sustained_b_sweep.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, "reps": REPS,
           "backend": jax.default_backend(), **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.io import Dataset, recall_at_k, synthetic_dataset
    from shine_tpu.models.flat import FastFlatIndex

    cache = os.path.join(ROOT, ".bench_cache", f"ds_{N}x{D}_q{NQ}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        ds = Dataset(z["base"], z["queries"], z["gt"], name="bench-ds")
        print("# dataset loaded from bench cache", flush=True)
    else:
        ds = synthetic_dataset(n=N, dim=D, num_queries=NQ, seed=7, gt_k=10)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, base=ds.base, queries=ds.queries,
                 gt=ds.ground_truth)

    fast = FastFlatIndex(ds.base, interpret=_CPU)
    for b in BS:
        nq_s = max(b, NQ * REPS // b * b)
        qs = np.tile(ds.queries, (REPS, 1))[:nq_s]
        gts = np.tile(ds.ground_truth, (REPS, 1))[:nq_s]
        pre = fast.preload(qs, batch_size=b)

        def run():
            return fast.search(qs, 10, batch_size=b, preloaded=pre,
                               with_dists=False)

        ids, _ = run()  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ids, _ = run()
            best = min(best, time.perf_counter() - t0)
        emit({
            "batch": b, "nq_s": nq_s, "dispatches": nq_s // b,
            "qps": round(nq_s / best, 1),
            "ms_per_dispatch": round(best / (nq_s // b) * 1e3, 2),
            "recall10": round(recall_at_k(ids, gts, 10), 4),
        })
        del pre


if __name__ == "__main__":
    main()
