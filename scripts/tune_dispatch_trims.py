#!/usr/bin/env python
"""End-to-end ablation of the headline dispatch's select/re-rank tail.

The reconciled scan model (docs/TPU_NOTES.md "Dispatch stage profile")
puts the fused 200k dispatch at ~8.7 ms on-device: scan 2.56 /
top_k 2.38 / candidate gather 1.66 / re-rank+sort 2.08 — the tail is
~2.4x the scan, so it binds small-N QPS (round-4 candidate #3). This
measures END-TO-END QPS + recall for each trim candidate on the real
chip, running the SHIPPED program (models/flat.fast_flat_search_at) so
a winner deploys as a search() kwarg (the stage profile showed context
effects — approx_max_k saves 1.74 ms in isolation but 0.2 ms in the
full program — so only end-to-end numbers decide):

  base        shipped program (exact top_k select, f32 gather re-rank)
  approx      approx_sel=True (lax.approx_max_k select)
  kb16        kb=16 (halves select width + gather + re-rank)
  prerank16   prerank=16: bf16 stage-1 from the resident ext table ->
              top 16 -> f32 gather re-rank of 16 (halves the 67 MB
              f32 gather; FastFlatIndex.search(prerank=...))
  ext_only    re-rank entirely from the bf16 ext rows (precision floor
              check — NOT a candidate default, measures the f32 tax)

Env: SHINE_TRIM_N (200704), SHINE_TRIM_B (4096), SHINE_TRIM_NQ (8192).
Appends results/tune_dispatch_trims.jsonl.
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
import jax.numpy as jnp  # noqa: E402

if os.environ.get("SHINE_TRIM_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
INTERPRET = jax.default_backend() == "cpu"

N = int(os.environ.get("SHINE_TRIM_N", 200_704))
D = 128
B = int(os.environ.get("SHINE_TRIM_B", 4096))
NQ = int(os.environ.get("SHINE_TRIM_NQ", 8192))
KB = 32
CLS = 2048
TQ = 512
K = 10
OUT = os.path.join(ROOT, "results", "tune_dispatch_trims.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "B": B, "nq": NQ, "cls": CLS,
           "backend": jax.default_backend(), **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.io import recall_at_k, synthetic_dataset
    from shine_tpu.models.flat import fast_flat_search_at
    from shine_tpu.ops.pallas_scan import pack_ext_table

    ds = synthetic_dataset(n=N, dim=D, num_queries=NQ, seed=11)
    # the shipped kernel scans a bf16 ext table (flat.py:_pack_ext_device);
    # the f32 host packer fed the DMA an f32 source on chip (Mosaic
    # rejects the dtype-mismatched copy — caught by the r3 resume queue)
    ext = jnp.asarray(pack_ext_table(ds.base, 0, N)).astype(jnp.bfloat16)
    vectors = jnp.asarray(ds.base)
    sqnorms = jnp.asarray((ds.base * ds.base).sum(-1).astype(np.float32))
    q_dev = jnp.asarray(ds.queries.astype(np.float32))
    tq = min(TQ, 128) if INTERPRET else TQ
    variants = [
        ("base", dict(kb=KB)),
        ("approx", dict(kb=KB, approx_sel=True)),
        ("kb16", dict(kb=16)),
        ("prerank16", dict(kb=KB, prerank=16)),
        ("ext_only", dict(kb=KB, no_base=True)),
        # v5 fused in-kernel top-kb (ops/pallas_scan3.py:_topk_epilogue):
        # the XLA TopK program + (B, cls) HBM round-trip disappear;
        # bit-identical ids to base (tests/test_pallas.py)
        ("fused", dict(kb=KB, fused_sel=True)),
        ("fused16", dict(kb=16, fused_sel=True)),
        ("fused_keep2", dict(kb=KB, fused_sel=True, keep2=True)),
        # FREE prerank (ops/distance.py:score_trim): the fused kernel's
        # returned scores trim the candidate set before the f32 gather —
        # keep2's 2*kb=64 rows/query shrink to 16/24 at the cost of one
        # (B, 64) sort; the exact-recall row at fused16-class tail cost
        ("fused_keep2_pre16", dict(kb=KB, fused_sel=True, keep2=True,
                                   prerank=16)),
        ("fused_keep2_pre24", dict(kb=KB, fused_sel=True, keep2=True,
                                   prerank=24)),
        ("fused16_pre12", dict(kb=16, fused_sel=True, prerank=12)),
    ]
    for name, kw in variants:
        no_base = kw.pop("no_base", False)
        v, s = (None, None) if no_base else (vectors, sqnorms)

        def run_all():
            parts = [
                fast_flat_search_at(
                    ext, v, s, q_dev, lo, k=K, tq=tq,
                    tn=max(1024, CLS), cls=CLS, metric=0, batch=B,
                    interpret=INTERPRET, n=N, **kw,
                )
                for lo in range(0, NQ, B)
            ]
            ids = jnp.concatenate([p[1] for p in parts], axis=0)
            return np.asarray(ids)  # ONE sync (axon block gotcha)

        ids = run_all()  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            ids = run_all()
            best = min(best, time.time() - t0)
        emit({
            "variant": name, "qps": round(NQ / best, 1),
            "recall10": round(recall_at_k(ids, ds.ground_truth, 10), 4),
            "ms_per_dispatch": round(best / (NQ // B) * 1e3, 2),
        })

    # split-layout twin: the bench split row shares the same tail
    from shine_tpu.models.flat import SplitFlatIndex

    sidx = SplitFlatIndex(ds.base, interpret=INTERPRET)
    pre = sidx.preload(ds.queries, batch_size=B) if hasattr(
        sidx, "preload") else None
    for name, kw in [("split_base", {}), ("split_fused",
                                          dict(fused_sel=True))]:
        skw = dict(kb=KB, batch_size=B, with_dists=False, **kw)
        if pre is not None:
            skw["preloaded"] = pre
        ids, _ = sidx.search(ds.queries, K, **skw)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            ids, _ = sidx.search(ds.queries, K, **skw)
            best = min(best, time.time() - t0)
        emit({
            "variant": name, "qps": round(NQ / best, 1),
            "recall10": round(recall_at_k(ids, ds.ground_truth, 10), 4),
            "ms_per_dispatch": round(best / (NQ // B) * 1e3, 2),
        })


if __name__ == "__main__":
    main()
