#!/usr/bin/env python
"""End-to-end ablation of the headline dispatch's select/re-rank tail.

The reconciled scan model (docs/TPU_NOTES.md "Dispatch stage profile")
puts the fused 200k dispatch at ~8.7 ms on-device: scan 2.56 /
top_k 2.38 / candidate gather 1.66 / re-rank+sort 2.08 — the tail is
~2.4x the scan, so it binds small-N QPS (round-4 candidate #3). This
measures END-TO-END QPS + recall for each trim candidate on the real
chip (the stage profile showed context effects — approx_max_k saves
1.74 ms in isolation but 0.2 ms in the full program — so only
end-to-end numbers decide):

  base        shipped program (exact top_k select, f32 gather re-rank)
  approx      approx_sel=True (lax.approx_max_k select)
  kb16        kb=16 (halves select width + gather + re-rank)
  two_stage   bf16 pre-rank from the resident ext table -> top 16 ->
              f32 gather re-rank of 16 (halves the 67 MB f32 gather)
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
from functools import partial

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


@partial(jax.jit, static_argnames=("kb", "k", "pre", "mode"))
def trim_search_at(ext, vectors, sqnorms, q_dev, lo, *, kb, k, pre, mode):
    """The shipped fused program with a swappable re-rank tail."""
    from shine_tpu.ops.distance import (
        DIST_PRECISION,
        rerank_topk,
        rerank_topk_ext,
    )
    from shine_tpu.ops.pallas_scan import pack_ext_query
    from shine_tpu.ops.pallas_scan3 import classmax_scan

    qj = jax.lax.dynamic_slice_in_dim(q_dev, lo, B, 0)
    q_ext = pack_ext_query(qj, ext.shape[1]).astype(jnp.bfloat16)
    if INTERPRET:
        # XLA class-max emulation (row class = row % cls, earliest-row
        # ties — the kernel's strict-> semantics) for the CPU smoke run
        dots = jnp.einsum(
            "bd,nd->bn", q_ext, ext, preferred_element_type=jnp.float32
        )
        dd = dots.reshape(B, ext.shape[0] // CLS, CLS)
        m1 = dd.max(axis=1)
        a1 = dd.argmax(axis=1).astype(jnp.int32) * CLS + jnp.arange(
            CLS, dtype=jnp.int32
        )
    else:
        m1, a1 = classmax_scan(
            ext, q_ext, tq=TQ, tn=max(1024, CLS), cls=CLS
        )
    kb_eff = min(kb, m1.shape[1])
    if mode == "approx":
        _, sel = jax.lax.approx_max_k(m1, kb_eff, recall_target=0.99)
    else:
        _, sel = jax.lax.top_k(m1, kb_eff)
    cand = jnp.take_along_axis(a1, sel, axis=1)
    cand = jnp.where(cand < N, cand, -1)
    if mode == "two_stage":
        # stage 1: bf16 scores straight from the resident ext rows (the
        # scan input — no second table); shrink kb -> pre candidates
        safe = jnp.maximum(cand, 0)
        rows = ext[safe]  # (B, kb, dp) bf16
        scores = jnp.einsum(
            "bd,bkd->bk", q_ext, rows, preferred_element_type=jnp.float32
        )
        sd = jnp.where(cand >= 0, -scores, jnp.inf)  # ext packs score
        key_i = jnp.where(cand < 0, jnp.int32(2**31 - 1), cand)
        _, _, cand = jax.lax.sort((sd, key_i, cand), dimension=-1,
                                  num_keys=2)
        cand = cand[:, :pre]
    if mode == "ext_only":
        return rerank_topk_ext(ext, qj, cand, k)
    return rerank_topk(vectors, sqnorms, qj, cand, k)


def main() -> None:
    from shine_tpu.io import recall_at_k, synthetic_dataset
    from shine_tpu.ops.pallas_scan import pack_ext_table

    ds = synthetic_dataset(n=N, dim=D, num_queries=NQ, seed=11)
    ext = jnp.asarray(pack_ext_table(ds.base, 0, N))
    vectors = jnp.asarray(ds.base)
    sqnorms = jnp.asarray((ds.base * ds.base).sum(-1).astype(np.float32))
    q_dev = jnp.asarray(ds.queries.astype(np.float32))
    variants = [
        ("base", dict(kb=KB, pre=0, mode="plain")),
        ("approx", dict(kb=KB, pre=0, mode="approx")),
        ("kb16", dict(kb=16, pre=0, mode="plain")),
        ("two_stage", dict(kb=KB, pre=16, mode="two_stage")),
        ("ext_only", dict(kb=KB, pre=0, mode="ext_only")),
    ]
    for name, kw in variants:
        def run_all():
            parts = [
                trim_search_at(ext, vectors, sqnorms, q_dev, lo, k=K, **kw)
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


if __name__ == "__main__":
    main()
