#!/usr/bin/env python
"""Stage-ablation profile of the fused fastflat dispatch (r3).

docs/TPU_NOTES.md "Scan perf model reconciled" decomposes the affine
T0 ~ 34 ms into tunnel sync + ~5-10 ms on-device select/re-rank; at the
200k headline that on-device term is ~5x the scan itself, so it binds
QPS. This measures WHERE it goes by compiling truncated variants of the
fused program (models/flat.py:fast_flat_search_at stages):

  null          dynamic-slice the queries, return a (B,) checksum
  scan          + classmax scan (m1 row-max only)
  select        + top_k / approx_max_k over (B, cls)
  gather        + take_along_axis + f32 candidate-row gather
  full          + re-rank einsum + 3-key sort (the shipped program)

Each stage is timed as L back-to-back dispatches + ONE np.asarray sync
(the headline's regime, flat.py:900-907), best-of-R; per-dispatch cost =
(wall - null_wall) / L. Appends results/profile_dispatch.jsonl.

Env: SHINE_PROF_N (200704), SHINE_PROF_CLS (2048), SHINE_PROF_KB (64),
SHINE_PROF_L (8 dispatches per timing).
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

if os.environ.get("SHINE_PROF_CPU") == "1":  # CPU smoke (interpret kernels)
    jax.config.update("jax_platforms", "cpu")
INTERPRET = jax.default_backend() == "cpu"

N = int(os.environ.get("SHINE_PROF_N", 200_704))
D = int(os.environ.get("SHINE_PROF_D", 128))
CLS = int(os.environ.get("SHINE_PROF_CLS", 2048))
KB = int(os.environ.get("SHINE_PROF_KB", 32))  # headline auto-kb at d=128
L = int(os.environ.get("SHINE_PROF_L", 8))
B = int(os.environ.get("SHINE_PROF_B", 4096))  # bench SHINE_BENCH_BATCH
TQ = int(os.environ.get("SHINE_PROF_TQ", 512))  # headline search() default
K = 10
OUT = os.path.join(ROOT, "results", "profile_dispatch.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "cls": CLS, "kb": KB, "L": L,
           "backend": jax.default_backend(), **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def stage_fn(stage: str, approx: bool):
    """A fused program truncated after `stage`; returns a small array so
    the sync transfer is negligible."""
    from shine_tpu.models.flat import _select_kb
    from shine_tpu.ops.distance import rerank_topk
    from shine_tpu.ops.pallas_scan import pack_ext_query
    from shine_tpu.ops.pallas_scan3 import classmax_scan

    @partial(jax.jit, static_argnames=("stage",))
    def run(ext, vectors, sqnorms, q_dev, lo, *, stage):
        qj = jax.lax.dynamic_slice_in_dim(q_dev, lo, B, 0)
        if stage == "null":
            return jnp.sum(qj, axis=1)
        q_ext = pack_ext_query(qj, ext.shape[1]).astype(jnp.bfloat16)
        m1, a1 = classmax_scan(
            ext, q_ext, tq=TQ, tn=max(1024, CLS), cls=CLS,
            interpret=INTERPRET,
        )
        if stage == "scan":
            return jnp.max(m1, axis=1)
        _, sel = _select_kb(m1, KB, approx)
        if stage == "select":
            return jnp.sum(sel, axis=1)
        cand = jnp.take_along_axis(a1, sel, axis=1)
        cand = jnp.where(cand < N, cand, -1)
        if stage == "gather":
            cv = vectors[jnp.maximum(cand, 0)]
            return jnp.sum(cv, axis=(1, 2))
        d, ids = rerank_topk(vectors, sqnorms, qj, cand, K)
        return jnp.sum(ids, axis=1) + d[:, 0]

    return lambda *a: run(*a, stage=stage)


def main() -> None:
    rng = np.random.default_rng(5)
    base = rng.standard_normal((N, D), dtype=np.float32)
    q = rng.standard_normal((B, D), dtype=np.float32)

    from shine_tpu.models.flat import FastFlatIndex

    idx = FastFlatIndex(base, shuffle=False)
    ext, vectors, sqnorms = idx.ext, idx.vectors, idx.sqnorms
    q_dev = jnp.asarray(q)
    np.asarray(jnp.sum(ext[:1]))  # settle uploads

    stages = [
        ("null", False), ("scan", False), ("select", False),
        ("select-approx", True), ("gather", False), ("full", False),
        ("full-approx", True),
    ]
    walls = {}
    for name, approx in stages:
        fn = stage_fn(name.split("-")[0], approx)
        outs = [fn(ext, vectors, sqnorms, q_dev, 0)]
        np.asarray(outs[0])  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [
                fn(ext, vectors, sqnorms, q_dev, 0) for _ in range(L)
            ]
            s = sum(float(np.asarray(o)[0]) for o in outs[-1:])
            best = min(best, time.time() - t0)
            del s
        walls[name] = best
        per = (best - walls.get("null", best)) / L * 1e3
        emit({"stage": name, "wall_s": round(best, 4),
              "per_dispatch_ms": round(per, 3) if name != "null" else
              round(best / L * 1e3, 3)})

    # marginal stage costs (each minus the previous exact stage)
    chain = ["null", "scan", "select", "gather", "full"]
    for prev, cur in zip(chain, chain[1:]):
        emit({"stage": f"marginal:{cur}",
              "per_dispatch_ms": round(
                  (walls[cur] - walls[prev]) / L * 1e3, 3)})
    emit({"stage": "marginal:select-approx-vs-exact",
          "per_dispatch_ms": round(
              (walls["select-approx"] - walls["select"]) / L * 1e3, 3)})
    emit({"stage": "marginal:full-approx-vs-exact",
          "per_dispatch_ms": round(
              (walls["full-approx"] - walls["full"]) / L * 1e3, 3)})


if __name__ == "__main__":
    main()
