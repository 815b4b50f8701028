#!/usr/bin/env python
"""Stage profile of the MEGA dispatch (r4): where does the lax.map
program spend its device time?

The r3 dispatch profile (scripts/profile_dispatch.py) predicted a ~470k
QPS ceiling at 200k from stage marginals measured on the PER-BATCH
program with kb=32. The shipped mega row (fused_sel kb=16) should sit
far above that — the select is in-kernel and the gather/re-rank tail
halves with kb — yet it measures 384k (BENCH_r03). This decomposes the
actual mega program: truncated lax.map bodies, ONE dispatch, ONE sync.

  null      lax.map over L slabs, per-slab checksum (map + slice cost)
  scan      + classmax_scan (m1 only, select on host path ELIDED)
  fscan     + classmax_topk_scan kb=KB (fused in-kernel select)
  full      the shipped fused mega program (fast_flat_search body)
  keep2pre  keep2 fused + prerank=16 variant (candidate for the bench)

Appends results/profile_mega.jsonl. Env: SHINE_PROF_N/_B/_L/_KB/_CLS/_TQ.
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

if os.environ.get("SHINE_PROF_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
INTERPRET = jax.default_backend() == "cpu"

N = int(os.environ.get("SHINE_PROF_N", 200_704))
D = int(os.environ.get("SHINE_PROF_D", 128))
CLS = int(os.environ.get("SHINE_PROF_CLS", 2048))
KB = int(os.environ.get("SHINE_PROF_KB", 16))
L = int(os.environ.get("SHINE_PROF_L", 12))
B = int(os.environ.get("SHINE_PROF_B", 4096))
TQ = int(os.environ.get("SHINE_PROF_TQ", 512))
K = 10
OUT = os.path.join(ROOT, "results", "profile_mega.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "cls": CLS, "kb": KB, "L": L, "B": B,
           "tq": TQ, "backend": jax.default_backend(), **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def mega_fn(stage: str, *, kb=None, keep2=False, prerank=0):
    from shine_tpu.models.flat import fast_flat_search
    from shine_tpu.ops.pallas_scan import pack_ext_query
    from shine_tpu.ops.pallas_scan3 import classmax_scan, classmax_topk_scan

    kb = KB if kb is None else kb

    @partial(jax.jit, static_argnames=("stage",))
    def run(ext, vectors, sqnorms, qs, *, stage):
        def body(qj):
            if stage == "null":
                return jnp.sum(qj, axis=1)
            q_ext = pack_ext_query(qj, ext.shape[1]).astype(jnp.bfloat16)
            if stage == "scan":
                m1, a1 = classmax_scan(
                    ext, q_ext, tq=TQ, tn=max(1024, CLS), cls=CLS,
                    interpret=INTERPRET,
                )
                return jnp.max(m1, axis=1) + a1[:, 0]
            if stage == "fscan":
                vals, cand = classmax_topk_scan(
                    ext, q_ext, kb=kb, tq=TQ, tn=max(1024, CLS), cls=CLS
                )
                return jnp.max(vals, axis=1) + cand[:, 0]
            d, ids = fast_flat_search(
                ext, vectors, sqnorms, q_ext, qj, k=K, kb=kb, tq=TQ,
                tn=max(1024, CLS), cls=CLS, metric="l2",
                interpret=INTERPRET, keep2=keep2, n=0, row_source=None,
                approx_sel=False, prerank=prerank, fused_sel=True,
            )
            return jnp.sum(ids, axis=1) + d[:, 0]

        return jax.lax.map(body, qs)

    return lambda *a: run(*a, stage=stage)


def main() -> None:
    rng = np.random.default_rng(5)
    base = rng.standard_normal((N, D), dtype=np.float32)
    q = rng.standard_normal((L * B, D), dtype=np.float32)

    from shine_tpu.models.flat import FastFlatIndex

    idx = FastFlatIndex(base, shuffle=False)
    ext, vectors, sqnorms = idx.ext, idx.vectors, idx.sqnorms
    qs = jnp.asarray(q).reshape(L, B, D)
    np.asarray(jnp.sum(ext[:1]))  # settle uploads

    variants = [
        ("null", {}),
        ("scan", {}),
        ("fscan", {}),
        ("full", {}),
        ("full-kb32", {"kb": 32}),
        ("full-keep2", {"keep2": True}),
        ("full-keep2-pre16", {"keep2": True, "prerank": 16}),
        ("full-kb32-pre16", {"kb": 32, "prerank": 16}),
    ]
    walls = {}
    for name, kw in variants:
        fn = mega_fn(name.split("-")[0] if name in
                     ("null", "scan", "fscan") else "full", **kw)
        out = fn(ext, vectors, sqnorms, qs)
        np.asarray(out[0, 0])  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = fn(ext, vectors, sqnorms, qs)
            _ = float(np.asarray(out[0, 0]))
            best = min(best, time.time() - t0)
        walls[name] = best
        nq = L * B
        emit({
            "stage": name, "wall_s": round(best, 4),
            "ms_per_slab": round(best / L * 1e3, 3),
            "us_per_query": round(best / nq * 1e6, 3),
            "implied_qps": round(nq / best, 1),
        })

    for prev, cur in [("null", "scan"), ("null", "fscan"),
                      ("fscan", "full")]:
        emit({"stage": f"marginal:{cur}-minus-{prev}",
              "ms_per_slab": round((walls[cur] - walls[prev]) / L * 1e3,
                                   3)})

    # scan-tiling grid inside the mega program (SHINE_PROF_GRID=1): the
    # B=4096 scan runs ~96 TF/s at tq=512/tn=2048 — roughly half the
    # measured marginal kernel rate; if a tiling recovers it, the full
    # program ceiling moves from ~1.0M toward ~1.3M QPS/chip
    if os.environ.get("SHINE_PROF_GRID") == "1":
        from shine_tpu.ops.pallas_scan import pack_ext_query
        from shine_tpu.ops.pallas_scan3 import classmax_topk_scan

        # tq is the table-restream divisor: each grid step streams the
        # WHOLE ext table, so a slab pays (B/tq) x table bytes of HBM
        # (8 x 102 MB at tq=512/N=200k ~ 1.0 ms of the 2.19 ms scan
        # marginal). tq=4096 = one stream; VMEM at kb<=16 keep1 is
        # sm+sr (tq, cls) f32 = 64 MB + buffers, inside the 100 MB cap.
        for tq_g in (256, 512, 1024, 2048, 4096):
            for tn_g in (2048, 4096, 8192):
                if N % tn_g or B % tq_g:
                    continue

                @partial(jax.jit, static_argnames=("tq_", "tn_"))
                def run_g(ext, qs, *, tq_, tn_):
                    def body(qj):
                        q_ext = pack_ext_query(
                            qj, ext.shape[1]
                        ).astype(jnp.bfloat16)
                        vals, cand = classmax_topk_scan(
                            ext, q_ext, kb=KB, tq=tq_, tn=tn_, cls=CLS
                        )
                        return jnp.max(vals, axis=1) + cand[:, 0]

                    return jax.lax.map(body, qs)

                try:
                    out = run_g(ext, qs, tq_=tq_g, tn_=tn_g)
                    np.asarray(out[0, 0])
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.time()
                        out = run_g(ext, qs, tq_=tq_g, tn_=tn_g)
                        _ = float(np.asarray(out[0, 0]))
                        best = min(best, time.time() - t0)
                    flops = 2.0 * L * B * N * D
                    emit({"stage": f"grid:fscan tq={tq_g} tn={tn_g}",
                          "ms_per_slab": round(best / L * 1e3, 3),
                          "tflops": round(flops / best / 1e12, 1)})
                except Exception as e:
                    emit({"stage": f"grid:fscan tq={tq_g} tn={tn_g}",
                          "error": repr(e)[:200]})


if __name__ == "__main__":
    main()
