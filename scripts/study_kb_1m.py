#!/usr/bin/env python
"""CPU study: why does fastflat id-recall sit at 0.93 at 1M x 128, and
which knob (kb / keep2 / cls) lifts it?

The r4b stage-C margin measurement (results/scale_1m_hnsw.jsonl:
margin_frac 0.9854 but recall10_margin 0.9297 ~= raw 0.9296) proves the
1M x 128 misses are NOT 1e-4-scale ties — they are real drops at
bf16-precision-scale gaps (rel err ~2^-8 = 4e-3 >> the 1e-4 margin
rtol). The scan's candidate set is the top-kb classes by bf16 class-max
score (ops/pallas_scan3.py); a true top-10 row is dropped when its bf16
score ranks below the kb-th class, or a same-class decoy beats it
(keep1). This script simulates that selection EXACTLY in numpy —
bf16-rounded q/v dot with f32 accumulation, exact norm column
(residual-encoded in the real ext table), random class layout
(row % cls after shuffle == reshape), per-class top-2, top-kb classes,
exact f32 re-rank — on the same MoG generator/seed the chip run used,
and sweeps kb x keep x cls to predict the recall ladder before spending
chip time on it.

Reference analogue: the reference tunes ef per dataset to hit its 0.95
operating point (scripts/datasets.py:13-20); kb is the scan family's ef.

Run: python scripts/study_kb_1m.py  (CPU-only, ~10 min on this host)
Results: results/study_kb_1m.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N = int(os.environ.get("SHINE_STUDY_N", 1_048_576))
D = int(os.environ.get("SHINE_STUDY_D", 128))
NQ = int(os.environ.get("SHINE_STUDY_Q", 256))
SEED = 23
OUT = os.path.join(ROOT, "results", "study_kb_1m.jsonl")


def emit(rec: dict) -> None:
    rec = {"n": N, "d": D, "nq": NQ, **rec}
    print("#", json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import ml_dtypes

    from shine_tpu.io.device_synth import device_synthetic_dataset
    from shine_tpu.io.recall import recall_at_k

    t0 = time.time()
    ds = device_synthetic_dataset(
        n=N, dim=D, num_queries=NQ, seed=SEED, gt_k=11
    )
    base = np.asarray(ds.base_dev)
    queries = np.asarray(ds.queries, np.float32)
    gt = np.asarray(ds.ground_truth)
    emit({"stage": "gen+gt", "seconds": round(time.time() - t0, 1)})

    # exact f32 distances (re-rank oracle + margin diagnostics)
    t0 = time.time()
    bn = (base.astype(np.float32) ** 2).sum(axis=1)
    d_exact = np.empty((NQ, N), np.float32)
    chunk = 131072
    for lo in range(0, N, chunk):
        hi = min(lo + chunk, N)
        d_exact[:, lo:hi] = (
            -2.0 * (queries @ base[lo:hi].astype(np.float32).T) + bn[lo:hi]
        )
    emit({"stage": "exact-dists", "seconds": round(time.time() - t0, 1)})

    # bf16-simulated scan score: bf16(q) . bf16(v) with f32 accumulation
    # (MXU semantics), exact norm column (the residual-encoded norm makes
    # the norm term ~f32 — r2: recall 0.992 -> 0.995 at 200k)
    t0 = time.time()
    q16 = queries.astype(ml_dtypes.bfloat16).astype(np.float32)
    d_est = np.empty((NQ, N), np.float32)
    for lo in range(0, N, chunk):
        hi = min(lo + chunk, N)
        b16 = base[lo:hi].astype(ml_dtypes.bfloat16).astype(np.float32)
        d_est[:, lo:hi] = -2.0 * (q16 @ b16.T) + bn[lo:hi]
    emit({"stage": "bf16-dists", "seconds": round(time.time() - t0, 1)})

    # GT cross-check: ds.ground_truth comes from flat_search (the same
    # jitted path the chip scripts use, models/flat.py:flat_search,
    # use_bf16=True + f32 re-rank of rerank*k survivors). Compare with
    # the exact numpy top-10 under (dist, id) ordering — disagreement
    # here means the GT pipeline itself drops true neighbors.
    t0 = time.time()
    agree = 0
    exact10 = np.empty((NQ, 10), np.int64)
    for qi in range(NQ):
        part = np.argpartition(d_exact[qi], 32)[:33]
        order = np.lexsort((part, d_exact[qi][part]))
        exact10[qi] = part[order][:10]
        agree += len(np.intersect1d(exact10[qi], gt[qi, :10]))
    emit({
        "stage": "gt-crosscheck", "seconds": round(time.time() - t0, 1),
        "gt_vs_exact_overlap": round(agree / (NQ * 10), 4),
    })
    gt10_exact = exact10

    # diagnostics: bf16 rank of true top-10 rows (class-free ceiling)
    t0 = time.time()
    gt10 = gt[:, :10]
    est_rank_hist = np.zeros(6, np.int64)  # <=32, <=64, <=128, <=256, <=1024, >1024
    edges = [32, 64, 128, 256, 1024]
    for qi in range(NQ):
        thr = d_est[qi, gt10[qi]]  # est dists of true neighbors
        ranks = (d_est[qi][None, :] < thr[:, None]).sum(axis=1)
        for j, e in enumerate(edges):
            est_rank_hist[j] += int((ranks < e).sum())
        est_rank_hist[5] += int((ranks >= edges[-1]).sum())
    tot = NQ * 10
    emit({
        "stage": "bf16-rank-ceiling",
        "seconds": round(time.time() - t0, 1),
        **{f"frac_rank_lt_{e}": round(est_rank_hist[j] / tot, 4)
           for j, e in enumerate(edges)},
        "frac_rank_ge_1024": round(est_rank_hist[5] / tot, 4),
    })

    # full selection simulation: shuffled layout -> class = idx % cls
    # == reshape(members, cls); per-class top-2; top-kb classes by class
    # max; exact re-rank of the kept rows; recall@10 vs exact GT
    rng = np.random.default_rng(7)
    perm = rng.permutation(N)
    score = -d_est[:, perm]  # larger = better, kernel keeps max score
    exact_p = d_exact[:, perm]
    gt_set = gt10

    for cls in (1024, 2048):
        members = N // cls
        sc = score.reshape(NQ, members, cls)
        t0 = time.time()
        # top-2 per class along members axis
        top2 = np.argpartition(-sc, 1, axis=1)[:, :2, :]  # (NQ, 2, cls)
        v_top = np.take_along_axis(sc, top2, axis=1)
        # order so slot 0 is the max
        swap = v_top[:, 0, :] < v_top[:, 1, :]
        t2 = top2.copy()
        t2[:, 0, :][swap] = top2[:, 1, :][swap]
        t2[:, 1, :][swap] = top2[:, 0, :][swap]
        v0 = np.take_along_axis(sc, t2[:, :1, :], axis=1)[:, 0, :]  # class max
        prep_s = round(time.time() - t0, 1)
        for kb in (16, 32, 64, 128, 256):
            classes_kb = np.argpartition(-v0, kb - 1, axis=1)[:, :kb]
            for keep in (1, 2):
                hits = 0
                hits_ex = 0
                for qi in range(NQ):
                    cl = classes_kb[qi]
                    # t2[qi][:keep][:, cl]: (keep, kb) member indices
                    rows = (t2[qi][:keep][:, cl] * cls + cl[None, :])
                    rows = rows.reshape(-1)
                    dd = exact_p[qi, rows]
                    order = np.argsort(dd, kind="stable")[:10]
                    found = perm[rows[order]]
                    hits += len(np.intersect1d(found, gt_set[qi]))
                    hits_ex += len(np.intersect1d(found, gt10_exact[qi]))
                emit({
                    "stage": "sim", "cls": cls, "kb": kb, "keep": keep,
                    "recall10": round(hits / (NQ * 10), 4),
                    "recall10_vs_exact": round(hits_ex / (NQ * 10), 4),
                    "prep_seconds": prep_s,
                })
                prep_s = 0.0


if __name__ == "__main__":
    main()
