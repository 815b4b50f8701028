#!/usr/bin/env python
"""Stage ablation of the routed split dispatch on the real chip: where
does the per-batch wall go? Builds a small clustered index (default
4.2M), then times jits that stop after successive stages (L=4
back-to-back dispatches + one sync; marginal = stage minus previous).

Stages: route (stage-1 distances + affinity sort + sort-based column
grant), scan (routed class-max Pallas kernel), select (top-kk over the
class lanes + gid mapping), full (+ exact regen re-rank).

Env: SHINE_PRS_N (4_194_304), SHINE_PRS_P/PP/T (32/48/64),
SHINE_PRS_CAP/CLS (4096/1024).
Appends results/profile_routed_split.jsonl.
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

N = int(os.environ.get("SHINE_PRS_N", 4_194_304))
D = 128
CAP = int(os.environ.get("SHINE_PRS_CAP", 4096))
CLS = int(os.environ.get("SHINE_PRS_CLS", 1024))
p = int(os.environ.get("SHINE_PRS_P", 32))
P = int(os.environ.get("SHINE_PRS_PP", 48))
T = int(os.environ.get("SHINE_PRS_T", 64))
NQ = 2048
L = 4
OUT = os.path.join(ROOT, "results", "profile_routed_split.jsonl")


def emit(rec):
    rec = {"n": N, "p": p, "P": P, "T": T, "cap": CAP, "cls": CLS, **rec}
    print("#", json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def t_ms(fn, reps=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / L


def main():
    import jax
    import jax.numpy as jnp

    from shine_tpu.io.device_synth import regen_rows
    from shine_tpu.models.routed_split import (
        NEG,
        _route_cols,
        build_routed_split,
    )
    from shine_tpu.ops.distance import pairwise_distance, regen_rerank_topk
    from shine_tpu.ops.pallas_scan_routed import routed_classmax_scan

    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(17), 4)
    centers = jax.random.normal(k0, (64, D), jnp.float32) * 4.0
    qidx = jax.random.randint(k2, (NQ,), 0, N)
    queries = np.asarray(
        regen_rows(k1, centers, qidx)
        + 0.3 * jax.random.normal(k3, (NQ, D), jnp.float32)
    )
    idx = build_routed_split(
        N, D, row_source=(k1, centers), cap_target=CAP, cls=CLS, seed=17,
        log=lambda m: print(m, flush=True),
    )
    cap, cls, C = idx.cap, idx.cls, idx.C
    B = NQ
    G = B // T
    kk = 80
    q_dev = jnp.asarray(queries)

    # tables are explicit jit ARGUMENTS: captured big constants get baked
    # into the remote-compile request body (HTTP 413 at 537 MB, measured)
    def stage_core(q, comp, aux_r, gid, cents, stop):
        scores1 = pairwise_distance(q, cents, 0)
        if C >= 4096:
            _, probes_ = jax.lax.approx_max_k(
                -scores1, p, recall_target=0.999)
        else:
            _, probes_ = jax.lax.top_k(-scores1, p)
        perm = jnp.argsort(probes_[:, 1], stable=True)
        perm = perm[jnp.argsort(probes_[perm, 0], stable=True)]
        inv = jnp.argsort(perm, stable=True)
        q_s = q[perm]
        cols, coverage, _ = _route_cols(probes_[perm].reshape(G, T, p), C, P)
        if stop == "route":
            return cols
        dpc = comp.shape[1]
        qpad = jnp.zeros((B, dpc), jnp.float32)
        qpad = qpad.at[:, :D].set(q_s).astype(jnp.bfloat16)
        best, code = routed_classmax_scan(
            comp, aux_r, qpad, cols, T=T, cap=cap, cls=cls)
        if stop == "scan":
            return jnp.max(best, axis=-1)  # tiny transfer
        bestk, sel = jax.lax.top_k(best, kk)
        lrow = jnp.take_along_axis(code, sel, axis=1)
        g_of_q = jnp.arange(B, dtype=jnp.int32) // T
        trow = cols[g_of_q[:, None], lrow // cap] * cap + lrow % cap
        cand = jnp.where(bestk > NEG / 2, gid[trow], -1)
        if stop == "select":
            return jnp.max(cand, axis=-1)
        d_out, i_out = regen_rerank_topk(k1, centers, q_s, cand, 10, 0)
        return i_out[inv]

    comp, aux_r, gid, cents = idx.comp, idx.aux_r, idx.gid, idx.centroids
    for stop in ("route", "scan", "select", "full"):
        fn = jax.jit(partial(stage_core, stop=stop))

        def run(fn=fn):
            out = None
            for i in range(L):
                out = fn(q_dev + jnp.float32(i) * 1e-6, comp, aux_r, gid,
                         cents)
            return out

        emit({"stage": stop, "ms_per_dispatch": round(t_ms(run), 2)})


if __name__ == "__main__":
    main()
