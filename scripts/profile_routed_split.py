#!/usr/bin/env python
"""Stage ablation of routed_split_search_at on the real chip: where does
the per-batch wall go? Builds a small clustered index (default 4.2M),
then times jits that stop after successive stages (L=4 back-to-back
dispatches + one sync; marginal = stage minus previous).

Env: SHINE_PRS_N (4_194_304), SHINE_PRS_P/PP/T (32/48/64).
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
C = 2048
p = int(os.environ.get("SHINE_PRS_P", 32))
P = int(os.environ.get("SHINE_PRS_PP", 48))
T = int(os.environ.get("SHINE_PRS_T", 64))
NQ = 2048
L = 4
OUT = os.path.join(ROOT, "results", "profile_routed_split.jsonl")


def emit(rec):
    rec = {"n": N, "p": p, "P": P, "T": T, **rec}
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
    from shine_tpu.models.routed_split import NEG, build_routed_split
    from shine_tpu.ops.distance import pairwise_distance, regen_rerank_topk

    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(17), 4)
    centers = jax.random.normal(k0, (64, D), jnp.float32) * 4.0
    qidx = jax.random.randint(k2, (NQ,), 0, N)
    queries = np.asarray(
        regen_rows(k1, centers, qidx)
        + 0.3 * jax.random.normal(k3, (NQ, D), jnp.float32)
    )
    idx = build_routed_split(
        N, D, row_source=(k1, centers), num_clusters=C, seed=17,
        log=lambda m: print(m, flush=True),
    )
    cap = idx.cap
    B = NQ
    G = B // T
    kk = 80
    q_dev = jnp.asarray(queries)
    cents, comp, aux, gid = idx.centroids, idx.comp, idx.aux, idx.gid

    def stage_core(q, stop):
        scores1 = pairwise_distance(q, cents, 0)
        _, probes_ = jax.lax.top_k(-scores1, p)
        perm = jnp.argsort(probes_[:, 1], stable=True)
        perm = perm[jnp.argsort(probes_[perm, 0], stable=True)]
        inv = jnp.argsort(perm, stable=True)
        q_s = q[perm]
        probes_s = probes_[perm].reshape(G, T, p)
        pos = jnp.broadcast_to(
            jnp.arange(T * p, dtype=jnp.int32).reshape(p, T).T, (G, T, p)
        )
        minpos = jnp.full((G, C), jnp.int32(2 ** 30))
        minpos = minpos.at[jnp.arange(G)[:, None, None], probes_s].min(pos)
        neg, cols = jax.lax.top_k(-minpos, P)
        colmask = neg > -(2 ** 30)
        if stop == "route":
            return cols
        comp3 = comp.reshape(C, cap, comp.shape[1])
        aux3 = aux.reshape(2, C, cap)
        gid2 = gid.reshape(C, cap)
        qf = q_s.reshape(G, T, D)

        def scan_chunk(_, xs):
            cols_c, colmask_c, qf_c = xs
            blk = comp3[cols_c].astype(jnp.bfloat16)
            if stop == "gather":
                return None, jnp.sum(blk.astype(jnp.float32), axis=(1, 2, 3))
            nrm_b = aux3[0][cols_c]
            scl_b = aux3[1][cols_c]
            gid_b = gid2[cols_c]
            dots = jnp.einsum(
                "gtd,gpcd->gtpc", qf_c.astype(jnp.bfloat16), blk,
                preferred_element_type=jnp.float32,
            )
            sc = dots * scl_b[:, None] + nrm_b[:, None]
            valid = (gid_b >= 0) & colmask_c[:, :, None]
            sc = jnp.where(valid[:, None], sc, NEG)
            sc = sc.reshape(cols_c.shape[0], T, P * cap)
            if stop == "score":
                return None, jnp.max(sc, axis=-1)
            gid_f = jnp.broadcast_to(
                gid_b.reshape(-1, 1, P * cap), sc.shape
            )
            _, sel = jax.lax.approx_max_k(sc, kk, recall_target=0.999)
            cand_c = jnp.take_along_axis(gid_f, sel, axis=-1)
            if stop == "topk":
                # keep the transferred output tiny (20 MB/s tunnel)
                return None, jnp.max(cand_c, axis=-1)
            return None, cand_c

        gc = 16
        xs = (
            cols.reshape(G // gc, gc, P),
            colmask.reshape(G // gc, gc, P),
            qf.reshape(G // gc, gc, T, D),
        )
        _, cand = jax.lax.scan(scan_chunk, None, xs)
        if stop != "full":
            return cand
        cand = cand.reshape(B, kk)
        d_out, i_out = regen_rerank_topk(k1, centers, q_s, cand, 10, 0)
        return i_out[inv]

    for stop in ("route", "gather", "score", "topk", "full"):
        fn = jax.jit(partial(stage_core, stop=stop))

        def run(fn=fn):
            out = None
            for i in range(L):
                out = fn(q_dev + jnp.float32(i) * 1e-6)
            return out

        emit({"stage": stop, "ms_per_dispatch": round(t_ms(run), 2)})


if __name__ == "__main__":
    main()
