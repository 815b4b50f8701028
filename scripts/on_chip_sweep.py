#!/usr/bin/env python
"""One-shot on-chip perf sweep (run when the TPU tunnel is up).

Covers, in order of importance:
  1. flat scan grid (batch x chunk x bf16/approx)  -> headline QPS
  2. IVF probes grid                               -> QPS vs recall
  3. HNSW frontier sweep (E in 4..32)              -> graph-path QPS
  4. pallas gather kernel vs XLA gather            -> validates the DMA path
  5. device-build round throughput                 -> build-time metric

All timings force host transfer (docs/TPU_NOTES.md). Writes findings to
stdout; append to docs/TPU_NOTES.md afterwards.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from shine_tpu.config import HNSWParams, SearchParams  # noqa: E402
from shine_tpu.io import (  # noqa: E402
    index_path,
    load_graph,
    recall_at_k,
    save_graph,
    synthetic_dataset,
)
from shine_tpu.models import HNSWIndex  # noqa: E402
from shine_tpu.models.flat import FlatIndex, flat_search  # noqa: E402
from shine_tpu.models.ivf import IVFIndex  # noqa: E402


def timed(fn, reps=3):
    out = fn()
    out = jax.tree.map(np.asarray, out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        out = jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main() -> None:
    n = int(os.environ.get("N", 200_000))
    d = int(os.environ.get("D", 128))
    print(f"== devices: {jax.devices()}", flush=True)
    ds = synthetic_dataset(n=n, dim=d, num_queries=4096, seed=7, gt_k=10)
    gt = ds.ground_truth

    print("== 1. flat grid", flush=True)
    flat = FlatIndex(ds.base)
    best_flat = (0.0, None)
    for batch in (2048, 4096):
        for chunk in (65536, 131072):
            for bf16, approx in ((True, False), (True, True), (False, False)):
                q = jnp.asarray(ds.queries[:batch].astype(np.float32))
                t, (dd, ii) = timed(
                    lambda: flat_search(
                        flat.data, q, k=10,
                        chunk=min(chunk, flat.data.vectors.shape[0]),
                        metric=flat.metric, use_bf16=bf16, approx=approx,
                    )
                )
                r = recall_at_k(ii, gt[:batch], 10)
                qps = batch / t
                print(
                    f"flat b={batch} c={chunk} bf16={int(bf16)} ax={int(approx)}: "
                    f"{t*1e3:.1f}ms QPS={qps:.0f} r={r:.4f}", flush=True,
                )
                if r >= 0.95 and qps > best_flat[0]:
                    best_flat = (qps, (batch, chunk, bf16, approx))
    print(f"best flat: {best_flat}", flush=True)

    print("== 2. ivf probes", flush=True)
    ivf = IVFIndex(ds.base, seed=7)
    for p in (4, 8, 16):
        t, (ii, dd) = timed(lambda p=p: ivf.search(ds.queries[:2048], 10, probes=p))
        r = recall_at_k(ii, gt[:2048], 10)
        print(f"ivf p={p}: {t*1e3:.1f}ms QPS={2048/t:.0f} r={r:.4f}", flush=True)

    print("== 3. hnsw frontier sweep", flush=True)
    params = HNSWParams(M=16, ef_construction=200)
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache"
    )
    ckpt = index_path(cache_dir, ds.name, params)
    if os.path.exists(ckpt):
        graph = load_graph(ckpt)
    else:
        from shine_tpu.graph import build_graph

        graph = build_graph(ds.base, params)
        save_graph(graph, ckpt)
    idx = HNSWIndex(graph)
    for E in (4, 8, 16, 32):
        for ef in (64, 96):
            sp = SearchParams(k=10, ef=ef, frontier=E)
            t, (ii, dd) = timed(
                lambda sp=sp: idx.search(ds.queries[:2048], sp, batch_size=2048)
            )
            r = recall_at_k(ii, gt[:2048], 10)
            print(
                f"hnsw E={E} ef={ef}: {t*1e3:.1f}ms QPS={2048/t:.0f} r={r:.4f}",
                flush=True,
            )
    # pallas gather variant
    for E in (8, 16):
        sp = SearchParams(k=10, ef=64, frontier=E, pallas_gather=True)
        try:
            t, (ii, dd) = timed(
                lambda sp=sp: idx.search(ds.queries[:2048], sp, batch_size=2048)
            )
            r = recall_at_k(ii, gt[:2048], 10)
            print(
                f"hnsw+pallas E={E}: {t*1e3:.1f}ms QPS={2048/t:.0f} r={r:.4f}",
                flush=True,
            )
        except Exception as e:
            print(f"hnsw+pallas E={E} failed: {e!r}", flush=True)

    print("== 4. pallas gather vs xla gather", flush=True)
    from shine_tpu.ops.pallas_gather import gather_rows_pallas

    table = jnp.asarray(ds.base)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, n, size=262144).astype(np.int32)
    )
    try:
        t, _ = timed(lambda: gather_rows_pallas(table, ids))
        print(f"pallas gather 262k rows: {t*1e3:.2f}ms "
              f"({262144*d*4/t/1e9:.0f} GB/s)", flush=True)
    except Exception as e:
        print(f"pallas gather failed: {e!r}", flush=True)
    g = jax.jit(lambda tb, ix: tb[ix])
    t, _ = timed(lambda: g(table, ids))
    print(f"xla gather 262k rows: {t*1e3:.2f}ms "
          f"({262144*d*4/t/1e9:.0f} GB/s)", flush=True)

    print("== 5. device build round", flush=True)
    from shine_tpu.models.build import init_build_state, insert_round

    st = init_build_state(ds.base[:50_000], HNSWParams(M=16, ef_construction=100))
    ids_b = jnp.arange(1, 513, dtype=jnp.int32)
    t, st2 = timed(
        lambda: insert_round(
            st, ids_b, ef=100, frontier=4, max_add=32, metric=0, B_up=64
        ),
        reps=2,
    )
    print(f"insert_round B=512: {t*1e3:.1f}ms -> {512/t:.0f} inserts/s", flush=True)


if __name__ == "__main__":
    main()
