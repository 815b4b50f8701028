#!/usr/bin/env python
"""VERDICT #3: validate (or retire) the Pallas HNSW row gather on chip.

Measures, on the real TPU:
  1. microbench: gather_rows_pallas_flat vs XLA take() on the lane-padded
     ext table (the traversal's hot fetch, reference hnsw.hh:440-467);
  2. end-to-end HNSW QPS/recall at 200k x 128 with and without
     SearchParams(pallas_gather=True), ef in {64, 96}.

Timing via np.asarray(result) — block_until_ready does not block on the
axon backend (docs/TPU_NOTES.md).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t_ms(fn, reps=3):
    np.asarray(fn())  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def microbench(n=200_000, dp=1024, R=32_768):
    from shine_tpu.ops.pallas_gather import gather_rows_pallas_flat

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((n, dp), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, n, R).astype(np.int32))
    np.asarray(table[:1])

    ms_xla = t_ms(lambda: jnp.take(table, ids, axis=0)[:8])
    ms_pal = t_ms(lambda: gather_rows_pallas_flat(table, ids)[:8])
    bytes_moved = R * dp * 4
    print(f"# gather micro: R={R} dp={dp}")
    print(f"#   xla take : {ms_xla:8.2f} ms  ({bytes_moved/ms_xla/1e6:.1f} GB/s)")
    print(f"#   pallas   : {ms_pal:8.2f} ms  ({bytes_moved/ms_pal/1e6:.1f} GB/s)")
    return ms_xla, ms_pal


def end_to_end():
    from shine_tpu.config import HNSWParams, SearchParams
    from shine_tpu.io import Dataset, recall_at_k
    from shine_tpu.io.checkpoint import index_path, load_graph
    from shine_tpu.models import HNSWIndex

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
    z = np.load(os.path.join(cache_dir, "ds_200000x128_q10000.npz"))
    ds = Dataset(z["base"], z["queries"], z["gt"], name="synth-200000x128")
    params = HNSWParams(M=16, ef_construction=200)
    graph = load_graph(index_path(cache_dir, ds.name, params))

    # batch 512: the scalar-prefetched id array (B*E*2M i32) must fit the
    # 1 MB SMEM — batch 4096 needs 4 MB and fails to compile
    for pallas in (False, True):
        idx = HNSWIndex(graph, pallas=pallas)
        for ef in (64, 96):
            sp = SearchParams(k=10, ef=ef, frontier=8, pallas_gather=pallas)
            for batch in (512,) if pallas else (512, 4096):
                idx.search(ds.queries[:batch], sp, batch_size=batch)
                t0 = time.perf_counter()
                ids, _ = idx.search(ds.queries, sp, batch_size=batch)
                dt = time.perf_counter() - t0
                r = recall_at_k(ids, ds.ground_truth, 10)
                print(
                    f"# hnsw pallas={int(pallas)} ef={ef} batch={batch}: "
                    f"qps={len(ds.queries)/dt:.0f} recall@10={r:.4f}"
                )


if __name__ == "__main__":
    microbench()
    end_to_end()
