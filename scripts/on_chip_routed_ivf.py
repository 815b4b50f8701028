#!/usr/bin/env python
"""On-chip probe: fused routed IVF (tile-shared probing) vs per-query IVF
vs fastflat at the 200k x 128 headline operating point.

Uses the cached bench dataset and caches the IVF layout (the host-side
balanced build takes ~10 min on this 1-core host). Timing is
transfer-forced (result ids download). The question: does amortizing the
probe gather across affinity-sorted tiles beat the fused full scan
(fastflat ~112-145k QPS @ 0.992)?
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax.numpy as jnp  # noqa: E402

from shine_tpu.io import Dataset, recall_at_k  # noqa: E402
from shine_tpu.models.ivf import IVFData, IVFIndex  # noqa: E402

z = np.load(os.path.join(ROOT, ".bench_cache", "ds_200000x128_q10000.npz"))
ds = Dataset(z["base"], z["queries"], z["gt"], name="synth-200k")
nq = len(ds.queries)

IVF_CACHE = os.path.join(ROOT, ".bench_cache", "ivf_200k_v2.npz")
t0 = time.time()
if os.path.exists(IVF_CACHE):
    w = np.load(IVF_CACHE)
    ivf = IVFIndex.__new__(IVFIndex)
    ivf.metric = 0
    ivf.n = len(ds.base)
    ivf.data = IVFData(
        centroids=jnp.asarray(w["centroids"]),
        blocks=jnp.asarray(w["blocks"]).astype(jnp.bfloat16),
        block_sq=jnp.asarray(w["block_sq"]),
        block_ids=jnp.asarray(w["block_ids"]),
        vectors=jnp.asarray(ds.base.astype(np.float32)),
        sqnorms=jnp.asarray((ds.base.astype(np.float32) ** 2).sum(-1)),
    )
    print(f"# ivf layout from cache ({time.time()-t0:.1f}s)", flush=True)
else:
    ivf = IVFIndex(ds.base, seed=7)
    np.savez(
        IVF_CACHE,
        centroids=np.asarray(ivf.data.centroids),
        blocks=np.asarray(ivf.data.blocks, dtype=np.float32),
        block_sq=np.asarray(ivf.data.block_sq),
        block_ids=np.asarray(ivf.data.block_ids),
    )
    print(f"# build: {time.time()-t0:.1f}s C={ivf.data.num_clusters} "
          f"cap={ivf.data.cap}", flush=True)

pre = ivf.preload(ds.queries, batch_size=4096)

for probes, shared, tile in (
    (16, 128, 128),
    (24, 160, 128),
    (16, 128, 64),
    (24, 192, 256),
):
    try:
        ivf.search_routed(ds.queries, 10, probes=probes, shared=shared,
                          tile=tile, preloaded=pre)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            ids, _, st = ivf.search_routed(
                ds.queries, 10, probes=probes, shared=shared, tile=tile,
                preloaded=pre, with_stats=True,
            )
            best = min(best, time.time() - t0)
        r = recall_at_k(ids, ds.ground_truth, 10)
        print(f"# routed p={probes} P={shared} T={tile}: "
              f"qps={nq/best:.0f} recall={r:.4f} cov={st['probe_coverage']:.3f}",
              flush=True)
    except Exception as e:
        print(f"# routed p={probes} P={shared}: FAILED {e!r}", flush=True)

# per-query reference point
ivf.search(ds.queries[:4096], 10, probes=32, batch_size=4096)
t0 = time.time()
ids, _ = ivf.search(ds.queries, 10, probes=32, batch_size=4096)
dt = time.time() - t0
r = recall_at_k(ids, ds.ground_truth, 10)
print(f"# per-query p=32: qps={nq/dt:.0f} recall={r:.4f}", flush=True)
