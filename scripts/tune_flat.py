#!/usr/bin/env python
"""On-chip tuning grid for the flat scan (run on real TPU hardware).

Times with forced host transfer (docs/TPU_NOTES.md — block_until_ready is
unreliable under axon). Prints one line per config; use the best for
bench.py defaults.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from shine_tpu.io import synthetic_dataset, recall_at_k  # noqa: E402
from shine_tpu.models.flat import FlatIndex, flat_search  # noqa: E402


def main() -> None:
    n = int(os.environ.get("N", 200_000))
    d = int(os.environ.get("D", 128))
    ds = synthetic_dataset(n=n, dim=d, num_queries=4096, seed=7, gt_k=10)
    idx = FlatIndex(ds.base)
    for batch in (1024, 2048, 4096):
        for chunk in (32768, 65536, 131072):
            for bf16, approx in ((True, False), (False, False), (True, True)):
                q = jnp.asarray(ds.queries[:batch].astype(np.float32))
                f = lambda: flat_search(
                    idx.data, q, k=10, chunk=min(chunk, idx.data.vectors.shape[0]),
                    metric=idx.metric, use_bf16=bf16, approx=approx,
                )
                dd, ii = f()
                _ = np.asarray(dd)
                best = float("inf")
                for _rep in range(3):
                    t0 = time.perf_counter()
                    dd, ii = f()
                    _ = np.asarray(dd)
                    best = min(best, time.perf_counter() - t0)
                r = recall_at_k(np.asarray(ii), ds.ground_truth[:batch], 10)
                print(
                    f"batch={batch} chunk={chunk} bf16={int(bf16)} approx={int(approx)}: "
                    f"{best * 1e3:.1f} ms, QPS={batch / best:.0f}, recall={r:.4f}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
