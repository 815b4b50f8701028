"""Headline benchmark: single-chip batched k-NN search QPS at recall@10>=0.95.

Mirrors the reference's primary metric `queries.queries_per_sec` = total
queries / query wall time (/root/reference/src/compute_node.cc:554-556) at
its recall operating point (~95% recall@10, scripts/datasets.py:12-20).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is QPS relative to the BASELINE.md north-star of 100k QPS/chip
at recall@10 = 0.95.

Env knobs: SHINE_BENCH_N (base size), SHINE_BENCH_D (dim),
SHINE_BENCH_Q (queries), SHINE_BENCH_EF, SHINE_BENCH_BATCH.
The built graph is cached under .bench_cache/ so repeat runs skip the build.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shine_tpu.config import HNSWParams, SearchParams  # noqa: E402
from shine_tpu.graph import build_graph  # noqa: E402
from shine_tpu.io import (  # noqa: E402
    index_path,
    load_graph,
    recall_at_k,
    save_graph,
    synthetic_dataset,
)
from shine_tpu.models import HNSWIndex  # noqa: E402

BASELINE_QPS = 100_000.0  # BASELINE.md north-star: >=100k QPS/chip @ r@10=0.95


def main() -> None:
    n = int(os.environ.get("SHINE_BENCH_N", 200_000))
    d = int(os.environ.get("SHINE_BENCH_D", 128))
    nq = int(os.environ.get("SHINE_BENCH_Q", 10_000))
    ef = int(os.environ.get("SHINE_BENCH_EF", 96))
    batch = int(os.environ.get("SHINE_BENCH_BATCH", 2048))
    params = HNSWParams(M=16, ef_construction=200)

    ds = synthetic_dataset(
        n=n, dim=d, num_queries=nq, seed=7, gt_k=10, compute_gt=True
    )
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    ckpt = index_path(cache_dir, ds.name, params)
    if os.path.exists(ckpt):
        graph = load_graph(ckpt)
    else:
        t0 = time.perf_counter()
        graph = build_graph(ds.base, params)
        build_s = time.perf_counter() - t0
        print(f"# built {n}x{d} in {build_s:.1f}s", file=sys.stderr)
        save_graph(graph, ckpt)

    index = HNSWIndex(graph)
    sp = SearchParams(k=10, ef=ef)

    # compile + warmup
    index.search(ds.queries[:batch], sp, batch_size=batch)

    best_qps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        ids, _ = index.search(ds.queries, sp, batch_size=batch)
        dt = time.perf_counter() - t0
        best_qps = max(best_qps, nq / dt)
    recall = recall_at_k(ids, ds.ground_truth, 10)
    print(
        f"# recall@10={recall:.4f} qps={best_qps:.0f} n={n} d={d} ef={ef}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"qps_per_chip@recall10={recall:.3f}",
                "value": round(best_qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(best_qps / BASELINE_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
