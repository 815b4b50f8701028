#!/usr/bin/env python
"""Counter sweep of the cluster-sharded routed path on the CPU mesh.

QPS on virtual CPU devices is meaningless, but the DEVICE-MEASURED
counters are platform-independent: per-shard owned-lane occupancy
(lanes_used, psum'd inside the shard_map), overflow drops, routing
coverage, the spill count, and recall. The sweep shows the owned-lane
compaction claim with measured numbers: at P_loc = P every shard scans
only what it owns (sum over shards ~= granted lanes, an ~S-fold split
of the single-chip scan), and shrinking P_loc trades dropped
lowest-priority columns (overflow) for a narrower scan window.

Run: SHINE_FORCE_CPU_DEVICES is not needed — the script forces the
8-device CPU mesh itself. Appends results/routed_sharded_counters.jsonl;
collect_results.py turns JSONL into CSV.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(ROOT, "results", "routed_sharded_counters.jsonl")


def emit(rec: dict) -> None:
    print("#", json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.io import recall_at_k
    from shine_tpu.io.device_synth import regen_rows
    from shine_tpu.parallel.mesh import shard_mesh
    from shine_tpu.parallel.routed_sharded import build_routed_split_sharded

    n, d, nq = 65_536, 32, 256
    key = jax.random.PRNGKey(21)
    centers = jax.random.normal(jax.random.PRNGKey(22), (32, d)) * 4.0
    rng = np.random.default_rng(23)
    anchors = np.asarray(
        regen_rows(key, centers, jnp.asarray(
            rng.integers(0, n, nq), dtype=jnp.int32))
    )
    queries = anchors + rng.normal(size=(nq, d)).astype(np.float32) * 0.3

    mesh = shard_mesh(8)
    idx, gt = build_routed_split_sharded(
        n, d, mesh, row_source=(key, centers), cap_target=1024, cls=256,
        train_size=65_536, seed=24, queries=queries,
        log=lambda m: print(m, flush=True),
    )
    S, C = 8, idx.C
    p, P, T = 16, 32, 32
    for P_loc in (32, 16, 10, 6, 4):
        ids, _ = idx.search(
            queries, 10, probes=p, shared=P, tile=T, shared_local=P_loc,
            kk=64, batch_size=256, fallback=0,
        )
        emit({
            "n": n, "S": S, "C": C, "p": p, "P": P, "T": T,
            "P_loc": P_loc,
            "lanes_used": idx.last_lanes,
            "lane_window": (nq // T) * S * P_loc,
            "singlechip_window": (nq // T) * P,
            "overflow": idx.last_overflow,
            "coverage": round(idx.last_coverage, 4),
            "recall10": round(recall_at_k(ids, gt, 10), 4),
        })


if __name__ == "__main__":
    main()
