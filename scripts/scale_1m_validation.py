#!/usr/bin/env python
"""VERDICT #9: 1M-row sharded validation.

Phases (run separately; artifacts under .bench_cache/):
  gt       — make the 1M synthetic base + exact ground truth on the TPU
             (FlatIndex, recall oracle); saves ds_1m.npz
  build    — native-build the 1M HNSW graph (host, ~minutes on 1 core);
             saves the whole-graph checkpoint
  sharded  — on the 8-device CPU mesh: per-shard checkpoint round-trip
             (timed), ShardedIndex + ShardedFastFlat search, recall vs gt

Usage: python scripts/scale_1m_validation.py {gt|build|sharded}
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CACHE = os.path.join(ROOT, ".bench_cache")

N, D, NQ = 1_000_000, 64, 1024
DS = os.path.join(CACHE, f"ds_1m_{N}x{D}_q{NQ}.npz")
GRAPH = os.path.join(CACHE, f"graph_1m_{N}x{D}_m16.npz")
SHARD_DIR = os.path.join(CACHE, "graph_1m_shards")


def make_base():
    rng = np.random.default_rng(17)
    # mixture of gaussians like synthetic_dataset, but sized for 1M
    centers = rng.standard_normal((256, D)).astype(np.float32) * 2.0
    which = rng.integers(0, 256, N)
    base = centers[which] + rng.standard_normal((N, D)).astype(np.float32)
    qw = rng.integers(0, 256, NQ)
    queries = centers[qw] + rng.standard_normal((NQ, D)).astype(np.float32)
    return base, queries


def phase_gt():
    from shine_tpu.models.flat import FlatIndex

    base, queries = make_base()
    t0 = time.time()
    idx = FlatIndex(base)
    ids, _ = idx.search(queries, 10, batch_size=1024)
    print(f"# gt on chip: {time.time()-t0:.1f}s")
    np.savez(DS, base=base, queries=queries, gt=ids)


def phase_build():
    from shine_tpu.config import HNSWParams
    from shine_tpu.graph import build_graph
    from shine_tpu.io import save_graph

    z = np.load(DS)
    t0 = time.time()
    graph = build_graph(z["base"], HNSWParams(M=16, ef_construction=200),
                        threads=2)
    print(f"# native build 1M: {time.time()-t0:.1f}s")
    save_graph(graph, GRAPH)


def phase_sharded():
    import jax

    from shine_tpu.config import SearchParams
    from shine_tpu.io import load_graph, recall_at_k
    from shine_tpu.io.checkpoint import load_graph_sharded, save_graph_sharded
    from shine_tpu.parallel import (
        ShardedFastFlatIndex,
        ShardedIndex,
        shard_mesh,
    )

    assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8
    z = np.load(DS)
    graph = load_graph(GRAPH)

    # per-shard checkpoint round-trip (reference store/load,
    # memory_node.hh:130-209), timed
    t0 = time.time()
    save_graph_sharded(graph, SHARD_DIR, num_shards=8)
    t_save = time.time() - t0
    t0 = time.time()
    g2 = load_graph_sharded(SHARD_DIR)
    t_load = time.time() - t0
    assert (g2.neighbors0 == graph.neighbors0).all()
    assert (g2.vectors == graph.vectors).all()
    print(f"# sharded checkpoint 1M: save {t_save:.1f}s load {t_load:.1f}s")

    mesh = shard_mesh(8)
    idx = ShardedIndex(graph, mesh, cache_capacity=50_000)
    t0 = time.time()
    ids, _ = idx.search(z["queries"], SearchParams(k=10, ef=96),
                        batch_size=512)
    dt = time.time() - t0
    r = recall_at_k(ids, z["gt"], 10)
    hr = idx.cache_hits / max(idx.cache_hits + idx.cache_misses, 1)
    print(f"# sharded hnsw 1M (8-way): recall@10={r:.4f} "
          f"({NQ/dt:.0f} q/s on CPU mesh, hit_rate={hr:.3f})")

    ff = ShardedFastFlatIndex(z["base"], mesh)
    t0 = time.time()
    fids, _ = ff.search(z["queries"], 10, batch_size=512, tq=512)
    dt = time.time() - t0
    fr = recall_at_k(fids, z["gt"], 10)
    print(f"# sharded fastflat 1M (8-way): recall@10={fr:.4f} "
          f"({NQ/dt:.0f} q/s on CPU mesh, interpret kernel)")


def phase_onchip(ivf_only: bool = False):
    """Single-chip 1M refresh: fastflat + IVF operating points (the IVF
    recall-at-scale point VERDICT #2 asks for)."""
    import time as _t

    from shine_tpu.io import recall_at_k
    from shine_tpu.models.flat import FastFlatIndex
    from shine_tpu.models.ivf import IVFIndex

    z = np.load(DS)
    q = z["queries"]

    if ivf_only:
        _onchip_ivf(z, q)
        return

    fast = FastFlatIndex(z["base"])
    pre = fast.preload(q, batch_size=1024)
    for _ in range(2):
        t0 = _t.time()
        ids, _ = fast.search(q, 10, batch_size=1024, preloaded=pre,
                             with_dists=False)
        dt = _t.time() - t0
    r = recall_at_k(ids, z["gt"], 10)
    print(f"# fastflat 1M x {D} on-chip: qps={NQ/dt:.0f} recall@10={r:.4f}")
    # megabatch (one lax.map program over the batch loop): at 1M the
    # scan is ~6 ms/1024-batch, so the ~4.7 ms/dispatch launch cost is
    # nearly half the wall — the mega program should recover most of it
    for _ in range(2):
        t0 = _t.time()
        ids, _ = fast.search(q, 10, batch_size=1024, preloaded=pre,
                             with_dists=False, megabatch=True)
        dt = _t.time() - t0
    r = recall_at_k(ids, z["gt"], 10)
    print(f"# fastflat 1M mega: qps={NQ/dt:.0f} recall@10={r:.4f}")
    _onchip_ivf(z, q)


def _onchip_ivf(z, q):
    import time as _t

    from shine_tpu.io import recall_at_k
    from shine_tpu.models.ivf import IVFIndex

    t0 = _t.time()
    import jax.numpy as jnp

    # device-resident build (build_ivf_layout_device): the host Lloyd +
    # cluster fill path takes >7 min at 1M on this 1-core host
    ivf = IVFIndex.from_device(jnp.asarray(z["base"]), seed=7)
    print(f"# ivf build 1M: {_t.time()-t0:.1f}s (C={ivf.data.num_clusters})")
    for p in (16, 32, 64):
        ivf.search(q[:512], 10, probes=p, batch_size=512)  # compile
        t0 = _t.time()
        ids, _ = ivf.search(q, 10, probes=p, batch_size=512)
        dt = _t.time() - t0
        r = recall_at_k(ids, z["gt"], 10)
        print(f"# ivf 1M p={p}: qps={NQ/dt:.0f} recall@10={r:.4f}")

    pre = ivf.preload(q, batch_size=1024)
    for pr, sh, t in ((16, 128, 64), (16, 160, 128)):
        ivf.search_routed(q, 10, probes=pr, shared=sh, tile=t,
                          batch_size=1024, preloaded=pre)
        best = float("inf")
        for _ in range(2):
            t0 = _t.time()
            ids, _, st = ivf.search_routed(
                q, 10, probes=pr, shared=sh, tile=t, batch_size=1024,
                preloaded=pre, with_stats=True,
            )
            best = min(best, _t.time() - t0)
        r = recall_at_k(ids, z["gt"], 10)
        print(f"# ivf routed 1M p={pr} P={sh} T={t}: qps={NQ/best:.0f} "
              f"recall@10={r:.4f} cov={st['probe_coverage']:.3f}")


def phase_routed_coarse():
    """Routed IVF wants coarse clusters (C ~ 1-2k regardless of N) so tile
    neighbors share probes — see docs/TPU_NOTES.md '1M x 64 refresh'.
    Validates that hypothesis: C=1536 instead of the per-query-optimal
    7813."""
    import time as _t

    import jax.numpy as jnp

    from shine_tpu.io import recall_at_k
    from shine_tpu.models.ivf import IVFIndex

    z = np.load(DS)
    q = z["queries"]
    t0 = _t.time()
    ivf = IVFIndex.from_device(jnp.asarray(z["base"]), num_clusters=1536,
                               seed=7)
    print(f"# ivf coarse build 1M: {_t.time()-t0:.1f}s "
          f"(C={ivf.data.num_clusters} cap={ivf.data.cap})")
    pre = ivf.preload(q, batch_size=1024)
    for pr, sh, t, fb in (
        (16, 128, 64, 0.0),
        (16, 160, 128, 0.0),
        (24, 192, 128, 0.0),
        (16, 128, 64, 0.9),
    ):
        ivf.search_routed(q, 10, probes=pr, shared=sh, tile=t,
                          batch_size=1024, preloaded=pre, fallback=fb)
        best = float("inf")
        for _ in range(2):
            t0 = _t.time()
            ids, _, st = ivf.search_routed(
                q, 10, probes=pr, shared=sh, tile=t, batch_size=1024,
                preloaded=pre, with_stats=True, fallback=fb,
            )
            best = min(best, _t.time() - t0)
        r = recall_at_k(ids, z["gt"], 10)
        print(f"# ivf routed-coarse 1M p={pr} P={sh} T={t} fb={fb}: "
              f"qps={NQ/best:.0f} recall@10={r:.4f} "
              f"cov={st['probe_coverage']:.3f} "
              f"spill={st['fallback_queries']}")


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "gt"
    if phase == "sharded":
        os.environ.setdefault("SHINE_FORCE_CPU_DEVICES", "8")
        from shine_tpu.cli import _maybe_force_cpu_mesh

        _maybe_force_cpu_mesh()
    {
        "gt": phase_gt,
        "build": phase_build,
        "sharded": phase_sharded,
        "onchip": phase_onchip,
        "onchip_ivf": lambda: phase_onchip(ivf_only=True),
        "routed_coarse": phase_routed_coarse,
    }[phase]()
