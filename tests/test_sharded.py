"""Multi-chip sharded search on the virtual 8-device CPU mesh (SURVEY.md §4:
deterministic single-host multi-shard tests via
xla_force_host_platform_device_count)."""

import jax
import numpy as np
import pytest

from shine_tpu.config import HNSWParams, SearchParams
from shine_tpu.graph import build_graph
from shine_tpu.io import recall_at_k
from shine_tpu.models import HNSWIndex
from shine_tpu.parallel import ShardedIndex, shard_mesh
from shine_tpu.parallel.sharded import build_upper_tables


@pytest.fixture(scope="module")
def ds():
    from shine_tpu.io import synthetic_dataset

    return synthetic_dataset(n=4000, dim=32, num_queries=128, seed=11)


@pytest.fixture(scope="module")
def graph(ds):
    return build_graph(ds.base, HNSWParams(M=16, ef_construction=100), threads=8)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_upper_tables_roundtrip(graph):
    upper_ids, adj_u, entry_u = build_upper_tables(graph)
    assert (graph.levels[upper_ids] >= 1).all()
    assert upper_ids[entry_u] == graph.entry_point
    # every u-index edge maps back to a global edge in the original table
    U = len(upper_ids)
    assert adj_u.max() < U
    valid = adj_u >= 0
    back = np.where(valid, upper_ids[np.clip(adj_u, 0, U - 1)], -1)
    rows = graph.upper_row[upper_ids]
    np.testing.assert_array_equal(
        np.where(valid, back, -1), np.where(valid, graph.upper_neighbors[rows], -1)
    )


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_recall(ds, graph, n_shards):
    mesh = shard_mesh(n_shards)
    idx = ShardedIndex(graph, mesh)
    ids, dists = idx.search(ds.queries, SearchParams(k=10, ef=64), batch_size=64)
    r = recall_at_k(ids, ds.ground_truth, 10)
    assert r > 0.95, r
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_sharded_matches_single_chip(ds, graph):
    """Sharding is a pure layout change: results must equal the single-chip
    batched search (same beam, same tie-breaks)."""
    sp = SearchParams(k=10, ef=64)
    single = HNSWIndex(graph)
    s_ids, _ = single.search(ds.queries, sp, batch_size=64)
    mesh = shard_mesh(4)
    sharded = ShardedIndex(graph, mesh)
    m_ids, _ = sharded.search(ds.queries, sp, batch_size=64)
    agree = (s_ids == m_ids).mean()
    assert agree > 0.999, agree


def test_sharded_tail_padding(ds, graph):
    mesh = shard_mesh(8)
    idx = ShardedIndex(graph, mesh)
    ids_a, _ = idx.search(ds.queries[:50], SearchParams(k=5, ef=32), batch_size=64)
    ids_b, _ = idx.search(ds.queries[:50], SearchParams(k=5, ef=32), batch_size=128)
    np.testing.assert_array_equal(ids_a, ids_b)


def test_sharded_with_cache_matches(ds, graph):
    """The hot replica is a pure data-path optimization: results must be
    identical to the uncached sharded search, and hits must be counted."""
    from shine_tpu.parallel.sharded import ShardedIndex

    sp = SearchParams(k=10, ef=64)
    mesh = shard_mesh(4)
    plain = ShardedIndex(graph, mesh)
    cached = ShardedIndex(graph, mesh, cache_capacity=1024)
    a, da = plain.search(ds.queries, sp, batch_size=64)
    b, db = cached.search(ds.queries, sp, batch_size=64)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(da, db, rtol=1e-5, atol=1e-5)
    total = cached.cache_hits + cached.cache_misses
    assert total > 0
    assert cached.cache_hits / total > 0.2  # hubs are hot


def test_sharded_with_routing_matches(ds, graph):
    """Affinity routing permutes batch composition only — results must be
    identical after unpermutation."""
    from shine_tpu.parallel.sharded import ShardedIndex

    sp = SearchParams(k=10, ef=64)
    mesh = shard_mesh(4)
    plain = ShardedIndex(graph, mesh)
    routed = ShardedIndex(graph, mesh, routing=True)
    a, _ = plain.search(ds.queries, sp, batch_size=64)
    b, _ = routed.search(ds.queries, sp, batch_size=64)
    np.testing.assert_array_equal(a, b)


def test_adaptive_cache_improves_hit_rate(ds, graph):
    """The cache adaptation loop (VERDICT #4): under a Zipf workload the
    refreshed hot set must beat the static in-degree snapshot's hit rate,
    and results must be identical before and after refreshes."""
    from shine_tpu.io.skew import skewed_workload

    sp = SearchParams(k=10, ef=64)
    mesh = shard_mesh(4)
    # heavy skew: a few pool queries dominate -> their neighborhoods are hot
    _, timed, _ = skewed_workload(ds.queries, total=512, alpha=1.5, seed=5)

    static = ShardedIndex(graph, mesh, cache_capacity=256)
    s_ids, _ = static.search(timed, sp, batch_size=64)
    s_rate = static.cache_hits / max(static.cache_hits + static.cache_misses, 1)

    adaptive = ShardedIndex(
        graph, mesh, cache_capacity=256, adaptive_cache=True, refresh_every=2
    )
    adaptive.warm(timed[:256], sp, batch_size=64)
    assert adaptive.refreshes >= 1
    a_ids, _ = adaptive.search(timed, sp, batch_size=64)
    a_rate = adaptive.cache_hits / max(
        adaptive.cache_hits + adaptive.cache_misses, 1
    )

    # replica contents never change results
    np.testing.assert_array_equal(s_ids, a_ids)
    assert a_rate > s_rate, (a_rate, s_rate)


def test_refresh_mid_stream_keeps_results(ds, graph):
    """Refreshing between batches of one search call is invisible in the
    outputs (the replica serves exact copies of the owner rows)."""
    sp = SearchParams(k=10, ef=64)
    mesh = shard_mesh(4)
    plain = ShardedIndex(graph, mesh)
    adaptive = ShardedIndex(
        graph, mesh, cache_capacity=512, adaptive_cache=True, refresh_every=1
    )
    a, _ = plain.search(ds.queries, sp, batch_size=64)
    b, _ = adaptive.search(ds.queries, sp, batch_size=64)  # refresh per batch
    assert adaptive.refreshes >= 1
    np.testing.assert_array_equal(a, b)


def test_adaptive_routing_matches_and_narrows(ds, graph):
    """Adaptive routing (VERDICT #5): results exactly equal the unrouted
    path, quotas move off uniform under Zipf skew, and the per-slice hops
    spread narrows once the feedback loop has observations (the first
    batch runs on uniform quotas = the static composition)."""
    from shine_tpu.io.skew import skewed_workload

    sp = SearchParams(k=10, ef=64)
    mesh = shard_mesh(4)
    _, timed, _ = skewed_workload(ds.queries, total=768, alpha=1.25, seed=7)

    plain = ShardedIndex(graph, mesh)
    a, _ = plain.search(timed, sp, batch_size=64)

    routed = ShardedIndex(graph, mesh, routing="adaptive")
    b, _ = routed.search(timed, sp, batch_size=64)
    np.testing.assert_array_equal(a, b)

    ar = routed._adaptive_router
    hist = np.stack(ar.load_history)  # (num_batches, S) per-slice hops
    assert len(hist) == 12  # 768 / 64
    spread = hist.std(axis=1) / np.maximum(hist.mean(axis=1), 1e-9)
    early = spread[0]
    late = spread[len(spread) // 2 :].mean()
    assert late < early, (early, late)
    # quotas adapted away from the uniform start
    q = np.stack(ar.quota_history)
    assert (q[1:] != q[0]).any()


def test_sharded_bf16_rows_matches_single_chip(ds, graph):
    """rows="bf16" is the same layout change sharded as single-chip: both
    paths round the layer-0 rows identically at upload
    (shard_graph/device_graph), so results agree like the f32 pair."""
    sp = SearchParams(k=10, ef=64)
    single = HNSWIndex(graph, rows="bf16")
    s_ids, _ = single.search(ds.queries, sp, batch_size=64)
    mesh = shard_mesh(4)
    sharded = ShardedIndex(graph, mesh, rows="bf16")
    m_ids, _ = sharded.search(ds.queries, sp, batch_size=64)
    agree = (s_ids == m_ids).mean()
    assert agree > 0.999, agree
    r = recall_at_k(m_ids, ds.ground_truth, 10)
    assert r > 0.95, r


def test_sharded_bf16_rows_cache_and_compact(ds, graph):
    """bf16 rows compose with the hot replica and the compact exchange:
    replica hits must serve the same rounded rows the owners would
    (hot_cache.build_replica rows=), so results match the dense
    cacheless bf16 path."""
    sp = SearchParams(k=10, ef=64)
    mesh = shard_mesh(4)
    base = ShardedIndex(graph, mesh, rows="bf16")
    a, _ = base.search(ds.queries, sp, batch_size=64)
    cached = ShardedIndex(graph, mesh, cache_capacity=512, rows="bf16")
    spc = SearchParams(k=10, ef=64, exchange="compact")
    b, _ = cached.search(ds.queries, spc, batch_size=64)
    agree = (a == b).mean()
    assert agree > 0.999, agree
    assert cached.cache_hits > 0


def test_sharded_int8_rows_rejected(graph):
    mesh = shard_mesh(2)
    with pytest.raises(ValueError, match="single-chip"):
        ShardedIndex(graph, mesh, rows="int8")
