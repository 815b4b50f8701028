"""Hot-vertex replica cache (reference src/cache/ analogue)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shine_tpu.config import HNSWParams
from shine_tpu.graph import build_graph
from shine_tpu.io import synthetic_dataset
from shine_tpu.parallel.hot_cache import (
    AccessCounter,
    build_replica,
    replica_lookup,
    select_hot_ids,
)


@pytest.fixture(scope="module")
def graph():
    ds = synthetic_dataset(n=2000, dim=16, num_queries=10, seed=6, compute_gt=False)
    return build_graph(ds.base, HNSWParams(M=8, ef_construction=50))


def test_select_includes_upper_nodes(graph):
    hot = select_hot_ids(graph, 600)
    upper = set(np.where(graph.levels >= 1)[0].tolist())
    assert upper <= set(hot.tolist())  # upper layers always replicated
    assert np.all(np.diff(hot) > 0)  # sorted unique


def test_lookup_hits_and_misses(graph):
    hot = select_hot_ids(graph, 128)
    rep = build_replica(graph, hot)
    probe = jnp.asarray(
        np.concatenate([hot[:5], np.array([graph.n - 1, -1], dtype=np.int32)])
    )
    rows, hit = replica_lookup(rep, probe)
    want_hit = [True] * 5 + [graph.n - 1 in set(hot.tolist()), False]
    assert hit.tolist() == want_hit
    # hit rows map back to the right id
    got = np.asarray(rep.hot_ids)[np.asarray(rows)[:5]]
    np.testing.assert_array_equal(got, hot[:5])
    # replica content matches the graph
    np.testing.assert_array_equal(
        np.asarray(rep.hot_neighbors)[np.asarray(rows)[0]],
        graph.neighbors0[hot[0]],
    )


def test_counter_refresh_tracks_skew(graph):
    c = AccessCounter(graph.n, decay=0.5)
    hot_targets = np.arange(50, dtype=np.int32)
    for _ in range(3):
        c.update(np.tile(hot_targets, 20))
        c.update(np.array([-1, 1999], dtype=np.int32))
    rep = c.refresh(graph, 64)
    ids = set(np.asarray(rep.hot_ids).tolist())
    assert set(hot_targets.tolist()) <= ids
    assert 1999 in ids
