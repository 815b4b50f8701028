"""Index persistence: whole-graph and per-shard checkpoints (reference
memory_node.hh:130-209 dump/load analogue)."""

import numpy as np
import pytest

from shine_tpu.config import HNSWParams
from shine_tpu.graph import build_graph
from shine_tpu.io import load_graph, save_graph, synthetic_dataset
from shine_tpu.io.checkpoint import load_graph_sharded, save_graph_sharded


@pytest.fixture(scope="module")
def graph():
    ds = synthetic_dataset(n=1500, dim=16, num_queries=10, seed=8, compute_gt=False)
    return build_graph(ds.base, HNSWParams(M=8, ef_construction=40))


def _assert_same(a, b):
    np.testing.assert_array_equal(a.vectors, b.vectors)
    np.testing.assert_array_equal(a.levels, b.levels)
    np.testing.assert_array_equal(a.neighbors0, b.neighbors0)
    np.testing.assert_array_equal(a.upper_row, b.upper_row)
    np.testing.assert_array_equal(a.upper_neighbors, b.upper_neighbors)
    assert a.entry_point == b.entry_point
    assert a.top_level == b.top_level
    assert a.params == b.params


def test_roundtrip_single(tmp_path, graph):
    p = str(tmp_path / "g.npz")
    save_graph(graph, p)
    _assert_same(graph, load_graph(p))


def test_roundtrip_sharded(tmp_path, graph):
    d = str(tmp_path / "shards")
    save_graph_sharded(graph, d, 4)
    back = load_graph_sharded(d)
    _assert_same(graph, back)
    back.validate()


def test_sharded_file_per_shard(tmp_path, graph):
    import os

    d = str(tmp_path / "shards")
    save_graph_sharded(graph, d, 3)
    files = sorted(os.listdir(d))
    assert files == [f"shard_{i}_of_3.npz" for i in range(3)]
