"""On-device batched construction (SURVEY.md §7.2 Phase 3): the batched
insert rounds must produce a valid graph with recall parity against the
native sequential builder."""

import numpy as np
import pytest

from shine_tpu.config import HNSWParams, SearchParams
from shine_tpu.graph import build_graph
from shine_tpu.io import recall_at_k, synthetic_dataset
from shine_tpu.models import HNSWIndex, device_build_graph
from shine_tpu.models.build import draw_levels


@pytest.fixture(scope="module")
def ds():
    return synthetic_dataset(n=3000, dim=24, num_queries=100, seed=5)


@pytest.fixture(scope="module")
def dev_graph(ds):
    return device_build_graph(
        ds.base,
        HNSWParams(M=12, ef_construction=80),
        batch_size=256,
        first_batch=16,
    )


def test_device_build_valid(dev_graph):
    dev_graph.validate()


def test_device_build_recall(ds, dev_graph):
    idx = HNSWIndex(dev_graph)
    ids, _ = idx.search(ds.queries, SearchParams(k=10, ef=64), batch_size=64)
    r = recall_at_k(ids, ds.ground_truth, 10)
    assert r > 0.95, r


def test_device_build_parity_with_native(ds, dev_graph):
    """Within-round blindness must not cost recall vs the sequential
    native build (reference insert semantics)."""
    native = build_graph(ds.base, HNSWParams(M=12, ef_construction=80))
    sp = SearchParams(k=10, ef=64)
    r_native = recall_at_k(
        HNSWIndex(native).search(ds.queries, sp, batch_size=64)[0],
        ds.ground_truth,
        10,
    )
    r_dev = recall_at_k(
        HNSWIndex(dev_graph).search(ds.queries, sp, batch_size=64)[0],
        ds.ground_truth,
        10,
    )
    assert r_dev > r_native - 0.02, (r_dev, r_native)


def test_degrees_bounded(dev_graph):
    M = dev_graph.params.M
    deg0 = (dev_graph.neighbors0 >= 0).sum(axis=1)
    assert deg0.max() <= 2 * M
    up = (dev_graph.upper_neighbors >= 0).sum(axis=2)
    assert up.max() <= M


def test_level_draw_matches_geometric():
    params = HNSWParams(M=16, seed=9)
    lv = draw_levels(200_000, params)
    frac = (lv >= 1).mean()
    assert 0.8 / 16 < frac < 1.25 / 16
