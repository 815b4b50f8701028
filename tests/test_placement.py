"""Placement (balanced k-means), query routing, stats/timing (SURVEY.md
§2.5, §2.6, §5.1, §5.5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shine_tpu.parallel.placement import Placement, kmeans
from shine_tpu.parallel.router import QueryRouter


@pytest.fixture(scope="module")
def clustered(rng=None):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 16)).astype(np.float32) * 8
    pts = np.concatenate(
        [centers[i] + rng.normal(size=(250, 16)).astype(np.float32) for i in range(4)]
    )
    return pts, centers


def test_kmeans_finds_clusters(clustered):
    pts, centers = clustered
    cents, assign = kmeans(jnp.asarray(pts), k=4, iters=60, balanced=False)
    cents = np.asarray(cents)
    # every true center has a learned centroid nearby
    d = ((centers[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    assert (d.min(axis=1) < 4.0).all()


def test_balanced_kmeans_balances(clustered):
    pts, _ = clustered
    # skew the data: replicate cluster 0 strongly
    skewed = np.concatenate([pts[:250]] * 3 + [pts])
    cents, assign = kmeans(jnp.asarray(skewed), k=4, iters=80, balanced=True)
    counts = np.bincount(np.asarray(assign), minlength=4)
    assert counts.max() / counts.min() < 1.6, counts


def test_kmeans_deterministic(clustered):
    pts, _ = clustered
    c1, a1 = kmeans(jnp.asarray(pts), k=4, iters=30)
    c2, a2 = kmeans(jnp.asarray(pts), k=4, iters=30)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_placement_from_graph():
    from shine_tpu.config import HNSWParams
    from shine_tpu.graph import build_graph
    from shine_tpu.io import synthetic_dataset

    ds = synthetic_dataset(n=3000, dim=16, num_queries=50, seed=2, compute_gt=False)
    g = build_graph(ds.base, HNSWParams(M=8, ef_construction=50))
    p = Placement(g, num_shards=4)
    assert p.centroids.shape == (4, 16)
    ranked = p.closest_shards(ds.queries)
    assert ranked.shape == (50, 4)
    assert sorted(set(ranked[0].tolist())) == [0, 1, 2, 3]
    np.testing.assert_array_equal(p.shard_of(ds.queries), ranked[:, 0])


class TestRouter:
    def _router(self, nq=1000, shards=4, batch=64, seed=0):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(nq, 8)).astype(np.float32)
        # spread affinity roughly evenly over the shards
        q[:, 0] = rng.integers(0, shards, size=nq) + 0.2 * rng.normal(size=nq)

        class FakePlacement:
            num_shards = shards

            def closest_shards(self, qq):
                d = ((qq[:, None, :1] - np.arange(shards)[None, :, None]) ** 2).sum(-1)
                return np.argsort(d, axis=1).astype(np.int32)

        r = QueryRouter(FakePlacement(), batch_size=batch)
        return q, r

    def test_conservation(self):
        q, r = self._router()
        perm, used = r.plan(q)
        real = perm[perm < len(q)]
        assert sorted(real.tolist()) == list(range(len(q)))  # every query once

    def test_roundtrip(self):
        q, r = self._router(nq=500)
        perm, _ = r.plan(q)
        routed, valid = QueryRouter.apply(q, perm)
        res = routed[:, :1].copy()
        back = QueryRouter.unpermute(res, perm, len(q))
        np.testing.assert_array_equal(back[:, 0], q[:, 0])

    def test_affinity_layout(self):
        """Within a batch, slice s should hold mostly shard-s-affine
        queries (spill aside)."""
        q, r = self._router(nq=64 * 4, batch=64)
        ranked = r.placement.closest_shards(q)
        perm, used = r.plan(q)
        P = r.per_shard
        good = total = 0
        for b in range(len(perm) // 64):
            for s in range(4):
                lane = perm[b * 64 + s * P : b * 64 + (s + 1) * P]
                lane = lane[lane < len(q)]
                good += (ranked[lane, 0] == s).sum()
                total += len(lane)
        assert good / total > 0.7


def test_stats_schema():
    from shine_tpu.config import HNSWParams, SearchParams
    from shine_tpu.utils import SearchStats, Statistics

    st = Statistics(dataset="synth", label="test", num_shards=2)
    st.set_params(HNSWParams(M=8), SearchParams(k=5, ef=16))
    st.set_build(num_vectors=100, build_seconds=1.0, index_bytes=1234)
    s = SearchStats()
    s.add_batch(64, hops_sum=640, steps=20, cand_lanes=16, row_bytes=64, seconds=0.5)
    s.recall = 0.95
    st.set_queries(s)
    doc = st.as_dict()
    assert doc["queries"]["queries_per_sec"] == 128.0
    assert doc["queries"]["distance_computations"] == 640 * 16
    assert doc["hnsw_parameters"]["m_max0"] == 16
    assert doc["meta"]["num_shards"] == 2
    import json

    json.loads(st.dumps())  # serializable


def test_timing_intervals():
    import time

    from shine_tpu.utils import Timing

    t = Timing()
    with t.measure("build"):
        time.sleep(0.01)
    t["query"].add(0.5)
    d = t.as_dict()
    assert d["build"] >= 10.0
    assert d["query"] == 500.0
