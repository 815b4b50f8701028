"""Cluster-sharded routed split serving (parallel/routed_sharded.py) on
the virtual 8-device CPU mesh.

Per-shard class-max states see only owned clusters, so the gathered
candidate union is at least as rich as the single-chip scan's — the
sharded recall must not fall below single-chip at the same knobs, and
coverage (computed replicated) must match exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shine_tpu.io import recall_at_k
from shine_tpu.models.routed_split import build_routed_split
from shine_tpu.parallel.mesh import shard_mesh
from shine_tpu.parallel.routed_sharded import ShardedRoutedSplitIndex


@pytest.fixture(scope="module")
def setup():
    n, d = 8192, 32
    key = jax.random.PRNGKey(9)
    centers = jax.random.normal(jax.random.PRNGKey(1), (16, d)) * 4.0
    from shine_tpu.io.device_synth import regen_rows

    rng = np.random.default_rng(2)
    queries = np.asarray(
        regen_rows(key, centers, jnp.arange(64, dtype=jnp.int32))
    ) + rng.normal(size=(64, d)).astype(np.float32) * 0.3
    idx, gt = build_routed_split(
        n, d, row_source=(key, centers), cap_target=512, cls=128,
        train_size=8192, seed=4, shards=8, queries=queries,
    )
    base = np.asarray(
        regen_rows(key, centers, jnp.arange(n, dtype=jnp.int32))
    )
    dd = (
        (queries ** 2).sum(1)[:, None]
        - 2.0 * queries @ base.T
        + (base ** 2).sum(1)[None, :]
    )
    gt_ref = np.argsort(dd, axis=1, kind="stable")[:, :10]
    return idx, queries, gt_ref


def test_sharded_routed_matches_or_beats_single(setup):
    idx, queries, gt = setup
    assert idx.C % 8 == 0
    kw = dict(probes=16, shared=32, tile=32, batch_size=64)
    # fallback=0: compare the raw routed pass (the sharded path has no
    # per-query spill; its guarantee is the richer gathered union)
    ids_1, _ = idx.search(queries, 10, kk=64, fallback=0, **kw)
    cov_1 = idx.last_coverage
    r1 = recall_at_k(ids_1, gt, 10)

    mesh = shard_mesh(8)
    sh = ShardedRoutedSplitIndex.from_single(idx, mesh)
    # fallback=0 on BOTH sides: this test isolates the owned-lane union
    # invariant, which the spill could otherwise silently repair
    ids_s, dists_s = sh.search(queries, 10, kk=64, shared_local=32,
                               fallback=0, **kw)
    rs = recall_at_k(ids_s, gt, 10)
    # same deterministic routing -> identical coverage; no lane overflow
    # at shared_local = shared; per-shard class states are less crowded
    # than single-chip so the gathered union can only help recall
    assert sh.last_coverage == cov_1
    assert sh.last_overflow == 0
    assert rs >= r1 - 1e-9
    assert (np.diff(dists_s, axis=1) >= -1e-5).all()


def test_sharded_routed_lane_compaction_counters(setup):
    idx, queries, gt = setup
    mesh = shard_mesh(8)
    sh = ShardedRoutedSplitIndex.from_single(idx, mesh)
    # tight local lanes: P_loc auto = 2*ceil(32/8)+2 = 10 < 32 granted;
    # overflow is counted, coverage of scans degrades gracefully
    ids, _ = sh.search(queries, 10, probes=16, shared=32, tile=32,
                       batch_size=64)
    assert recall_at_k(ids, gt, 10) >= 0.85
    cc = sh.cost_counters(64, probes=16, shared=32, tile=32)
    assert cc["ici_exchange_bytes"] > 0
    assert cc["scanned_rows"] <= 64 * 32 * idx.cap


def test_sharded_routed_gid_relayout_is_permutation(setup):
    idx, _, _ = setup
    mesh = shard_mesh(8)
    sh = ShardedRoutedSplitIndex.from_single(idx, mesh)
    gid = np.asarray(sh.gid)
    real = np.sort(gid[gid >= 0])
    assert (real == np.arange(idx.n)).all()


def test_direct_sharded_build_bit_identical(setup):
    """build_routed_split_sharded (per-shard stage-D ingest) must land
    on EXACTLY the re-dealt single-chip tables: the plan is shared and
    rows are pure functions of their global id, so chunk grouping
    cannot change a single packed byte."""
    from shine_tpu.io.device_synth import regen_rows
    from shine_tpu.parallel.routed_sharded import build_routed_split_sharded

    idx, queries, gt_ref = setup
    mesh = shard_mesh(8)
    ref = ShardedRoutedSplitIndex.from_single(idx, mesh)
    key = idx.row_source[0]
    centers = idx.row_source[1]
    built, gt = build_routed_split_sharded(
        idx.n, idx.dim, mesh, row_source=(key, centers), cap_target=512,
        cls=128, train_size=8192, seed=4, queries=queries,
    )
    assert built.C == ref.C and built.cap == ref.cap
    # the direct build keeps per-shard ingest-pad rows (gid -1, never
    # addressed); the re-dealt reference is exactly n_loc rows/shard —
    # compare the meaningful per-shard prefix
    S = mesh.devices.size
    n_loc = (built.C // S + 1) * built.cap

    def per_shard(a):
        a = np.asarray(a)
        return a.reshape(S, a.shape[0] // S, *a.shape[1:])

    b_gid = per_shard(built.gid)
    assert (b_gid[:, n_loc:] == -1).all()
    assert (b_gid[:, :n_loc] == per_shard(ref.gid)[:, :n_loc]).all()
    assert (
        per_shard(built.comp)[:, :n_loc] == per_shard(ref.comp)[:, :n_loc]
    ).all()
    assert (np.asarray(built.aux_r) == np.asarray(ref.aux_r)).all()
    # per-shard GT fold + gathered merge ~ brute force (near-tie slack)
    assert (gt == gt_ref).mean() >= 0.99
    ids, _ = built.search(queries, 10, probes=16, shared=32, tile=32,
                          kk=64, shared_local=32, batch_size=64)
    from shine_tpu.io import recall_at_k

    assert recall_at_k(ids, gt_ref, 10) >= 0.9


def test_sharded_routed_fallback_spill(setup):
    """Starved grants spill SPMD too: narrow full-grant tiles with
    P_loc = P (no owned-lane overflow), identical guarantee to the
    single-chip spill."""
    idx, queries, gt = setup
    mesh = shard_mesh(8)
    sh = ShardedRoutedSplitIndex.from_single(idx, mesh)
    kw = dict(probes=8, shared=4, tile=64, kk=64, shared_local=4,
              batch_size=64)
    ids0, _ = sh.search(queries, 10, fallback=0, **kw)
    r0 = recall_at_k(ids0, gt, 10)
    assert sh.last_coverage < 0.9
    ids1, _ = sh.search(queries, 10, fallback=0.99, **kw)
    r1 = recall_at_k(ids1, gt, 10)
    assert sh.last_fallback > 0
    assert r1 >= r0
    assert r1 >= 0.9


def test_sharded_routed_overflow_triggers_spill(setup):
    """Full routing coverage but a starved per-shard window: the spill
    keys on the SCANNED fraction, so owner-overflow drops (invisible to
    the granted fraction) still trigger it and recall recovers."""
    idx, queries, gt = setup
    mesh = shard_mesh(8)
    sh = ShardedRoutedSplitIndex.from_single(idx, mesh)
    kw = dict(probes=16, shared=32, tile=32, kk=64, shared_local=2,
              batch_size=64)
    ids0, _ = sh.search(queries, 10, fallback=0, **kw)
    r0 = recall_at_k(ids0, gt, 10)
    assert sh.last_overflow > 0  # the starved window is real
    cov = sh.last_coverage
    ids1, _ = sh.search(queries, 10, fallback=0.9, **kw)
    r1 = recall_at_k(ids1, gt, 10)
    assert sh.last_coverage == cov  # routing unchanged
    assert sh.last_fallback > 0  # granted != scanned under overflow
    assert r1 >= max(r0, 0.9)


def test_sharded_routed_host_base_rerank():
    """Host-base mode (the CLI route): no row_source — the SPMD re-rank
    runs replicated from (vectors, sqnorms); recall vs exact GT holds
    and ids are original base rows."""
    import jax.numpy as jnp

    from shine_tpu.io import synthetic_dataset
    from shine_tpu.models.routed_split import build_routed_split

    ds = synthetic_dataset(n=20000, dim=16, num_queries=64, seed=29)
    idx = build_routed_split(
        ds.n, 16, base_dev=jnp.asarray(ds.base.astype(np.float32)),
        cap_target=640, seed=29, shards=8,
    )
    assert idx.row_source is None and idx.base_dev is not None
    mesh = shard_mesh(8)
    sh = ShardedRoutedSplitIndex.from_single(idx, mesh)
    assert sh.base is not None
    ids, dd = sh.search(ds.queries, 10, probes=16, shared=32, tile=32,
                        kk=64, batch_size=64)
    assert ids.max() < ds.n
    r = recall_at_k(ids, ds.ground_truth, 10)
    assert r >= 0.9, r
