import jax.numpy as jnp
import numpy as np
import pytest

from shine_tpu.config import METRIC_IP, METRIC_L2
from shine_tpu.ops import (
    beam_init,
    beam_merge,
    candidate_distance,
    hashset_check_insert,
    hashset_init,
    pairwise_distance,
    squared_norms,
)
from shine_tpu.ops.beam import beam_frontier, beam_mark_expanded


def test_pairwise_l2_matches_numpy(rng):
    q = rng.normal(size=(8, 32)).astype(np.float32)
    p = rng.normal(size=(64, 32)).astype(np.float32)
    got = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(p), METRIC_L2))
    want = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-2)


def test_pairwise_ip_matches_numpy(rng):
    q = rng.normal(size=(8, 32)).astype(np.float32)
    p = rng.normal(size=(64, 32)).astype(np.float32)
    got = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(p), METRIC_IP))
    want = 1.0 - q @ p.T
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_candidate_distance_matches_pairwise(rng):
    q = rng.normal(size=(4, 16)).astype(np.float32)
    p = rng.normal(size=(32, 16)).astype(np.float32)
    idx = rng.integers(0, 32, size=(4, 7))
    cand = p[idx]
    got = np.asarray(
        candidate_distance(jnp.asarray(q), jnp.asarray(cand), METRIC_L2)
    )
    full = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(p), METRIC_L2))
    want = np.take_along_axis(full, idx, axis=1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-2)


def test_candidate_distance_with_precomputed_norms(rng):
    q = rng.normal(size=(4, 16)).astype(np.float32)
    cand = rng.normal(size=(4, 7, 16)).astype(np.float32)
    cn = np.asarray(squared_norms(jnp.asarray(cand)))
    got = np.asarray(
        candidate_distance(
            jnp.asarray(q), jnp.asarray(cand), METRIC_L2, cand_sqnorm=jnp.asarray(cn)
        )
    )
    want = ((q[:, None, :] - cand) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-2)


class TestHashset:
    def test_insert_then_found(self):
        t = hashset_init(2, 64)
        ids = jnp.asarray([[3, 5, 9], [7, 7, -1]], dtype=jnp.int32)
        t, new = hashset_check_insert(t, ids)
        assert new.tolist() == [[True, True, True], [True, False, False]]
        # second round: everything already present / invalid
        t, new2 = hashset_check_insert(t, ids)
        assert not np.asarray(new2).any()

    def test_many_inserts_low_false_negative(self, rng):
        t = hashset_init(1, 1024)
        ids = rng.choice(10_000, size=400, replace=False).astype(np.int32)
        seen = set()
        misses = 0
        for lo in range(0, 400, 16):
            chunk = jnp.asarray(ids[lo : lo + 16][None, :])
            t, new = hashset_check_insert(t, chunk)
            for i, flag in zip(ids[lo : lo + 16].tolist(), np.asarray(new)[0]):
                if i in seen and flag:
                    misses += 1  # revisit allowed but should be rare
                seen.add(i)
        assert misses == 0  # unique ids -> no repeats at all

    def test_repeat_across_steps_filtered(self):
        t = hashset_init(1, 256)
        t, new = hashset_check_insert(t, jnp.asarray([[11, 22]], dtype=jnp.int32))
        t, new = hashset_check_insert(t, jnp.asarray([[22, 33]], dtype=jnp.int32))
        assert np.asarray(new)[0].tolist() == [False, True]


class TestBeam:
    def test_merge_keeps_best_sorted(self):
        b = beam_init(1, 4)
        b = beam_merge(
            b,
            jnp.asarray([[5.0, 1.0, 3.0]]),
            jnp.asarray([[50, 10, 30]], dtype=jnp.int32),
        )
        assert b.ids[0].tolist() == [10, 30, 50, -1]
        assert b.dists[0].tolist()[:3] == [1.0, 3.0, 5.0]
        assert b.expanded[0].tolist() == [False, False, False, True]

    def test_merge_eviction_and_tiebreak(self):
        b = beam_init(1, 3)
        b = beam_merge(
            b,
            jnp.asarray([[2.0, 2.0, 1.0, 9.0]]),
            jnp.asarray([[7, 4, 2, 8]], dtype=jnp.int32),
        )
        # tie at dist 2.0 broken by id: 4 before 7
        assert b.ids[0].tolist() == [2, 4, 7]

    def test_frontier_and_expand_cycle(self):
        b = beam_init(2, 3)
        b = beam_merge(
            b,
            jnp.asarray([[3.0, 1.0], [4.0, 2.0]]),
            jnp.asarray([[30, 10], [40, 20]], dtype=jnp.int32),
        )
        slot, fid, active = beam_frontier(b)
        assert fid.tolist() == [10, 20]
        assert active.tolist() == [True, True]
        b = beam_mark_expanded(b, slot, active)
        slot, fid, active = beam_frontier(b)
        assert fid.tolist() == [30, 40]
        b = beam_mark_expanded(b, slot, active)
        _, fid, active = beam_frontier(b)
        assert active.tolist() == [False, False]
        assert fid.tolist() == [-1, -1]

    def test_masked_candidates_ignored(self):
        b = beam_init(1, 2)
        b = beam_merge(
            b,
            jnp.asarray([[0.5, 0.1]]),
            jnp.asarray([[5, -1]], dtype=jnp.int32),
        )
        assert b.ids[0].tolist() == [5, -1]


def test_recall_and_bruteforce(rng):
    from shine_tpu.io import brute_force_knn, recall_at_k

    base = rng.normal(size=(500, 16)).astype(np.float32)
    q = rng.normal(size=(20, 16)).astype(np.float32)
    ids, dists = brute_force_knn(base, q, 10, metric="l2", chunk=128)
    # check against direct computation
    full = ((q[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    want = np.argsort(full, axis=1)[:, :10]
    assert recall_at_k(ids, want.astype(np.int32), 10) == pytest.approx(1.0)
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_fbin_roundtrip(tmp_path, rng):
    from shine_tpu.io import read_bin, write_bin, read_bin_header

    arr = rng.normal(size=(10, 4)).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    write_bin(p, arr)
    assert read_bin_header(p) == (10, 4)
    np.testing.assert_array_equal(read_bin(p), arr)
    got = read_bin(p, row_filter=(1, 3))
    np.testing.assert_array_equal(got, arr[1::3])


def test_u8bin_widens(tmp_path, rng):
    from shine_tpu.io import read_bin, write_bin

    arr = rng.integers(0, 255, size=(6, 8)).astype(np.uint8)
    p = str(tmp_path / "x.u8bin")
    write_bin(p, arr)
    got = read_bin(p)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, arr.astype(np.float32))


class TestBeamDedupMultiFrontier:
    def test_merge_dedups_duplicate_candidates(self):
        import jax.numpy as jnp
        from shine_tpu.ops.beam import beam_init, beam_merge

        beam = beam_init(1, 4)
        beam = beam_merge(
            beam,
            jnp.array([[1.0, 1.0, 2.0, 2.0]]),
            jnp.array([[7, 7, 9, 9]], dtype=jnp.int32),
        )
        assert beam.ids[0].tolist() == [7, 9, -1, -1]

    def test_merge_keeps_expanded_flag_of_duplicate(self):
        """Re-discovering an already-expanded in-beam node must not reset
        its expanded flag (the no-revisit guarantee)."""
        import jax.numpy as jnp
        from shine_tpu.ops.beam import beam_init, beam_mark_expanded, beam_merge

        beam = beam_init(1, 4)
        beam = beam_merge(
            beam, jnp.array([[1.0]]), jnp.array([[7]], dtype=jnp.int32)
        )
        beam = beam_mark_expanded(
            beam, jnp.array([0], dtype=jnp.int32), jnp.array([True])
        )
        beam = beam_merge(
            beam, jnp.array([[1.0, 3.0]]), jnp.array([[7, 8]], dtype=jnp.int32)
        )
        assert beam.ids[0].tolist() == [7, 8, -1, -1]
        assert bool(beam.expanded[0, 0])  # 7 stays expanded
        assert not bool(beam.expanded[0, 1])

    def test_evicted_node_cannot_reenter(self):
        """Monotone beam: once evicted, a node is worse than the ef-th
        entry forever, so merging it again must not displace anything."""
        import jax.numpy as jnp
        from shine_tpu.ops.beam import beam_init, beam_merge

        beam = beam_init(1, 2)
        beam = beam_merge(
            beam, jnp.array([[1.0, 2.0, 9.0]]), jnp.array([[1, 2, 3]], dtype=jnp.int32)
        )  # 3 evicted
        beam = beam_merge(beam, jnp.array([[9.0]]), jnp.array([[3]], dtype=jnp.int32))
        assert beam.ids[0].tolist() == [1, 2]

    def test_frontier_multi_picks_nearest_unexpanded(self):
        import jax.numpy as jnp
        from shine_tpu.ops.beam import Beam, beam_frontier_multi

        beam = Beam(
            dists=jnp.array([[1.0, 2.0, 3.0, 4.0]]),
            ids=jnp.array([[10, 11, 12, 13]], dtype=jnp.int32),
            expanded=jnp.array([[True, False, True, False]]),
        )
        slots, fids, active = beam_frontier_multi(beam, 2)
        assert slots[0].tolist() == [1, 3]
        assert fids[0].tolist() == [11, 13]
        assert active[0].tolist() == [True, True]

    def test_frontier_multi_partial(self):
        import jax.numpy as jnp
        from shine_tpu.ops.beam import Beam, beam_frontier_multi

        beam = Beam(
            dists=jnp.array([[1.0, 2.0]]),
            ids=jnp.array([[10, 11]], dtype=jnp.int32),
            expanded=jnp.array([[True, False]]),
        )
        _, fids, active = beam_frontier_multi(beam, 4)
        assert fids[0].tolist() == [11, -1, -1, -1]
        assert active[0].tolist() == [True, False, False, False]


def test_recall_at_k_eps_near_ties():
    """Id recall punishes swaps among physically-equal neighbors; the
    distance-tolerance metric must not (io/recall.py:recall_at_k_eps)."""
    import jax.numpy as jnp

    from shine_tpu.io import recall_at_k, recall_at_k_eps

    rng = np.random.default_rng(5)
    base = rng.normal(size=(100, 8)).astype(np.float32)
    base[1] = base[0] + 1e-6  # exact near-tie pair
    q = (base[0] + 0.01 * rng.normal(size=8)).astype(np.float32)[None]
    d = ((base - q) ** 2).sum(1)
    gt = np.argsort(d)[None, :3]
    found = gt.copy()
    found[0, 0], found[0, 1] = gt[0, 1], gt[0, 0]  # swap the tied pair
    found[0, 2] = 99 if gt[0, 2] != 99 else 98  # one genuinely wrong row
    idr = recall_at_k(found, gt, 3)
    epr = recall_at_k_eps(found, q, jnp.asarray(base), gt, 3, rtol=1e-3)
    assert abs(idr - 2 / 3) < 1e-9  # swap forgiven by set-recall, wrong row not
    assert abs(epr - 2 / 3) < 1e-9 or epr > idr  # tolerant metric >= id metric
    # the tied pair passes the tolerance; the wrong row fails it
    assert epr == 2 / 3
