"""Pallas kernels (interpret mode on CPU; real lowering is exercised on
TPU by bench/verify runs)."""

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def table(rng):
    return jnp.asarray(rng.normal(size=(2000, 64)).astype(np.float32))


def test_gather_rows_matches_xla(table, rng):
    from shine_tpu.ops.pallas_gather import gather_rows_pallas

    ids = jnp.asarray(rng.integers(0, 2000, size=700).astype(np.int32))
    out = gather_rows_pallas(table, ids, blk=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(table)[np.asarray(ids)]
    )


def test_gather_rows_pads_tail(table, rng):
    from shine_tpu.ops.pallas_gather import gather_rows_pallas

    ids = jnp.asarray(rng.integers(0, 2000, size=100).astype(np.int32))
    out = gather_rows_pallas(table, ids, blk=64, interpret=True)
    assert out.shape == (100, 64)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(table)[np.asarray(ids)]
    )


def test_gather_rows_bf16(table, rng):
    from shine_tpu.ops.pallas_gather import gather_rows_pallas

    t16 = table.astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, 2000, size=256).astype(np.int32))
    out = gather_rows_pallas(t16, ids, blk=128, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(t16.astype(jnp.float32))[np.asarray(ids)],
    )


def test_blockmax_scan2_interpret(rng):
    """v2 fused scan (strided 32-row blocks, manual DMA) vs numpy."""
    import jax.numpy as jnp

    from shine_tpu.ops.pallas_scan2 import TN, blockmax_scan2

    ext = jnp.asarray(
        rng.normal(size=(2 * TN, 256)).astype(np.float32), dtype=jnp.bfloat16
    )
    q = jnp.asarray(
        rng.normal(size=(128, 256)).astype(np.float32), dtype=jnp.bfloat16
    )
    m1, a1 = blockmax_scan2(ext, q, tq=128, interpret=True)
    sc = np.asarray(q, dtype=np.float32) @ np.asarray(ext, dtype=np.float32).T
    scr = sc.reshape(128, 2, 32, 128)
    want_m = scr.max(axis=2).reshape(128, -1)
    np.testing.assert_allclose(np.asarray(m1), want_m, rtol=2e-2, atol=1e-1)
    # argmax rows: member m of block lane in chunk c -> c*TN + m*128 + lane
    am = scr.argmax(axis=2)  # (128, 2, 128)
    want_r = (
        np.arange(2)[None, :, None] * TN
        + am * 128
        + np.arange(128)[None, None, :]
    ).reshape(128, -1)
    got = np.asarray(a1)
    agree = (got == want_r).mean()
    assert agree > 0.999, agree  # ties may differ


def test_fast_flat_index_interpret():
    from shine_tpu.io import recall_at_k, synthetic_dataset
    from shine_tpu.models.flat import FastFlatIndex

    ds = synthetic_dataset(n=5000, dim=32, num_queries=128, seed=3)
    idx = FastFlatIndex(ds.base, tn=1024, interpret=True)
    ids, dd = idx.search(ds.queries, 10, kb=64, tq=128)
    assert recall_at_k(ids, ds.ground_truth, 10) > 0.98
    assert np.all(np.diff(dd, axis=1) >= -1e-3)


def test_fast_flat_ip_metric():
    from shine_tpu.io import recall_at_k, synthetic_dataset
    from shine_tpu.models.flat import FastFlatIndex

    ds = synthetic_dataset(n=4096, dim=32, num_queries=64, seed=5, metric="ip")
    idx = FastFlatIndex(ds.base, metric="ip", tn=1024, interpret=True)
    ids, _ = idx.search(ds.queries, 10, kb=64, tq=64)
    assert recall_at_k(ids, ds.ground_truth, 10) > 0.97


def test_classmax2_scan_interpret(rng):
    """v4 class-max + runner-up vs a numpy top-2-per-class oracle."""
    from shine_tpu.ops.pallas_scan3 import classmax2_scan

    tn, cls, tq = 512, 128, 64
    ext = jnp.asarray(
        rng.normal(size=(4 * tn, 256)).astype(np.float32), dtype=jnp.bfloat16
    )
    q = jnp.asarray(
        rng.normal(size=(tq, 256)).astype(np.float32), dtype=jnp.bfloat16
    )
    m1, a1, m2, a2 = classmax2_scan(
        ext, q, tq=tq, tn=tn, cls=cls, interpret=True
    )
    sc = np.asarray(q, np.float32) @ np.asarray(ext, np.float32).T  # (tq, N)
    # row r belongs to class (r % tn) % cls... under the strided layout
    # class = (r % tn) % cls? No: lane = r % cls within its member row:
    # row = c*tn + m*cls + lane -> class = row % cls
    cls_of = np.arange(4 * tn) % cls
    want1 = np.full((tq, cls), -np.inf, np.float32)
    want2 = np.full((tq, cls), -np.inf, np.float32)
    for c in range(cls):
        cols = np.where(cls_of == c)[0]
        s = np.sort(sc[:, cols], axis=1)
        want1[:, c] = s[:, -1]
        want2[:, c] = s[:, -2]
    np.testing.assert_allclose(np.asarray(m1), want1, rtol=2e-2, atol=1e-1)
    np.testing.assert_allclose(np.asarray(m2), want2, rtol=2e-2, atol=1e-1)
    # ids must point at rows of the right class and score
    got1 = np.take_along_axis(
        sc, np.asarray(a1), axis=1
    )
    np.testing.assert_allclose(got1, np.asarray(m1), rtol=1e-5, atol=1e-5)
    got2 = np.take_along_axis(sc, np.asarray(a2), axis=1)
    np.testing.assert_allclose(got2, np.asarray(m2), rtol=1e-5, atol=1e-5)
    assert (np.asarray(a1) != np.asarray(a2)).all()


def test_fastflat_keep2_recall_adversarial(rng):
    """Small cls (many rows per class) loses near-tie neighbors; keep2
    must recover them. Uses the interpret path? No — keep2 routes v4,
    which interpret-executes too (FastFlatIndex(interpret=True) uses v1);
    call the jit path directly in interpret via fast_flat_search."""
    import jax.numpy as jnp2

    from shine_tpu.models.flat import FastFlatIndex, FlatIndex

    n, d = 8192, 32
    base = rng.normal(size=(n, d)).astype(np.float32)
    queries = base[rng.integers(0, n, 64)] + 0.01 * rng.normal(
        size=(64, d)
    ).astype(np.float32)
    exact = FlatIndex(base)
    gt, _ = exact.search(queries, 10, use_bf16=False)
    fast = FastFlatIndex(base, interpret=True)
    # interpret path ignores keep2 (v1 blockmax already keeps 2/block) —
    # assert the API accepts it and recall holds
    ids, _ = fast.search(queries, 10, kb=32, cls=256, keep2=True)
    from shine_tpu.io import recall_at_k

    assert recall_at_k(ids, np.asarray(gt), 10) > 0.9


def test_classmax_topk_scan_fused_identity(rng):
    """v5 fused select (in-kernel exact top-kb epilogue) must be
    BIT-IDENTICAL to classmax_scan + lax.top_k + take_along_axis —
    same first-lane tie semantics — for both keep1 and keep2."""
    import jax

    from shine_tpu.ops.pallas_scan3 import (
        classmax2_scan,
        classmax2_topk_scan,
        classmax_scan,
        classmax_topk_scan,
    )

    n_pad, dp, B, cls, tn, tq, kb = 8192, 128, 256, 512, 2048, 128, 32
    ext = jnp.asarray(rng.normal(size=(n_pad, dp)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, dp)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    m1, a1 = classmax_scan(ext, q, tq=tq, tn=tn, cls=cls, interpret=True)
    ms, sel = jax.lax.top_k(m1, kb)
    ref_rows = jnp.take_along_axis(a1, sel, axis=1)
    mf, rf = classmax_topk_scan(
        ext, q, kb=kb, tq=tq, tn=tn, cls=cls, interpret=True
    )
    assert (np.asarray(mf) == np.asarray(ms)).all()
    assert (np.asarray(rf) == np.asarray(ref_rows)).all()

    m1, a1, m2, a2 = classmax2_scan(
        ext, q, tq=tq, tn=tn, cls=cls, interpret=True
    )
    ms, sel = jax.lax.top_k(m1, kb)
    c1 = jnp.take_along_axis(a1, sel, axis=1)
    c2 = jnp.take_along_axis(a2, sel, axis=1)
    v2 = jnp.take_along_axis(m2, sel, axis=1)
    mf, rf, m2f, r2f = classmax2_topk_scan(
        ext, q, kb=kb, tq=tq, tn=tn, cls=cls, interpret=True
    )
    assert (np.asarray(mf) == np.asarray(ms)).all()
    assert (np.asarray(rf) == np.asarray(c1)).all()
    assert (np.asarray(m2f) == np.asarray(v2)).all()
    assert (np.asarray(r2f) == np.asarray(c2)).all()
