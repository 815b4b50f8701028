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
