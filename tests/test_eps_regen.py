"""recall_at_k_eps_regen: the capacity-scale eps-recall scorer must agree
exactly with the base-resident recall_at_k_eps when the regenerated rows
ARE the base (io/device_synth.py rows are pure functions of global id)."""

import jax
import jax.numpy as jnp
import numpy as np

from shine_tpu.io.device_synth import regen_rows
from shine_tpu.io.recall import (
    brute_force_knn,
    recall_at_k_eps,
    recall_at_k_eps_regen,
)


def test_eps_regen_matches_resident_base():
    key = jax.random.PRNGKey(21)
    centers = jax.random.normal(jax.random.PRNGKey(2), (8, 12)) * 4.0
    n, k = 4096, 10
    base = np.asarray(regen_rows(key, centers, jnp.arange(n, dtype=jnp.int32)))
    rng = np.random.default_rng(3)
    queries = base[rng.integers(0, n, size=64)] + 0.3 * rng.normal(
        size=(64, 12)
    ).astype(np.float32)
    gt, _ = brute_force_knn(base, queries, k)

    # a deliberately imperfect result set: half the rows from GT, half
    # random — both scorers must award the same tolerance hits
    found = gt[:, :k].copy()
    found[:, k // 2:] = rng.integers(0, n, size=(64, k - k // 2))

    r_res = recall_at_k_eps(
        found, queries, jnp.asarray(base), gt, k, rtol=1e-4
    )
    r_rg = recall_at_k_eps_regen(
        found, queries, (key, centers), gt, k, rtol=1e-4
    )
    assert r_rg == r_res
    assert 0.5 <= r_rg <= 1.0

    # perfect ids score 1.0; rtol=inf scores everything
    assert recall_at_k_eps_regen(
        gt[:, :k], queries, (key, centers), gt, k
    ) == 1.0
    assert recall_at_k_eps_regen(
        found, queries, (key, centers), gt, k, rtol=1e30
    ) == 1.0


def test_margin_mask_matches_numpy_and_regen():
    """margin_mask == the numpy definition (d(k+1) > (1+rtol) d(k) on
    exact distances), and the regen variant agrees with the resident
    one when regenerated rows ARE the base."""
    from shine_tpu.io.recall import margin_mask

    key = jax.random.PRNGKey(7)
    centers = jax.random.normal(jax.random.PRNGKey(4), (8, 12)) * 4.0
    n, k = 4096, 10
    base = np.asarray(regen_rows(key, centers, jnp.arange(n, dtype=jnp.int32)))
    rng = np.random.default_rng(9)
    queries = base[rng.integers(0, n, size=64)] + 0.3 * rng.normal(
        size=(64, 12)
    ).astype(np.float32)
    gt, gd = brute_force_knn(base, queries, k + 1)

    rtol = 1e-3
    want = gd[:, k] > gd[:, k - 1] * (1.0 + rtol) + 1e-12
    m_res = margin_mask(queries, jnp.asarray(base), gt, k, rtol=rtol)
    m_rg = margin_mask(
        queries, None, gt, k, rtol=rtol, row_source=(key, centers)
    )
    np.testing.assert_array_equal(m_res, want)
    np.testing.assert_array_equal(m_rg, want)
    assert m_res.any()  # the fixture has real-margin queries

    # an exact searcher scores id-recall 1.0 on margin queries
    from shine_tpu.io.recall import recall_at_k

    assert recall_at_k(gt[m_res, :k], gt[m_res, :k], k) == 1.0
