"""Zipf-skewed query workload generation.

Port of the reference's workload tooling (/root/reference/scripts/data/
skew.py, create_queries.py): benchmark workloads draw from a query pool
with Zipf(alpha) popularity (alpha in {0, 0.5, 0.75, 1.0, 1.25, 1.5}),
with a warmup split used to heat the cache before the timed run
(compute_node.cc:116-131).
"""

from __future__ import annotations

import numpy as np


def zipf_ranks(n_ranks: int, alpha: float, size: int, seed: int = 0) -> np.ndarray:
    """Sample `size` ranks in [0, n_ranks) with P(r) ∝ 1/(r+1)^alpha.
    alpha=0 is uniform."""
    rng = np.random.default_rng(seed)
    if alpha <= 0:
        return rng.integers(0, n_ranks, size=size)
    w = 1.0 / np.power(np.arange(1, n_ranks + 1, dtype=np.float64), alpha)
    p = w / w.sum()
    return rng.choice(n_ranks, size=size, p=p)


def skewed_workload(
    query_pool: np.ndarray,  # (P, d) distinct queries
    total: int,
    alpha: float,
    *,
    warmup: int = 0,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (warmup_queries, timed_queries, pool_indices_of_timed).

    Pool entries are ranked by a random permutation (so popularity is not
    correlated with id, like the reference's shuffle) and drawn with
    Zipf(alpha) popularity."""
    P = query_pool.shape[0]
    rng = np.random.default_rng(seed + 1)
    perm = rng.permutation(P)  # rank -> pool index
    ranks = zipf_ranks(P, alpha, total + warmup, seed=seed)
    idx = perm[ranks]
    w, t = idx[:warmup], idx[warmup:]
    return query_pool[w], query_pool[t], t
