#!/usr/bin/env python
"""Routing-only coverage study for the routed split knobs — no chip.

Coverage (granted wish fraction) is a pure function of the ROUTING
stage: centroids, the affinity sort, and the (p, P, T) grant — none of
which touch the scan kernel, so the whole study runs on CPU at the real
dataset geometry (row-keyed PRNG recipe, seed 17, the exact
scale_capacity_routed.py distribution). Output picks the on-chip sweep
knobs: for each (C_target, p, P, T) the granted fraction, per-query
grant floor (min), and the fraction of queries that would spill at
fallback=0.5.

Run: JAX_PLATFORMS=cpu forced internally. Appends
results/route_coverage.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

OUT = os.path.join(ROOT, "results", "route_coverage.jsonl")
D = 128
NQ = 2048
SEED = 17
TRAIN = int(os.environ.get("SHINE_RC_TRAIN", 131_072))  # builder default
BIG = os.environ.get("SHINE_RC_BIG", "") == "1"


def emit(rec: dict) -> None:
    print("#", json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main() -> None:
    from shine_tpu.io.device_synth import regen_rows
    from shine_tpu.models.ivf import _lloyd_chunked, _spatial_order_centroids
    from shine_tpu.models.routed_split import _route_cols
    from shine_tpu.ops.distance import pairwise_distance

    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(SEED), 4)
    centers = jax.random.normal(k0, (64, D), jnp.float32) * 4.0

    # geometries: (label, N, C, lloyd iters) — C from the builder's rule
    # at cap=4096 (ceil(1.05*N/4096)); iters shrink with C to keep the
    # 1-core k-means tractable (centroid QUALITY matches the builder's
    # training budget, which is itself 131k rows at any N)
    geoms = [
        ("4.2M", 4_194_304, 1_076, 8),
        ("41.9M", 41_943_040, 10_752, 4),
    ]
    if BIG:
        geoms.append(("100.7M", 100_663_296, 25_805, 2))
    # SHINE_RC_CENTS=random: centroids = sampled dataset rows (Lloyd
    # with 0 iterations) — the only way to reach the 0.8B-class C~206k
    # geometry on this 1-core host (Lloyd at C=206k is hours). Run the
    # trained geometries under random too for the calibration delta.
    RAND = os.environ.get("SHINE_RC_CENTS") == "random"
    if RAND:
        geoms = [(lb + "-rc", N, C, 0) for lb, N, C, _ in geoms]
        if os.environ.get("SHINE_RC_08B") == "1":
            # 8 chips x the measured 100.66M/chip split envelope
            geoms.append(("0.8B-rc", 805_306_368, 206_387, 0))
    if os.environ.get("SHINE_RC_GEOM"):
        want = os.environ["SHINE_RC_GEOM"].split(",")
        geoms = [g for g in geoms if g[0] in want]
    for label, N, C, ITERS in geoms:
        qidx = jax.random.randint(k2, (NQ,), 0, N)
        anchors = regen_rows(k1, centers, qidx)
        queries = np.asarray(
            anchors + 0.3 * jax.random.normal(k3, (NQ, D), jnp.float32)
        )
        t0 = time.time()
        if RAND:
            cids = jax.random.randint(
                jax.random.PRNGKey(SEED + 1), (C,), 0, N, dtype=jnp.int32
            )
            cents = np.asarray(regen_rows(k1, centers, cids))
        else:
            tids = jax.random.randint(
                jax.random.PRNGKey(SEED), (TRAIN,), 0, N, dtype=jnp.int32
            )
            x_train = regen_rows(k1, centers, tids)
            cents = np.asarray(
                _lloyd_chunked(x_train, k=C, iters=ITERS, seed=SEED)
            )
        cents = jnp.asarray(cents[_spatial_order_centroids(cents, SEED)])
        print(f"# {label}: C={C} centroids in {time.time()-t0:.0f}s",
              flush=True)

        q = jnp.asarray(queries)
        scores1 = pairwise_distance(q, cents, 0)
        _, probes_full = jax.lax.top_k(-scores1, 64)

        for p in (16, 32, 64):
            pr = probes_full[:, :p]
            if p > 1:
                perm = jnp.argsort(pr[:, 1], stable=True)
                perm = perm[jnp.argsort(pr[perm, 0], stable=True)]
            else:
                perm = jnp.argsort(pr[:, 0], stable=True)
            pr_s = pr[perm]
            for T in (32, 64, 128):
                G = NQ // T
                p_grid = (48, 96, 128, 192, 256)
                if C > 100_000:  # 0.8B-class grants need a wider sweep
                    p_grid = (96, 192, 256, 384, 512)
                for P in p_grid:
                    if P < p or P > C:
                        continue
                    _, cov, q_g = _route_cols(
                        pr_s.reshape(G, T, p), int(C), P
                    )
                    q_g = np.asarray(q_g)
                    emit({
                        "geom": label, "N": N, "C": int(C), "p": p,
                        "P": P, "T": T,
                        "coverage": round(float(np.asarray(cov)), 4),
                        "q_granted_min": round(float(q_g.min()), 4),
                        "spill_frac_at_0.5": round(
                            float((q_g < 0.5).mean()), 4),
                        "scan_rows_per_tile": P * 4096,
                    })


if __name__ == "__main__":
    main()
