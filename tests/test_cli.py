"""CLI (reference main.cc / configuration.hh analogue) and workload
generation."""

import json

import numpy as np
import pytest


def run_cli(argv, capsys):
    from shine_tpu.cli import main

    rc = main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_flat_synthetic(capsys):
    doc = run_cli(
        ["--synthetic", "2000:16", "--index", "flat", "--num-queries", "100"],
        capsys,
    )
    assert doc["queries"]["recall"] == pytest.approx(1.0)
    assert doc["queries"]["num_queries"] == 100


def test_cli_hnsw_store_load(tmp_path, capsys):
    ckpt = str(tmp_path / "idx.npz")
    doc = run_cli(
        ["--synthetic", "2000:16", "--index", "hnsw", "-m", "8",
         "--ef-construction", "50", "--ef-search", "64",
         "--num-queries", "100", "--store-index", ckpt],
        capsys,
    )
    assert doc["queries"]["recall"] > 0.9
    doc2 = run_cli(
        ["--synthetic", "2000:16", "--index", "hnsw", "-m", "8",
         "--ef-construction", "50", "--ef-search", "64",
         "--num-queries", "100", "--load-index", ckpt],
        capsys,
    )
    assert doc2["queries"]["recall"] == doc["queries"]["recall"]
    assert "load_index_buffer" in doc2["timings"]


def test_cli_sharded_flat(capsys):
    doc = run_cli(
        ["--synthetic", "3000:16", "--index", "flat", "--shards", "4",
         "--num-queries", "64"],
        capsys,
    )
    assert doc["queries"]["recall"] == pytest.approx(1.0)
    assert doc["meta"]["num_shards"] == 4


def test_cli_zipf_workload(capsys):
    doc = run_cli(
        ["--synthetic", "2000:16", "--index", "flat", "--num-queries", "200",
         "--zipf", "1.0", "--warmup", "50", "--no-recall"],
        capsys,
    )
    assert doc["meta"]["zipf"] == 1.0
    assert "warmup" in doc["timings"]


def test_cli_zipf_recall_alignment(capsys):
    """Skewed workloads resample the query pool; recall must compare each
    resampled row against ITS pool row's ground truth (an exact index under
    any permutation/resampling scores 1.0 — misalignment scores ~0)."""
    doc = run_cli(
        ["--synthetic", "2000:16", "--index", "flat", "--num-queries", "200",
         "--zipf", "1.0", "--warmup", "50"],
        capsys,
    )
    assert doc["queries"]["recall"] == pytest.approx(1.0)


def test_zipf_skew_shape():
    from shine_tpu.io.skew import skewed_workload, zipf_ranks

    pool = np.arange(100, dtype=np.float32)[:, None].repeat(4, axis=1)
    w, t, idx = skewed_workload(pool, total=500, alpha=1.25, warmup=100, seed=3)
    assert w.shape == (100, 4) and t.shape == (500, 4)
    # skew: the most popular pool entry should dominate
    counts = np.bincount(idx, minlength=100)
    assert counts.max() > 5 * np.median(counts[counts > 0])
    # alpha=0 is uniform-ish
    r = zipf_ranks(100, 0.0, 5000, seed=1)
    c = np.bincount(r, minlength=100)
    assert c.max() < 3 * c.min() + 20


def test_cli_fast_build(capsys):
    doc = run_cli(
        ["--synthetic", "2000:16", "--index", "hnsw", "-m", "8",
         "--ef-construction", "50", "--ef-search", "64",
         "--num-queries", "100", "--fast-build"],
        capsys,
    )
    assert doc["queries"]["recall"] > 0.9


def test_cli_ivf_routed(capsys):
    doc = run_cli(
        ["--synthetic", "6000:16", "--index", "ivf", "--ivf-routed",
         "--probes", "8", "--ivf-shared", "48", "--ivf-tile", "64",
         "--num-queries", "200"],
        capsys,
    )
    assert doc["queries"]["recall"] > 0.9
    # routed cost counters are analytic and non-zero
    assert doc["queries"]["distance_computations"] > 0
    assert doc["queries"]["scanned_rows"] > 0


def test_cli_sharded_ivf_routed(capsys):
    doc = run_cli(
        ["--synthetic", "6000:16", "--index", "ivf", "--ivf-routed",
         "--probes", "8", "--ivf-shared", "48", "--ivf-tile", "32",
         "--shards", "4", "--num-queries", "200"],
        capsys,
    )
    assert doc["queries"]["recall"] > 0.9
    assert doc["queries"]["ici_exchange_bytes"] > 0


def test_cli_sharded_hnsw_compact_exchange(capsys):
    """--exchange compact serves over the bucketed all_to_all RPC and
    reports the measured (nonzero) ICI byte counter."""
    doc = run_cli(
        ["--synthetic", "3000:16", "--index", "hnsw", "-m", "8",
         "--ef-construction", "50", "--ef-search", "48", "--shards", "4",
         "--num-queries", "64", "--exchange", "compact"],
        capsys,
    )
    assert doc["queries"]["recall"] > 0.9
    assert doc["queries"]["ici_exchange_bytes"] > 0
