"""Device-resident ingestion: dataset generation, ext-table packing, and
IVF layout built without the base ever visiting the host (the 10M-row
path — the dev tunnel moves ~20 MB/s, so host round trips are the
bottleneck the reference never had; its NFS + RDMA read path is
io/read_data.hh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shine_tpu.io import recall_at_k
from shine_tpu.io.device_synth import device_synthetic_dataset
from shine_tpu.models.flat import FastFlatIndex, FlatIndex, _pack_ext_device
from shine_tpu.models.ivf import IVFIndex


@pytest.fixture(scope="module")
def dds():
    return device_synthetic_dataset(n=8192, dim=32, num_queries=128, seed=3)


def test_device_gt_matches_host_flat(dds):
    """On-device exact GT == host-built exact flat scan."""
    base_np = np.asarray(dds.base_dev)
    host = FlatIndex(base_np)
    ids, _ = host.search(dds.queries, 10, use_bf16=False)
    assert recall_at_k(ids, dds.ground_truth, 10) == pytest.approx(1.0)


def test_flat_from_device_exact(dds):
    idx = FlatIndex.from_device(dds.base_dev, with_bf16=False)
    ids, _ = idx.search(dds.queries, 10, use_bf16=False)
    assert recall_at_k(ids, dds.ground_truth, 10) == pytest.approx(1.0)


def test_pack_ext_device_matches_host(dds):
    """The on-device bf16 ext packing must equal the host packer bit-for
    bit (same scan results depend on it)."""
    from shine_tpu.config import METRIC_L2
    from shine_tpu.ops.pallas_scan import pack_ext_table

    base_np = np.asarray(dds.base_dev)
    n, d = base_np.shape
    dp = -(-(d + 1) // 128) * 128
    host_ext = jnp.asarray(
        pack_ext_table(base_np, METRIC_L2, n), dtype=jnp.bfloat16
    )
    dev_ext = _pack_ext_device(dds.base_dev, metric=METRIC_L2, dp=dp)
    assert dev_ext.shape == host_ext.shape
    np.testing.assert_array_equal(
        np.asarray(dev_ext, np.float32), np.asarray(host_ext, np.float32)
    )


def test_fastflat_from_device_requires_quantum(dds):
    with pytest.raises(ValueError):
        FastFlatIndex.from_device(dds.base_dev[:1000])


def test_fastflat_from_device_shuffle_perm(dds):
    idx = FastFlatIndex.from_device(dds.base_dev, shuffle=True, seed=5)
    assert idx.perm is not None and len(idx.perm) == dds.n
    assert sorted(idx.perm.tolist()) == list(range(dds.n))
    # shuffled vectors match base[perm]
    np.testing.assert_array_equal(
        np.asarray(idx.vectors[:64]), np.asarray(dds.base_dev)[idx.perm[:64]]
    )


def test_ivf_from_device_recall(dds):
    idx = IVFIndex.from_device(
        dds.base_dev, num_clusters=64, train_size=8192, iters=15, seed=7,
        fill_chunk=16,
    )
    ids, _ = idx.search(dds.queries, 10, probes=8)
    assert recall_at_k(ids, dds.ground_truth, 10) > 0.9
    # lossless partition
    bids = np.asarray(idx.data.block_ids)
    real = bids[bids >= 0]
    assert sorted(real.tolist()) == list(range(dds.n))


def test_ivf_from_device_routed(dds):
    idx = IVFIndex.from_device(
        dds.base_dev, num_clusters=64, train_size=8192, iters=15, seed=7,
        fill_chunk=16,
    )
    ids, _, stats = idx.search_routed(
        dds.queries, 10, probes=8, shared=48, tile=32, with_stats=True
    )
    assert recall_at_k(ids, dds.ground_truth, 10) > 0.9
    assert stats["probe_coverage"] > 0.8
