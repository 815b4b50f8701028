"""Device-resident synthetic datasets for beyond-host-scale validation.

The reference validates on big-ann files staged on NFS near the nodes
(io/read_data.hh, scripts/data/download.sh). This environment has no
egress and a ~20 MB/s host<->device tunnel, so a 10M x 128 base (5 GB)
cannot reasonably round-trip the host. This module generates the same
mixture-of-Gaussians family as io/datasets.synthetic_dataset directly in
HBM (chunked, so peak extra memory is one chunk), and computes exact
ground truth on-device with the f32 flat scan. Only queries and ground
truth ids (a few MB) ever touch the host.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DeviceDataset:
    base_dev: jnp.ndarray  # (n, d) f32, device-resident
    queries: np.ndarray  # (q, d) f32, host
    ground_truth: np.ndarray | None  # (q, k) i32, host
    metric: str = "l2"
    name: str = "device-synth"

    @property
    def n(self) -> int:
        return self.base_dev.shape[0]


@partial(jax.jit, static_argnames=("n", "dim", "rchunk", "normalize"))
def _gen_base(key, centers, *, n: int, dim: int, rchunk: int,
              normalize: bool):
    """Chunked mixture-of-Gaussians base: scan stacks bf16-free f32 chunks
    straight into the (n, dim) output, so generation never holds more than
    output + one chunk."""
    nc = centers.shape[0]
    ks = jax.random.split(key, n // rchunk)

    def body(_, kc):
        ka, kn = jax.random.split(kc)
        assign = jax.random.randint(ka, (rchunk,), 0, nc)
        x = centers[assign] + jax.random.normal(kn, (rchunk, dim), jnp.float32)
        if normalize:
            x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-30)
        return None, x

    _, base = jax.lax.scan(body, None, ks)
    return base.reshape(n, dim)


def device_synthetic_dataset(
    n: int = 10_000_000,
    dim: int = 128,
    num_queries: int = 2048,
    *,
    metric: str = "l2",
    num_clusters: int = 64,
    seed: int = 0,
    gt_k: int = 10,
    compute_gt: bool = True,
    rchunk: int = 65536,
) -> DeviceDataset:
    """Mixture-of-Gaussians base generated in HBM; queries drawn near base
    rows; exact f32 ground truth computed on-device (FlatIndex bf16-free).
    n is rounded up to a multiple of 4096 (the fused-scan quantum) so the
    device constructors never need a padding copy."""
    n = -(-n // 4096) * 4096
    while n % rchunk:
        rchunk //= 2
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 4)
    centers = jax.random.normal(k0, (num_clusters, dim), jnp.float32) * 4.0
    base = _gen_base(
        k1, centers, n=n, dim=dim, rchunk=rchunk, normalize=(metric == "ip")
    )
    qidx = jax.random.randint(k2, (num_queries,), 0, n)
    queries = base[qidx] + 0.3 * jax.random.normal(
        k3, (num_queries, dim), jnp.float32
    )
    if metric == "ip":
        queries = queries / (
            jnp.linalg.norm(queries, axis=1, keepdims=True) + 1e-30
        )
    queries_np = np.asarray(queries)
    gt = None
    if compute_gt:
        from shine_tpu.models.flat import FlatIndex

        flat = FlatIndex.from_device(base, metric, with_bf16=False)
        gt, _ = flat.search(queries_np, gt_k, use_bf16=False)
        del flat
    return DeviceDataset(
        base_dev=base,
        queries=queries_np,
        ground_truth=gt,
        metric=metric,
        name=f"device-synth-{n}x{dim}",
    )
