"""shine_tpu — a TPU-native distributed HNSW index-and-query engine.

From-scratch rebuild of the capabilities of SHINE (disaggregated-memory HNSW
over one-sided RDMA; reference at /root/reference, see SURVEY.md) designed
for TPU hardware: fixed-shape batched graph traversal under `jax.jit`,
MXU-friendly distance kernels (Pallas), index sharding across a
`jax.sharding.Mesh` with compute-at-data remote row gathers in place of RDMA
READs, hot-vertex replication in place of the compute-node cache, and
k-means query-to-shard routing.
"""

from shine_tpu.config import HNSWParams, SearchParams

__all__ = ["HNSWParams", "SearchParams"]
__version__ = "0.1.0"
