from shine_tpu.parallel.fastflat_sharded import ShardedFastFlatIndex
from shine_tpu.parallel.flat_sharded import ShardedFlatIndex
from shine_tpu.parallel.ivf_sharded import ShardedIVFIndex
from shine_tpu.parallel.mesh import SHARD_AXIS, shard_mesh
from shine_tpu.parallel.placement import Placement, kmeans
from shine_tpu.parallel.router import AdaptiveQueryRouter, QueryRouter
from shine_tpu.parallel.routed_sharded import ShardedRoutedSplitIndex
from shine_tpu.parallel.sharded import (
    ShardedGraph,
    ShardedIndex,
    make_sharded_search,
    shard_graph,
)

__all__ = [
    "SHARD_AXIS",
    "Placement",
    "ShardedFlatIndex",
    "ShardedFastFlatIndex",
    "ShardedIVFIndex",
    "ShardedRoutedSplitIndex",
    "kmeans",
    "AdaptiveQueryRouter",
    "QueryRouter",
    "shard_mesh",
    "ShardedGraph",
    "ShardedIndex",
    "make_sharded_search",
    "shard_graph",
]
