from shine_tpu.models.build import device_build_graph, init_build_state, insert_round
from shine_tpu.models.dynamic import DynamicHNSWIndex
from shine_tpu.models.fastbuild import fast_build_graph
from shine_tpu.models.hnsw import DeviceGraph, HNSWIndex, batched_search

__all__ = [
    "DeviceGraph",
    "HNSWIndex",
    "batched_search",
    "device_build_graph",
    "fast_build_graph",
    "DynamicHNSWIndex",
    "init_build_state",
    "insert_round",
]
