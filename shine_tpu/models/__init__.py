from shine_tpu.models.hnsw import DeviceGraph, HNSWIndex, batched_search

__all__ = ["DeviceGraph", "HNSWIndex", "batched_search"]
