from shine_tpu.graph.soa import GraphSoA, build_graph, host_search

__all__ = ["GraphSoA", "build_graph", "host_search"]
