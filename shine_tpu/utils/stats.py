"""Run statistics with the reference's JSON result schema.

The reference emits one JSON document per run from the initiator
(/root/reference/src/common/statistics.hh:14-62, compute_node.cc:478-564):
`meta` (cluster shape, dataset, labels), `hnsw_parameters`, build/query
counters (distcomps, bytes moved, visited nodes, cache hits), QPS, recall,
and `timings`. This module reproduces that schema for the TPU runtime so
downstream tooling (the exp_*/fetch_* analogue in scripts/) can consume
either system's output.

Counter semantics on TPU: per-thread counters summed across CNs become
per-batch on-device accumulators (hops = frontier expansions ~ visited
nodes; distance computations = expansions x candidate lanes; HBM/ICI bytes
are computed analytically from the traversal shape instead of being counted
at the wire like rdma_reads_in_bytes, statistics.hh:152-158).
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any

from shine_tpu.config import HNSWParams, SearchParams


@dataclasses.dataclass
class SearchStats:
    """Aggregated query-phase counters (ThreadStatistics analogue,
    statistics.hh:148-175)."""

    num_queries: int = 0
    expansions: int = 0  # frontier expansions (~ visited nodes on L0)
    distance_computations: int = 0
    scanned_rows: int = 0  # dense-scan rows scored (flat/ivf families)
    steps: int = 0  # sequential traversal steps executed
    hbm_gather_bytes: int = 0
    ici_exchange_bytes: int = 0
    cache_hits: int = 0
    cache_misses: int = 0
    query_seconds: float = 0.0
    recall: float | None = None

    def add_batch(
        self,
        batch: int,
        hops_sum: int,
        steps: int,
        cand_lanes: int,
        row_bytes: int,
        seconds: float,
        ici_bytes: int = 0,
    ) -> None:
        self.num_queries += batch
        self.expansions += hops_sum
        self.distance_computations += hops_sum * cand_lanes
        self.steps += steps
        self.hbm_gather_bytes += hops_sum * cand_lanes * row_bytes
        self.ici_exchange_bytes += ici_bytes
        self.query_seconds += seconds

    @property
    def qps(self) -> float:
        return self.num_queries / self.query_seconds if self.query_seconds else 0.0

    @property
    def cache_hit_rate(self) -> float:
        tot = self.cache_hits + self.cache_misses
        return self.cache_hits / tot if tot else 0.0


class Statistics:
    """The run-level JSON document (reference Statistics,
    statistics.hh:14-62)."""

    def __init__(
        self,
        *,
        dataset: str = "",
        label: str = "",
        num_shards: int = 1,
        zipf: float = 0.0,
    ):
        self.meta: dict[str, Any] = {
            "dataset": dataset,
            "label": label,
            "num_shards": num_shards,
            "zipf": zipf,
            "timestamp": int(time.time()),
            "framework": "shine_tpu",
        }
        self.hnsw_parameters: dict[str, Any] = {}
        self.build: dict[str, Any] = {}
        self.queries: dict[str, Any] = {}
        self.cache: dict[str, Any] = {}
        self.timings: dict[str, float] = {}

    def set_params(self, params: HNSWParams, sp: SearchParams | None = None) -> None:
        self.hnsw_parameters = {
            "m": params.M,
            "m_max": params.M_max,
            "m_max0": params.M_max0,
            "ef_construction": params.ef_construction,
            "metric": params.metric,
            "seed": params.seed,
        }
        if sp is not None:
            sp = sp.resolved()
            self.hnsw_parameters.update(
                {"k": sp.k, "ef_search": sp.ef, "frontier": sp.frontier}
            )

    def set_build(self, *, num_vectors: int, build_seconds: float, index_bytes: int) -> None:
        self.build = {
            "num_vectors": num_vectors,
            "build_time_ms": round(build_seconds * 1e3, 1),
            "inserts_per_sec": round(num_vectors / build_seconds, 1)
            if build_seconds
            else 0.0,
            "index_size_in_bytes": index_bytes,
        }

    def set_queries(self, s: SearchStats) -> None:
        self.queries = {
            "num_queries": s.num_queries,
            "queries_per_sec": round(s.qps, 1),
            "query_time_ms": round(s.query_seconds * 1e3, 1),
            "recall": s.recall,
            "expansions": s.expansions,
            "distance_computations": s.distance_computations,
            "scanned_rows": s.scanned_rows,
            "traversal_steps": s.steps,
            "hbm_gather_bytes": s.hbm_gather_bytes,
            "ici_exchange_bytes": s.ici_exchange_bytes,
        }
        self.cache = {
            "hits": s.cache_hits,
            "misses": s.cache_misses,
            "hit_rate": round(s.cache_hit_rate, 4),
        }

    def as_dict(self) -> dict[str, Any]:
        return {
            "meta": self.meta,
            "hnsw_parameters": self.hnsw_parameters,
            "build": self.build,
            "queries": self.queries,
            "cache": self.cache,
            "timings": self.timings,
        }

    def dumps(self, indent: int | None = None) -> str:
        return json.dumps(self.as_dict(), indent=indent)
