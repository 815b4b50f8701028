"""Index persistence.

The reference checkpoints each memory node's raw index image prefixed by the
allocated size (/root/reference/src/memory_node.hh:130-209), with parameters
encoded in the filename (compute_node.cc:428-430). The TPU-native index is a
structure-of-arrays (graph/soa.py), so a checkpoint is simply the arrays plus
a geometry header; `RemotePtr`s stay valid across reload for the same reason
as the reference's (they are (shard,row) ids, not addresses).

Single-file `.npz` per (sharded or whole) graph. Sharded save/load writes one
file per shard like the reference writes one dump per MN.
"""

from __future__ import annotations

import json
import os

import numpy as np

from shine_tpu.config import HNSWParams
from shine_tpu.graph.soa import GraphSoA

_FORMAT_VERSION = 1


def save_graph(graph: GraphSoA, path: str) -> None:
    """Write the full SoA graph to one .npz file."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    header = {
        "version": _FORMAT_VERSION,
        "M": graph.params.M,
        "ef_construction": graph.params.ef_construction,
        "metric": graph.params.metric,
        "seed": graph.params.seed,
        "entry_point": int(graph.entry_point),
        "top_level": int(graph.top_level),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
            vectors=graph.vectors,
            levels=graph.levels,
            neighbors0=graph.neighbors0,
            upper_row=graph.upper_row,
            upper_neighbors=graph.upper_neighbors,
        )
    os.replace(tmp, path)


def load_graph(path: str) -> GraphSoA:
    with np.load(path) as z:
        header = json.loads(bytes(z["header"]).decode())
        if header["version"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {header['version']}")
        params = HNSWParams(
            M=header["M"],
            ef_construction=header["ef_construction"],
            metric=header["metric"],
            seed=header["seed"],
        )
        return GraphSoA(
            params=params,
            vectors=z["vectors"],
            levels=z["levels"],
            neighbors0=z["neighbors0"],
            upper_row=z["upper_row"],
            upper_neighbors=z["upper_neighbors"],
            entry_point=header["entry_point"],
            top_level=header["top_level"],
        )


def index_path(root: str, name: str, params: HNSWParams, num_shards: int = 1) -> str:
    """Parameter-encoding dump filename, mirroring the reference's
    `index_m{M}_efc{EFC}_node{i}_of{n}.dat` convention
    (compute_node.cc:428-430)."""
    return os.path.join(
        root,
        f"{name}_m{params.M}_efc{params.ef_construction}_{params.metric}"
        f"_s{num_shards}.npz",
    )
