from shine_tpu.io.fbin import read_bin, write_bin, read_bin_header
from shine_tpu.io.datasets import (
    Dataset,
    synthetic_dataset,
    load_dataset,
    save_dataset,
)
from shine_tpu.io.recall import recall_at_k, brute_force_knn
from shine_tpu.io.checkpoint import save_graph, load_graph, index_path

__all__ = [
    "save_graph",
    "load_graph",
    "index_path",
    "read_bin",
    "write_bin",
    "read_bin_header",
    "Dataset",
    "synthetic_dataset",
    "load_dataset",
    "save_dataset",
    "recall_at_k",
    "brute_force_knn",
]
