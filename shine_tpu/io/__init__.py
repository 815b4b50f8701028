from shine_tpu.io.fbin import read_bin, write_bin, read_bin_header
from shine_tpu.io.datasets import (
    Dataset,
    synthetic_dataset,
    load_dataset,
    save_dataset,
)
from shine_tpu.io.recall import recall_at_k, brute_force_knn

__all__ = [
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
