from shine_tpu.io.fbin import read_bin, write_bin, read_bin_header
from shine_tpu.io.datasets import (
    Dataset,
    synthetic_dataset,
    load_dataset,
    save_dataset,
)
from shine_tpu.io.recall import (  # noqa: F401
    brute_force_knn,
    gt_crosscheck,
    numpy_subset_gt,
    recall_at_k,
    recall_at_k_eps,
    recall_at_k_eps_regen,
    margin_mask,
)
from shine_tpu.io.checkpoint import (
    save_graph,
    load_graph,
    index_path,
    save_routed_split,
    load_routed_split,
)

__all__ = [
    "save_graph",
    "load_graph",
    "index_path",
    "save_routed_split",
    "load_routed_split",
    "read_bin",
    "write_bin",
    "read_bin_header",
    "Dataset",
    "synthetic_dataset",
    "load_dataset",
    "save_dataset",
    "gt_crosscheck",
    "numpy_subset_gt",
    "recall_at_k",
    "recall_at_k_eps",
    "recall_at_k_eps_regen",
    "margin_mask",
    "brute_force_knn",
]
