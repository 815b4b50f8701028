from shine_tpu.ops.distance import (
    pairwise_distance,
    candidate_distance,
    squared_norms,
)
from shine_tpu.ops.hashset import hashset_init, hashset_check_insert
from shine_tpu.ops.beam import beam_init, beam_merge, Beam

__all__ = [
    "pairwise_distance",
    "candidate_distance",
    "squared_norms",
    "hashset_init",
    "hashset_check_insert",
    "beam_init",
    "beam_merge",
    "Beam",
]
