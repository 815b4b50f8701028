from shine_tpu.utils.stats import SearchStats, Statistics
from shine_tpu.utils.timing import Timing

__all__ = ["Statistics", "SearchStats", "Timing"]
