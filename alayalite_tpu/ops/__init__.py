from .distance import exact_topk, normalize_rows, pairwise, sqnorms
from .topk import merge_topk, merge_topk_dedup, merge_topk_with_flags

__all__ = [
    "exact_topk",
    "normalize_rows",
    "pairwise",
    "sqnorms",
    "merge_topk",
    "merge_topk_dedup",
    "merge_topk_with_flags",
]
