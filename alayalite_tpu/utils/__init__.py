from .evaluate import calc_gt, calc_recall
from .io import load_bvecs, load_fvecs, load_ivecs, md5, save_fvecs, save_ivecs

__all__ = [
    "calc_gt",
    "calc_recall",
    "load_bvecs",
    "load_fvecs",
    "load_ivecs",
    "md5",
    "save_fvecs",
    "save_ivecs",
]
