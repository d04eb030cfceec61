"""Exact k-NN graph construction (tiled MXU) — the building block the
reference gets from NN-Descent (include/index/graph/knng/nndescent.hpp) when
exactness is affordable. For small/medium N the all-pairs tiled matmul is
faster on TPU than any approximate scheme; NN-Descent (nndescent.py) covers
large N.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..ops.distance import exact_topk


def exact_knn(
    data: np.ndarray,
    k: int,
    metric: str = "l2",
    valid: Optional[np.ndarray] = None,
    tile_n: int = 16384,
    compute_dtype: str = "float32",
    include_self: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k nearest neighbors of every row against all rows.

    Returns (dists [N,k] f32, ids [N,k] i32) excluding self unless asked.
    """
    data = np.asarray(data, dtype=np.float32)
    n = data.shape[0]
    kk = k if include_self else k + 1
    kk = min(kk, n)
    d, i = exact_topk(data, data, kk, metric=metric, valid=valid,
                      tile_n=tile_n, compute_dtype=compute_dtype)
    if include_self:
        return d[:, :k], i[:, :k]
    self_ids = np.arange(n, dtype=np.int32)
    out_d = np.full((n, k), np.inf, dtype=np.float32)
    out_i = np.full((n, k), -1, dtype=np.int32)
    for col in range(kk):
        pass  # vectorized below
    mask = i != self_ids[:, None]                     # [n, kk]
    # stable-compact the non-self entries to the left, then take k
    order = np.argsort(~mask, axis=1, kind="stable")  # non-self first
    i_c = np.take_along_axis(i, order, axis=1)
    d_c = np.take_along_axis(d, order, axis=1)
    m_c = np.take_along_axis(mask, order, axis=1)
    take = min(k, kk)
    out_i[:, :take] = np.where(m_c[:, :take], i_c[:, :take], -1)
    out_d[:, :take] = np.where(m_c[:, :take], d_c[:, :take], np.inf)
    return out_d, out_i
