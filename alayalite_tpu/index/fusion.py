"""FusionGraph builder: union of HNSW and NSG edge sets.

TPU-native equivalent of /root/reference/include/index/graph/fusion_graph.hpp
(:35-135): build primary (HNSW) and secondary (NSG) graphs, union each node's
edge lists (dedup, primary first), and keep the overlay/entry points of the
primary. Union capacity is 2R like the reference's concatenated rows.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .graph import Graph
from .hnsw import HNSWBuilder
from .nsg import NSGBuilder


def _union_rows(a: np.ndarray, b: np.ndarray, width: int) -> np.ndarray:
    """Per-row ordered union of two -1-padded id lists, -1 padded to width."""
    n = a.shape[0]
    cat = np.concatenate([a, b], axis=1)
    out = np.full((n, width), -1, dtype=np.int32)
    # stable dedup keeping first occurrence, vectorized per row via sort trick
    m = cat.shape[1]
    order_keys = np.argsort(cat, axis=1, kind="stable")
    s = np.take_along_axis(cat, order_keys, axis=1)
    first = np.ones_like(s, dtype=bool)
    first[:, 1:] = s[:, 1:] != s[:, :-1]
    first &= s >= 0
    # restore original order: mark kept positions, then stable-compact left
    keep = np.zeros_like(first)
    np.put_along_axis(keep, order_keys, first, axis=1)
    compact = np.argsort(~keep, axis=1, kind="stable")
    vals = np.take_along_axis(np.where(keep, cat, -1), compact, axis=1)
    w = min(width, m)
    out[:, :w] = vals[:, :w]
    return out


@dataclasses.dataclass
class FusionGraphBuilder:
    r: int = 32
    l: int = 200
    chunk: int = 4096
    alpha: float = 1.0
    seed: int = 0

    def build_graph(self, space, n: Optional[int] = None) -> Graph:
        if n is None:
            n = int(space.num)
        primary = HNSWBuilder(r=self.r, l=self.l, chunk=self.chunk,
                              alpha=self.alpha,
                              seed=self.seed).build_graph(space, n)
        secondary = NSGBuilder(r=self.r, l=max(self.l // 2, 64),
                               chunk=self.chunk, alpha=self.alpha,
                               seed=self.seed
                               ).build_graph(space, n)
        a = np.asarray(primary.nbrs[:n])
        b = np.asarray(secondary.nbrs[:n])
        union = _union_rows(a, b, 2 * self.r)
        eps = np.asarray(primary.eps)
        return Graph.from_numpy(union, eps=eps, overlay=primary.overlay,
                                capacity=space.capacity)
