"""HNSW-analog builder: batched base layer + sampled overlay hierarchy.

TPU-native re-design of /root/reference/include/index/graph/hnsw/
{hnswlib.hpp:42-753, hnsw_builder.hpp:43-194}. The reference inserts points
one at a time under per-node mutexes (greedy descent, beam, heuristic prune,
reverse-edge shrink); sequential insertion does not map to an accelerator, so
the build is recast as waves with identical outputs in kind:

  base layer  : kNN graph (batched NN-Descent / exact) → beam-search candidate
                pools → batched heuristic prune (`get_neighbors_by_heuristic2`
                semantics via `occlusion_prune`) → reverse edges + re-prune —
                the same edge rule hnswlib applies, applied to all nodes at
                once.
  overlay     : nodes sampled with the same expected layer occupancy
                (P(level≥l) = R^-l, matching mult_ = 1/ln(R),
                hnswlib.hpp get_random_level) get per-level kNN graphs built
                by exact MXU all-pairs (levels are tiny), flattened exactly
                like HNSWBuilder::build_graph does into Graph + OverlayGraph.

Search-time behavior matches the reference: greedy descent through overlay
levels picks the base-layer seed (see search.graph_seeds).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .graph import Graph, OverlayLevel
from .knn import exact_knn
from .nndescent import build_knn_graph

log = logging.getLogger("alayalite_tpu")


def _build_overlay(space, n: int, r: int, rng: np.random.Generator):
    """Sample the layer hierarchy and build per-level exact kNN subgraphs.

    Each level is padded to a capacity-scaled slot count (ids/down = -1) so
    online inserts can link new nodes into the hierarchy *in place*
    (overlay_update.py) — growing a level's arrays would change jitted
    search-program shapes, and a recompile costs ~30s through a TPU tunnel.
    overlay_descend never reads a padded slot: padded ids are unreachable
    because no occupied row points at them.
    """
    r2 = max(2, r // 2)
    members: List[np.ndarray] = []
    cur = np.arange(n, dtype=np.int32)
    while cur.size > max(2 * r, 64):
        size = max(1, cur.size // max(2, r))
        cur = np.sort(rng.choice(cur, size=size, replace=False))
        members.append(cur)
    if not members:
        return (), None
    # top level first
    members = members[::-1]
    # headroom for online inserts, proportional to unused capacity
    grow = max(1.0, space.capacity / max(n, 1))
    levels = []
    for li, ids in enumerate(members):
        vecs = np.asarray(space.data[jnp.asarray(ids)].astype(jnp.float32))
        # (level subsets shrink ~R-fold per level; the first gather is the
        # only sizable one and runs on device before the small download)
        k = min(r2, ids.size - 1)
        if k <= 0:
            nbrs_local = np.full((ids.size, r2), -1, dtype=np.int32)
        else:
            _, knn_local = exact_knn(vecs, k, metric=space.metric)
            nbrs_local = np.full((ids.size, r2), -1, dtype=np.int32)
            nbrs_local[:, :k] = knn_local
        if li + 1 < len(members):
            below = members[li + 1]
            down = np.searchsorted(below, ids).astype(np.int32)
        else:
            down = ids.astype(np.int32)  # bottom overlay points at global ids
        cap_l = -(-int(np.ceil(ids.size * grow)) // 8) * 8
        pad = cap_l - ids.size
        if pad > 0:
            ids = np.concatenate([ids, np.full(pad, -1, np.int32)])
            nbrs_local = np.concatenate(
                [nbrs_local, np.full((pad, r2), -1, np.int32)], axis=0)
            down = np.concatenate([down, np.full(pad, -1, np.int32)])
        levels.append(OverlayLevel(
            ids=jnp.asarray(ids), nbrs=jnp.asarray(nbrs_local),
            down=jnp.asarray(down)))
    return tuple(levels), int(members[0][0])


@dataclasses.dataclass
class HNSWBuilder:
    """R=max_nbrs (underlay degree), L=ef_construction — the knobs of
    hnsw_builder.hpp:68-74."""

    r: int = 32
    l: int = 200
    knn_k: int = 32
    alpha: float = 1.0
    chunk: int = 4096
    nnd_iters: int = 0  # 0 = auto (~log2 n rounds)
    use_search_pool: bool = True
    seed: int = 0

    def build_graph(self, space, n: Optional[int] = None) -> Graph:
        """Device-resident pipeline: the only host↔device traffic is the
        final adjacency download for the BFS connectivity repair."""
        import jax
        import jax.numpy as jnp

        from .build_phases import (fill_degree_dev, prune_all_dev,
                                   reprune_with_reverse_dev,
                                   reverse_edges_dev, search_pool_dev)

        t0 = time.time()
        if n is None:
            n = int(space.num)
        rng = np.random.default_rng(self.seed)

        knn_d, knn_i = build_knn_graph(
            space, n, self.knn_k, max_iters=self.nnd_iters, seed=self.seed,
            as_numpy=False)
        log.info("hnsw: knn graph %.1fs", time.time() - t0)

        overlay, top_global = _build_overlay(space, n, self.r, rng)
        ep = top_global if top_global is not None else 0
        log.info("hnsw: overlay %.1fs", time.time() - t0)

        import os

        use_pool = self.use_search_pool
        if os.environ.get("ALAYA_HNSW_POOLS", "1") == "0":
            # opt-out knob; measured: kNN-only candidates COLLAPSE at high
            # dim + scale (1M x 960: recall 0.22 — distance concentration
            # leaves the kNN ∪ reverse edges non-navigable), while pools
            # rescue it (20k x 960 diag: 0.9605@ef64 vs 0.868 kNN-only)
            use_pool = False
        if use_pool:
            hidim = space.data.shape[1] >= 512
            # high-dim HBM budget: ef-64 pools + 2048-chunks keep the beam
            # transients ~1 GB next to the f32 data + bf16 copy (ef-128 /
            # 4096 OOM'd at 1M x 960)
            ef = min(self.l, 64 if hidim else 128)
            pchunk = min(self.chunk, 2048) if hidim else self.chunk
            from .build_phases import bf16_pool_space

            pool_space = bf16_pool_space(space)
            pool_d, pool_i = search_pool_dev(
                pool_space, knn_i, np.array([ep]), ef=ef, n=n,
                chunk=pchunk, seed=self.seed)
            cand_i = jnp.concatenate([pool_i, knn_i], axis=1)
            cand_d = jnp.concatenate([pool_d, knn_d], axis=1)
        else:
            cand_i, cand_d = knn_i, knn_d
        log.info("hnsw: candidate pools %.1fs", time.time() - t0)

        nbrs_dev = prune_all_dev(space, cand_d, cand_i, r=self.r,
                                 alpha=self.alpha, chunk=self.chunk)
        log.info("hnsw: prune %.1fs", time.time() - t0)

        rev = reverse_edges_dev(nbrs_dev, jax.random.PRNGKey(self.seed + 3),
                                width=2 * self.r)
        nbrs_dev = reprune_with_reverse_dev(space, nbrs_dev, rev, r=self.r,
                                            alpha=self.alpha,
                                            chunk=self.chunk)
        if space.metric == "ip" \
                and getattr(space, "user_metric", "ip") == "ip":
            # pad rows back to r with nearest unused candidates — IP only.
            # Occlusion pruning under IP collapses rows toward high-norm
            # hubs (at 8k ip, 1/3 of nodes ended with ZERO in-degree →
            # recall 0.49); the fill restores in-degree the way the QG
            # pipeline does. Under L2/cos the occluded rows are already
            # navigable and the extra near-duplicate edges measurably hurt
            # post-compaction recall (test_maintenance), so they stay off.
            nbrs_dev = fill_degree_dev(nbrs_dev, cand_d, cand_i, r=self.r,
                                       chunk=self.chunk)
        log.info("hnsw: reverse %.1fs", time.time() - t0)

        from .repair_dev import repair_connectivity

        # unified repair dispatch: device-resident at >200k rows (no bulk
        # adjacency download), host numpy BFS below
        nbrs = repair_connectivity(space, nbrs_dev, ep)
        log.info("HNSW build: n=%d r=%d l=%d levels=%d in %.2fs",
                 n, self.r, self.l, len(overlay), time.time() - t0)
        extra = rng.integers(0, n, size=7).astype(np.int32)
        return Graph.from_numpy(nbrs, eps=np.concatenate([[ep], extra]),
                                overlay=overlay, capacity=space.capacity)
