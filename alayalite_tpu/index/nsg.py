"""NSG builder — batched MRNG graph construction.

TPU-native re-design of /root/reference/include/index/graph/nsg/nsg_builder.hpp
(:41-648). The reference builds per node on a thread pool: beam-search the
node's vector from the medoid entry point, `sync_prune` with the MRNG rule,
then locked reverse-edge insertion and a DFS `tree_grow` connectivity repair.

Here every phase is batched:
  candidates : lockstep beam search of *all* nodes' vectors over the kNN graph
               (one jitted program per chunk) unioned with the kNN rows,
  prune      : `occlusion_prune` (MXU pairwise + scanned greedy rule),
  reverse    : host group-by scatter + one more batched prune of touched nodes,
  repair     : host BFS + batched nearest-reached attachment
               (tree_grow/dfs/attach_unlinked analog, nsg_builder.hpp:500-628).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .graph import Graph
from .nndescent import build_knn_graph
from .prune import add_reverse_edges, occlusion_prune
from .search import beam_search

log = logging.getLogger("alayalite_tpu")


def _batched_search_pool(space, nbrs_dev, eps: np.ndarray, queries: np.ndarray,
                         ef: int, chunk: int, n_total: Optional[int] = None,
                         n_rand_seeds: int = 16, seed: int = 0,
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Beam-search every query over ``nbrs`` returning the full ef-pool.

    Seeds are eps ∪ random nodes — the NSG retset is initialized with random
    points precisely so pools cover components the entry point can't reach
    (nsg_builder.hpp search_on_graph's random init)."""
    n = queries.shape[0]
    rng = np.random.default_rng(seed)
    out_d = np.empty((n, ef), dtype=np.float32)
    out_i = np.empty((n, ef), dtype=np.int32)
    eps = np.asarray(eps, dtype=np.int32)
    n_pool = n_total if n_total is not None else n
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        c = hi - lo
        q = queries[lo:hi]
        if c < chunk and n > chunk:
            q = np.pad(q, ((0, chunk - c), (0, 0)))
        qj = jnp.asarray(q, dtype=jnp.float32)
        rand = rng.integers(0, n_pool, size=(q.shape[0], n_rand_seeds))
        seeds_np = np.concatenate(
            [np.broadcast_to(eps[None, :], (q.shape[0], eps.shape[0])), rand],
            axis=1).astype(np.int32)
        d, i = beam_search(space, nbrs_dev, jnp.asarray(seeds_np), qj,
                           k=ef, ef=ef)
        out_d[lo:hi] = np.asarray(d)[:c]
        out_i[lo:hi] = np.asarray(i)[:c]
    return out_d, out_i


def find_medoid(space, n: int) -> int:
    """Entry point = node nearest the dataset centroid (nsg_builder.hpp:170-194)."""
    from ..ops.distance import exact_topk

    data = np.asarray(space.data[:n].astype(jnp.float32))
    mean = data.mean(axis=0, keepdims=True)
    _, ids = exact_topk(mean, data, 1, metric=space.metric)
    return int(ids[0, 0])


def _attach_unreached(space, nbrs: np.ndarray, ep: int, ef: int,
                      chunk: int) -> np.ndarray:
    """Connectivity repair: BFS from ep, then wire unreached components in by
    linking each unreached node from its nearest reached neighbor."""
    n = nbrs.shape[0]
    for _round in range(32):
        reached = np.zeros(n, dtype=bool)
        frontier = np.array([ep], dtype=np.int32)
        reached[ep] = True
        while frontier.size:
            nxt = nbrs[frontier].reshape(-1)
            nxt = nxt[nxt >= 0]
            nxt = np.unique(nxt)
            nxt = nxt[~reached[nxt]]
            reached[nxt] = True
            frontier = nxt
        missing = np.nonzero(~reached)[0]
        if missing.size == 0:
            break
        # nearest *reached* node of each unreached node via masked exact search
        from ..ops.distance import exact_topk

        data = np.asarray(space.data[:n].astype(jnp.float32))
        valid = reached.copy()
        _, near = exact_topk(data[missing], data, 1, metric=space.metric,
                             valid=valid)
        srcs = near[:, 0]
        for u, v in zip(missing, srcs):
            if v < 0:
                continue
            row = nbrs[v]
            empt = np.nonzero(row < 0)[0]
            if empt.size:
                nbrs[v, empt[0]] = u
            else:
                nbrs[v, -1] = u  # replace the farthest edge
    return nbrs


@dataclasses.dataclass
class NSGBuilder:
    """Hyperparameters mirror the reference's (R=max degree, L=search width,
    C=candidate cut, nsg_builder.hpp:73-95)."""

    r: int = 32
    l: int = 100
    c: int = 128
    knn_k: int = 32
    alpha: float = 1.0
    chunk: int = 4096
    nnd_iters: int = 12
    seed: int = 0

    def build_graph(self, space, n: Optional[int] = None) -> Graph:
        t0 = time.time()
        if n is None:
            n = int(space.num)
        knn_d, knn_i = build_knn_graph(
            space, n, self.knn_k, max_iters=self.nnd_iters, seed=self.seed)
        knn_graph = Graph.from_numpy(knn_i, eps=[0]).nbrs
        ep = find_medoid(space, n)

        data = np.asarray(space.data[:n].astype(jnp.float32))
        ef = min(self.l, max(self.r + 1, 16))
        pool_d, pool_i = _batched_search_pool(
            space, knn_graph, np.array([ep]), data, ef=self.l, chunk=self.chunk)

        cand_i = np.concatenate([pool_i, knn_i], axis=1)[:, : self.c]
        cand_d = np.concatenate([pool_d, knn_d], axis=1)[:, : self.c]
        me = np.arange(n, dtype=np.int32)[:, None]
        cand_d = np.where(cand_i == me, np.inf, cand_d)
        cand_i = np.where(cand_i == me, -1, cand_i)

        nbrs = occlusion_prune(space, np.arange(n), cand_d, cand_i,
                               r=self.r, alpha=self.alpha, chunk=self.chunk)

        # reverse edges: candidates = current edges ∪ reverse sources, re-prune
        rev, touched = add_reverse_edges(nbrs, max_candidates=self.c - self.r)
        t_ids = np.nonzero(touched)[0]
        if t_ids.size:
            cat_i = np.concatenate([nbrs[t_ids], rev[t_ids]], axis=1)
            # distances node->candidate on device, chunked
            cat_d = _gather_dists_chunked(space, t_ids, cat_i, self.chunk)
            cat_d = np.where(cat_i == t_ids[:, None], np.inf, cat_d)
            cat_i2 = np.where(cat_i == t_ids[:, None], -1, cat_i)
            nbrs[t_ids] = occlusion_prune(space, t_ids, cat_d, cat_i2,
                                          r=self.r, alpha=self.alpha,
                                          chunk=self.chunk)

        nbrs = _attach_unreached(space, nbrs, ep, ef=ef, chunk=self.chunk)
        log.info("NSG build: n=%d r=%d l=%d in %.2fs", n, self.r, self.l,
                 time.time() - t0)
        # medoid entry point first (NSG semantics) + spread extras so queries
        # landing in components linked only by thin repair chains still
        # converge (Graph::eps_ is a vector in the reference too).
        rng = np.random.default_rng(self.seed + 17)
        extra = rng.integers(0, n, size=7).astype(np.int32)
        return Graph.from_numpy(nbrs, eps=np.concatenate([[ep], extra]),
                                capacity=space.capacity)


def _gather_dists_chunked(space, node_ids: np.ndarray, cand_i: np.ndarray,
                          chunk: int) -> np.ndarray:
    """Distances from each node's vector to its candidate ids, chunked on host."""
    n = node_ids.shape[0]
    out = np.empty(cand_i.shape, dtype=np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        ids = jnp.asarray(node_ids[lo:hi])
        q = space.data[ids].astype(jnp.float32)
        ci = jnp.asarray(cand_i[lo:hi])
        safe = jnp.where(ci >= 0, ci, 0)
        d = space.gather_dists(q, safe)
        out[lo:hi] = np.asarray(jnp.where(ci >= 0, d, np.inf))
    return out
