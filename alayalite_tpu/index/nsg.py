"""NSG builder — batched MRNG graph construction.

TPU-native re-design of /root/reference/include/index/graph/nsg/nsg_builder.hpp
(:41-648). The reference builds per node on a thread pool: beam-search the
node's vector from the medoid entry point, `sync_prune` with the MRNG rule,
then locked reverse-edge insertion and a DFS `tree_grow` connectivity repair.

Here every phase is batched and device-resident (build_phases.py):
  candidates : lockstep beam search of *all* nodes' vectors over the kNN
               graph, unioned with the kNN rows,
  prune      : MRNG occlusion prune (MXU pairwise + scanned greedy rule),
  reverse    : bounded reverse-edge scatter + batched re-prune,
  repair     : host BFS + one repair edge per unreached component
               (tree_grow/dfs/attach_unlinked analog, nsg_builder.hpp:500-628).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph
from .nndescent import build_knn_graph
from .prune import add_reverse_edges, occlusion_prune  # noqa: F401 (legacy host path, used by engine.insert)

log = logging.getLogger("alayalite_tpu")


def find_medoid(space, n: int) -> int:
    """Entry point = node nearest the dataset centroid (nsg_builder.hpp:170-194).
    Fully device-resident: no dataset roundtrip through the host."""
    from ..ops.distance import exact_topk

    data = space.data[:n].astype(jnp.float32)
    mean = jnp.mean(data, axis=0, keepdims=True)
    _, ids = exact_topk(mean, data, 1, metric=space.metric)
    return int(ids[0, 0])


def _components_of(nbrs: np.ndarray, members: np.ndarray) -> np.ndarray:
    """Representative node of each connected component of the subgraph
    induced by ``members`` (directed edges treated as undirected).

    Vectorized via scipy's union-find — the per-component BFS loop cost
    ~1 python iteration per component (tens of seconds at 1M scale, where
    repair typically sees ~19k singleton components)."""
    members = np.asarray(members, dtype=np.int64)
    try:
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import connected_components
    except Exception:
        return _components_of_bfs(nbrs, members)
    local = np.full(nbrs.shape[0], -1, dtype=np.int32)
    local[members] = np.arange(members.size, dtype=np.int32)
    # CSR built directly from the dense [m, R] rows — the edges are
    # already row-major, so no coo lexsort (which cost ~60 s on 29M
    # edges at 1M: the round-0 components call dominated repair)
    rows = local[np.clip(nbrs[members], 0, None)]
    valid = (nbrs[members] >= 0) & (rows >= 0)
    counts = valid.sum(axis=1)
    indptr = np.zeros(members.size + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    indices = rows[valid].astype(np.int32)
    m = csr_matrix((np.ones(indices.size, np.int8), indices, indptr),
                   shape=(members.size, members.size))
    _, labels = connected_components(m, directed=False)
    first = np.unique(labels, return_index=True)[1]
    return members[first].astype(np.int32)


def _components_of_bfs(nbrs: np.ndarray, members: np.ndarray) -> np.ndarray:
    member_set = np.zeros(nbrs.shape[0], dtype=bool)
    member_set[members] = True
    unvisited = set(members.tolist())
    reps = []
    while unvisited:
        start = unvisited.pop()
        reps.append(start)
        frontier = [start]
        while frontier:
            rows = nbrs[np.asarray(frontier, dtype=np.int64)].reshape(-1)
            rows = rows[rows >= 0]
            nxt = [x for x in np.unique(rows).tolist()
                   if member_set[x] and x in unvisited]
            for x in nxt:
                unvisited.discard(x)
            frontier = nxt
    return np.asarray(reps, dtype=np.int32)


def _expand_reached(nbrs: np.ndarray, reached: np.ndarray,
                    frontier: np.ndarray) -> None:
    """Grow ``reached`` in place by numpy frontier BFS from ``frontier``.
    (A scipy csr BFS was measured SLOWER at 1M: the coo→csr construction
    lexsorts 32M edges per call on this one-core host, ~30 s/round vs the
    frontier loop's ~12 s full pass — negative result, 2026-08-17.)"""
    frontier = frontier[~reached[frontier]]
    reached[frontier] = True
    while frontier.size:
        nxt = nbrs[frontier].reshape(-1)
        nxt = nxt[nxt >= 0]
        nxt = np.unique(nxt)
        nxt = nxt[~reached[nxt]]
        reached[nxt] = True
        frontier = nxt


def _attach_unreached(space, nbrs: np.ndarray, ep: int,
                      nearest_fn=None) -> np.ndarray:
    """Connectivity repair (tree_grow/attach_unlinked analog,
    nsg_builder.hpp:500-628): BFS from ep, then add ONE edge per unreached
    *component* — from the component representative's nearest reached node —
    so each round strictly shrinks the unreached set (per-node attachment
    oscillates: full rows get their repair edges clobbered by later ones).

    Reachability is maintained INCREMENTALLY: one full BFS up front, then
    each round only expands from the components it just attached (edges are
    only ever added, so the reached set only grows). Slot-rotation can in
    principle clobber a previous round's repair edge, so a full BFS
    re-verifies before accepting convergence.

    ``nearest_fn(rep_ids [Rb] i32 np, reached [n] bool np) -> src ids
    [Rb]`` overrides the nearest-reached scan — the serve-sharded path
    supplies a distributed scan so the full slab never lands on one device
    (parallel/dist_graph.py)."""
    n = nbrs.shape[0]
    reached = np.zeros(n, dtype=bool)
    _expand_reached(nbrs, reached, np.array([ep], dtype=np.int64))
    verified = True
    for _round in range(24):
        missing = np.nonzero(~reached)[0]
        # residual unreachable below 0.02% is noise next to quantization
        # and beam-truncation effects; stop burning repair rounds on it
        if missing.size <= max(0, int(2e-4 * n)) and _round > 0:
            if verified:
                break
            # incremental state can be optimistic (slot rotation may have
            # clobbered an earlier repair edge) — re-verify with a full BFS
            reached = np.zeros(n, dtype=bool)
            _expand_reached(nbrs, reached, np.array([ep], dtype=np.int64))
            verified = True
            continue
        if missing.size == 0:
            break
        verified = False
        reps = _components_of(nbrs, missing)
        log.info("attach round %d: %d unreached in %d components",
                 _round, missing.size, reps.size)
        # nearest *reached* node of each representative — device-resident
        # (a host roundtrip of the dataset costs minutes through the tunnel)
        # reps padded to a shape bucket: the scan jits per query count,
        # and component counts differ every round AND every build — fresh
        # shapes meant a ~30-60 s tunnel recompile per repair round
        rb = max(256, -(-reps.size // 1024) * 1024)
        reps_pad = np.full(rb, reps[0], dtype=np.int32)
        reps_pad[: reps.size] = reps
        if nearest_fn is not None:
            srcs = np.asarray(nearest_fn(reps_pad, reached))[: reps.size]
        else:
            from ..ops.distance import exact_topk

            data = space.data[:n].astype(jnp.float32)
            qs = data[jnp.asarray(reps_pad)]
            _, near = exact_topk(qs, data, 1, metric=space.metric,
                                 valid=reached.copy())
            srcs = near[: reps.size, 0]
        used: dict = {}
        attached = []
        for u, v in zip(reps.tolist(), srcs.tolist()):
            if v < 0:
                continue
            row = nbrs[v]
            empt = np.nonzero(row < 0)[0]
            if empt.size:
                nbrs[v, empt[0]] = u
            else:
                # rotate through distinct slots per source node so repair
                # edges added for other components this round survive
                slot = used.get(v, 0)
                used[v] = slot + 1
                nbrs[v, -1 - (slot % nbrs.shape[1])] = u
            attached.append(u)
        if attached:
            # newly attached components are reachable now; expand only
            # through the (shrinking) unreached region
            _expand_reached(nbrs, reached,
                            np.asarray(attached, dtype=np.int64))
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
    nnd_iters: int = 0  # 0 = auto (~log2 n rounds)
    seed: int = 0

    def build_graph(self, space, n: Optional[int] = None) -> Graph:
        t0 = time.time()
        if self.c <= self.r:
            # the reverse-edge table width is c - r; fail before minutes
            # of kNN/pool work instead of inside jax.random.randint
            raise ValueError(
                f"NSGBuilder requires c > r (candidate cut wider than the "
                f"degree); got c={self.c}, r={self.r}")
        if n is None:
            n = int(space.num)
        from .build_phases import (prune_all_dev, reprune_with_reverse_dev,
                                   reverse_edges_dev, search_pool_dev)

        knn_d, knn_i = build_knn_graph(
            space, n, self.knn_k, max_iters=self.nnd_iters, seed=self.seed,
            as_numpy=False)
        ep = find_medoid(space, n)

        pool_d, pool_i = search_pool_dev(
            space, knn_i, np.array([ep]), ef=self.l, n=n, chunk=self.chunk,
            seed=self.seed)
        cand_i = jnp.concatenate([pool_i, knn_i], axis=1)[:, : self.c]
        cand_d = jnp.concatenate([pool_d, knn_d], axis=1)[:, : self.c]

        nbrs_dev = prune_all_dev(space, cand_d, cand_i, r=self.r,
                                 alpha=self.alpha, chunk=self.chunk)
        rev = reverse_edges_dev(nbrs_dev, jax.random.PRNGKey(self.seed + 3),
                                width=self.c - self.r)
        nbrs_dev = reprune_with_reverse_dev(space, nbrs_dev, rev, r=self.r,
                                            alpha=self.alpha,
                                            chunk=self.chunk)

        from .repair_dev import repair_connectivity

        nbrs = repair_connectivity(space, nbrs_dev, ep)
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
    """Distances from each node's vector to its candidate ids, chunked on
    host. Row counts are padded to 256-buckets so ragged tails (whose size
    varies call to call, e.g. per insert batch) don't recompile the jitted
    gather each time."""
    n = node_ids.shape[0]
    out = np.empty(cand_i.shape, dtype=np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        mp = min(chunk, -(-m // 256) * 256)
        ids = np.zeros(mp, dtype=np.int32)
        ids[:m] = node_ids[lo:hi]
        ci = np.full((mp, cand_i.shape[1]), -1, dtype=np.int32)
        ci[:m] = cand_i[lo:hi]
        q = space.data[jnp.asarray(ids)].astype(jnp.float32)
        cij = jnp.asarray(ci)
        safe = jnp.where(cij >= 0, cij, 0)
        d = space.gather_dists(q, safe)
        out[lo:hi] = np.asarray(jnp.where(cij >= 0, d, np.inf))[:m]
    return out
