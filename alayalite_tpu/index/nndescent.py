"""NN-Descent: batched k-NN-graph construction.

TPU-native re-design of the reference's NN-Descent
(/root/reference/include/index/graph/knng/nndescent.hpp:40-495). The reference
keeps a per-node locked max-heap `Nhood` and does fine-grained local joins on a
thread pool; that mutation pattern does not map to an accelerator. Here each
round is one jitted program over the whole graph:

  1. expand: every node gathers a sample of its neighbors' neighbors
     (the "new × (new ∪ old)" join, seen from the destination side),
  2. reverse: a scatter builds a fixed-width sample of reverse edges
     (`Nhood::rnew_/rold_` analog — collisions just drop samples, which is
     the same semantics as the reference's bounded reservoir `insert`),
  3. a batched distance evaluation (gather + MXU contraction) scores all
     candidates, and
  4. a sort-dedup + `top_k` merge replaces the per-node heap update.

Convergence is tracked by the number of changed entries per round
(reference: `update_join_cnt`-style early exit) on the host.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FINF = float("inf")  # plain python: jnp constants at module level would init the backend at import


def _dedup_sorted_merge(pool_d, pool_i, cand_d, cand_i, k: int):
    """Merge candidates into pools dropping duplicate ids.

    All [N, *]. Ids are deduplicated by sorting the concatenated id row and
    keeping the first occurrence (which, after the secondary sort by distance,
    is the best one).
    """
    cat_d = jnp.concatenate([pool_d, cand_d], axis=1)
    cat_i = jnp.concatenate([pool_i, cand_i], axis=1)
    # sort by (id, dist) so duplicates are adjacent, best-first
    # key: id * 2^20-ish won't fit; instead sort twice (stable): by dist, then by id.
    order_d = jnp.argsort(cat_d, axis=1)
    cat_d = jnp.take_along_axis(cat_d, order_d, axis=1)
    cat_i = jnp.take_along_axis(cat_i, order_d, axis=1)
    order_i = jnp.argsort(cat_i, axis=1, stable=True)
    s_i = jnp.take_along_axis(cat_i, order_i, axis=1)
    s_d = jnp.take_along_axis(cat_d, order_i, axis=1)
    prev = jnp.concatenate([jnp.full_like(s_i[:, :1], -2), s_i[:, :-1]], axis=1)
    keep = (s_i >= 0) & (s_i != prev)
    s_d = jnp.where(keep, s_d, FINF)
    s_i = jnp.where(keep, s_i, -1)
    nd, sel = jax.lax.top_k(-s_d, k)
    ni = jnp.take_along_axis(s_i, sel, axis=1)
    return -nd, jnp.where(jnp.isfinite(-nd), ni, -1)


@functools.partial(jax.jit, static_argnames=("s1", "s2", "s_rev", "n_rand"))
def _nnd_round(
    space,
    knn_d: jax.Array,   # [N, K] f32
    knn_i: jax.Array,   # [N, K] i32
    key: jax.Array,
    s1: int,            # sampled neighbors per node
    s2: int,            # sampled neighbors-of-neighbors per sampled neighbor
    s_rev: int,         # reverse-sample width
    n_rand: int,        # random exploration candidates
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    N, K = knn_i.shape
    k_nb, k_rev, k_slot, k_rand = jax.random.split(key, 4)

    # --- 1. forward expansion: sample s1 of my neighbors, s2 of theirs ---
    sel1 = jax.random.randint(k_nb, (N, s1), 0, K)
    mid = jnp.take_along_axis(knn_i, sel1, axis=1)               # [N, s1]
    mid_safe = jnp.where(mid >= 0, mid, 0)
    their = knn_i[mid_safe]                                      # [N, s1, K]
    sel2 = jax.random.randint(k_nb, (N, s1, s2), 0, K)
    hop2 = jnp.take_along_axis(their, sel2, axis=2)              # [N, s1, s2]
    hop2 = jnp.where(mid[:, :, None] >= 0, hop2, -1).reshape(N, s1 * s2)

    # --- 2. reverse sample: j gets i for sampled edges i->j ---
    src = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, s1))
    dst = mid_safe
    slot = jax.random.randint(k_slot, (N, s1), 0, s_rev)
    rev = jnp.full((N, s_rev), -1, dtype=jnp.int32)
    rev = rev.at[dst.reshape(-1), slot.reshape(-1)].set(
        jnp.where(mid >= 0, src, -1).reshape(-1), mode="drop")

    # --- 3. random exploration ---
    rand = jax.random.randint(k_rand, (N, n_rand), 0, N).astype(jnp.int32)

    cand = jnp.concatenate([hop2, rev, rand], axis=1)            # [N, M]
    me = jnp.arange(N, dtype=jnp.int32)[:, None]
    cand = jnp.where(cand == me, -1, cand)

    # --- 4. batched distances node->candidates ---
    safe = jnp.where(cand >= 0, cand, 0)
    qvecs = space.data[:N].astype(jnp.float32)                   # queries = all nodes
    d = space.gather_dists(qvecs, safe)
    d = jnp.where(cand >= 0, d, FINF)

    new_d, new_i = _dedup_sorted_merge(knn_d, knn_i, d, cand, K)
    changed = jnp.sum(new_i != knn_i)
    return new_d, new_i, changed


def _init_random_knn(space, n: int, k: int, seed: int):
    key = jax.random.PRNGKey(seed)
    cand = jax.random.randint(key, (n, k), 0, n).astype(jnp.int32)
    me = jnp.arange(n, dtype=jnp.int32)[:, None]
    cand = jnp.where(cand == me, (cand + 1) % n, cand)
    q = space.data[:n].astype(jnp.float32)
    d = space.gather_dists(q, cand)
    # dedup within the random init
    pd = jnp.full((n, k), FINF, dtype=jnp.float32)
    pi = jnp.full((n, k), -1, dtype=jnp.int32)
    return _dedup_sorted_merge(pd, pi, d, cand, k)[:2]


def build_knn_graph(
    space,
    n: int,
    k: int,
    max_iters: int = 12,
    seed: int = 0,
    sample_rate: float = 0.5,
    min_update_frac: float = 0.001,
    exact_threshold: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """Approximate kNN graph of the first ``n`` valid slots of ``space``.

    Returns (dists [n,k] f32, ids [n,k] i32). Falls back to exact tiled
    search below ``exact_threshold`` (MXU all-pairs is faster there).
    """
    if n <= exact_threshold:
        from .knn import exact_knn

        data = np.asarray(space.data[:n].astype(jnp.float32))
        return exact_knn(data, k, metric=space.metric)

    s1 = max(4, int(k * sample_rate))
    s2 = max(4, int(k * sample_rate) // 2)
    s_rev = max(8, k // 2)
    n_rand = 4

    knn_d, knn_i = _init_random_knn(space, n, k, seed)
    key = jax.random.PRNGKey(seed + 1)
    for it in range(max_iters):
        key, sub = jax.random.split(key)
        knn_d, knn_i, changed = _nnd_round(
            space, knn_d, knn_i, sub, s1=s1, s2=s2, s_rev=s_rev, n_rand=n_rand)
        c = int(changed)
        if c <= min_update_frac * n * k:
            break
    return np.asarray(knn_d), np.asarray(knn_i)
