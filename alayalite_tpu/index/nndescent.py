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
  4. a compare-matrix dedup + `top_k` merge replaces the per-node heap
     update (sort-based dedup measured 87% of a round at 1M).

Convergence is tracked by the number of changed entries per round
(reference: `update_join_cnt`-style early exit) on the host.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("alayalite_tpu")

FINF = float("inf")  # plain python: jnp constants at module level would init the backend at import


def _dedup_merge_fast(pool_d, pool_i, cand_d, cand_i, k: int):
    """Merge candidates into pools dropping duplicates — compare-matrix
    edition. The sort-based merge below costs 3 argsorts over [C, K+M]
    (~87%% of an NN-Descent round at 1M — measured, scripts/ablate_nnd.py);
    dense [C, M, M] compares are ~100x cheaper on the VPU for M ≤ ~256.
    Pool ids are assumed unique (invariant maintained by this function)."""
    M = cand_i.shape[1]
    dup = (cand_i[:, :, None] == cand_i[:, None, :]) &         jnp.tril(jnp.ones((M, M), dtype=bool), k=-1)[None, :, :]
    dup_earlier = jnp.any(dup, axis=2)
    in_pool = jnp.any(cand_i[:, :, None] == pool_i[:, None, :], axis=2)
    bad = (cand_i < 0) | dup_earlier | in_pool
    cand_d = jnp.where(bad, FINF, cand_d)
    cand_i = jnp.where(bad, -1, cand_i)
    cat_d = jnp.concatenate([pool_d, cand_d], axis=1)
    cat_i = jnp.concatenate([pool_i, cand_i], axis=1)
    nd, sel = jax.lax.top_k(-cat_d, k)
    ni = jnp.take_along_axis(cat_i, sel, axis=1)
    return -nd, jnp.where(jnp.isfinite(-nd), ni, -1)


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


@functools.partial(jax.jit, static_argnames=("s1", "s_rev"))
def _nnd_reverse_sample(knn_i: jax.Array, key: jax.Array, s1: int,
                        s_rev: int) -> Tuple[jax.Array, jax.Array]:
    """Sample s1 forward edges per node and scatter a bounded reverse-edge
    table [N, s_rev] (`Nhood::rnew_` analog; collisions drop samples).
    Returns (mid [N, s1] the sampled forward targets, rev [N, s_rev])."""
    N, K = knn_i.shape
    k_nb, k_slot = jax.random.split(key)
    sel1 = jax.random.randint(k_nb, (N, s1), 0, K)
    mid = jnp.take_along_axis(knn_i, sel1, axis=1)               # [N, s1]
    src = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, s1))
    slot = jax.random.randint(k_slot, (N, s1), 0, s_rev)
    rev = jnp.full((N, s_rev), -1, dtype=jnp.int32)
    # invalid targets scatter to sentinel row N and DROP (routing them to
    # row 0 with value -1 would clobber node 0's reverse samples)
    rev = rev.at[jnp.where(mid >= 0, mid, N).reshape(-1),
                 slot.reshape(-1)].set(src.reshape(-1), mode="drop")
    return mid, rev


@functools.partial(jax.jit, static_argnames=("s2", "n_rand", "chunk"))
def _nnd_round_chunk(
    space,
    knn_d: jax.Array,   # [N, K] f32 (full state)
    knn_i: jax.Array,   # [N, K] i32
    mid: jax.Array,     # [N, s1] sampled forward targets
    rev: jax.Array,     # [N, s_rev] reverse samples
    key: jax.Array,
    lo: jax.Array,      # chunk start (dynamic)
    s2: int,
    n_rand: int,
    chunk: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One NN-Descent join round for nodes [lo, lo+chunk): candidates =
    sampled neighbors-of-neighbors ∪ reverse samples ∪ random, scored with
    one gather+MXU batch, merged into the chunk's kNN rows."""
    N, K = knn_i.shape
    k_nb, k_rand = jax.random.split(key)
    mid_c = jax.lax.dynamic_slice_in_dim(mid, lo, chunk)         # [C, s1]
    rev_c = jax.lax.dynamic_slice_in_dim(rev, lo, chunk)
    kd_c = jax.lax.dynamic_slice_in_dim(knn_d, lo, chunk)
    ki_c = jax.lax.dynamic_slice_in_dim(knn_i, lo, chunk)
    C, s1 = mid_c.shape

    their = knn_i[jnp.where(mid_c >= 0, mid_c, 0)]               # [C, s1, K]
    sel2 = jax.random.randint(k_nb, (C, s1, s2), 0, K)
    hop2 = jnp.take_along_axis(their, sel2, axis=2)              # [C, s1, s2]
    hop2 = jnp.where(mid_c[:, :, None] >= 0, hop2, -1).reshape(C, s1 * s2)
    rand = jax.random.randint(k_rand, (C, n_rand), 0, N).astype(jnp.int32)

    cand = jnp.concatenate([hop2, rev_c, rand], axis=1)          # [C, M]
    me = lo + jnp.arange(C, dtype=jnp.int32)[:, None]
    cand = jnp.where(cand == me, -1, cand)

    safe = jnp.where(cand >= 0, cand, 0)
    qvecs = jax.lax.dynamic_slice_in_dim(space.data, lo, chunk
                                         ).astype(jnp.float32)
    d = space.gather_dists(qvecs, safe)
    d = jnp.where(cand >= 0, d, FINF)

    new_d, new_i = _dedup_merge_fast(kd_c, ki_c, d, cand, K)
    changed = jnp.sum(new_i != ki_c)
    knn_d = jax.lax.dynamic_update_slice_in_dim(knn_d, new_d, lo, axis=0)
    knn_i = jax.lax.dynamic_update_slice_in_dim(knn_i, new_i, lo, axis=0)
    return knn_d, knn_i, changed


@functools.partial(jax.jit, donate_argnums=(1, 2),
                   static_argnames=("s1", "s2", "s_rev", "n_rand", "chunk",
                                    "rounds", "n_chunks"))
def _nnd_rounds_dev(space, knn_d, knn_i, key, s1: int, s2: int, s_rev: int,
                    n_rand: int, chunk: int, rounds: int, n_chunks: int):
    """``rounds`` full NN-Descent rounds in ONE dispatch (lax.scan over
    rounds, fori_loop over node chunks). Host-side round loops paid one
    dispatch per chunk (~35 ms fixed each through a TPU tunnel — 372
    dispatches at 1M, VERDICT r1 #4); this pays one per ``rounds``.
    knn buffers are donated: state updates in place. Returns
    (knn_d, knn_i, changed [rounds])."""
    N = knn_i.shape[0]

    def one_round(carry, key_r):
        kd, ki = carry
        k_sample, k_round = jax.random.split(key_r)
        mid, rev = _nnd_reverse_sample(ki, k_sample, s1=s1, s_rev=s_rev)

        def chunk_body(ci, st):
            kd, ki, changed = st
            lo = jnp.minimum(ci * chunk, N - chunk)
            sub = jax.random.fold_in(k_round, ci)
            kd, ki, c = _nnd_round_chunk(
                space, kd, ki, mid, rev, sub, lo, s2=s2, n_rand=n_rand,
                chunk=chunk)
            return kd, ki, changed + c.astype(jnp.int32)

        kd, ki, changed = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (kd, ki, jnp.zeros((), jnp.int32)))
        return (kd, ki), changed

    (knn_d, knn_i), changes = jax.lax.scan(
        one_round, (knn_d, knn_i), jax.random.split(key, rounds))
    return knn_d, knn_i, changes


def _nnd_round(space, knn_d, knn_i, key, s1: int, s2: int, s_rev: int,
               n_rand: int, chunk: int = 0):
    """One full NN-Descent round, chunked over node ranges so the gather
    stays within HBM (the [C, M, D] candidate-vector tensor is the limit)."""
    N = knn_i.shape[0]
    if chunk <= 0 or chunk > N:
        chunk = N
    key, sub = jax.random.split(key)
    mid, rev = _nnd_reverse_sample(knn_i, sub, s1=s1, s_rev=s_rev)
    changed = 0
    for lo in range(0, N - chunk + 1, chunk):
        key, sub = jax.random.split(key)
        knn_d, knn_i, c = _nnd_round_chunk(
            space, knn_d, knn_i, mid, rev, sub,
            jnp.asarray(lo, dtype=jnp.int32), s2=s2, n_rand=n_rand,
            chunk=chunk)
        changed += int(c)
    rem = N % chunk
    if rem:
        key, sub = jax.random.split(key)
        knn_d, knn_i, c = _nnd_round_chunk(
            space, knn_d, knn_i, mid, rev, sub,
            jnp.asarray(N - chunk, dtype=jnp.int32), s2=s2, n_rand=n_rand,
            chunk=chunk)  # overlapping tail chunk: re-merges are harmless
        changed += int(c)
    return knn_d, knn_i, changed


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _init_chunk(space, key, lo, n: int, k: int, chunk: int):
    cand = jax.random.randint(key, (chunk, k), 0, n).astype(jnp.int32)
    me = lo + jnp.arange(chunk, dtype=jnp.int32)[:, None]
    cand = jnp.where(cand == me, (cand + 1) % n, cand)
    q = jax.lax.dynamic_slice_in_dim(space.data, lo, chunk).astype(jnp.float32)
    d = space.gather_dists(q, cand)
    pd = jnp.full((chunk, k), FINF, dtype=jnp.float32)
    pi = jnp.full((chunk, k), -1, dtype=jnp.int32)
    return _dedup_merge_fast(pd, pi, d, cand, k)


def _init_random_knn(space, n: int, k: int, seed: int, chunk: int = 0):
    key = jax.random.PRNGKey(seed)
    if chunk <= 0 or chunk > n:
        chunk = n
    kd = jnp.zeros((n, k), dtype=jnp.float32)
    ki = jnp.zeros((n, k), dtype=jnp.int32)
    lo = 0
    while lo < n:
        start = min(lo, n - chunk)
        key, sub = jax.random.split(key)
        d, i = _init_chunk(space, sub, jnp.asarray(start, jnp.int32),
                           n=n, k=k, chunk=chunk)
        kd = jax.lax.dynamic_update_slice_in_dim(kd, d, start, axis=0)
        ki = jax.lax.dynamic_update_slice_in_dim(ki, i, start, axis=0)
        lo += chunk
    return kd, ki


def build_knn_graph(
    space,
    n: int,
    k: int,
    max_iters: int = 0,
    seed: int = 0,
    sample_rate: float = 0.5,
    min_update_frac: float = 0.001,
    exact_threshold: int = 4096,
    chunk: int = 0,
    as_numpy: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Approximate kNN graph of the first ``n`` valid slots of ``space``.

    Returns (dists [n,k] f32, ids [n,k] i32). Falls back to exact tiled
    search below ``exact_threshold`` (MXU all-pairs is faster there).
    """
    if max_iters <= 0:
        # cluster init (below) starts near-converged; a few refine rounds do
        max_iters = 12 if n > 100_000 else max(12, int(np.log2(max(n, 2))) + 6)
    if n <= exact_threshold:
        from .knn import exact_knn

        data = np.asarray(space.data[:n].astype(jnp.float32))
        d, i = exact_knn(data, k, metric=space.metric)
        if as_numpy:
            return d, i
        return jnp.asarray(d), jnp.asarray(i)

    import os

    if (os.environ.get("ALAYA_NND_BF16", "0") == "1"
            and getattr(space, "bf16", True) is False):
        # opt-in ONLY. Measured negative at 1M x 960 (s1m_gist3): distance
        # concentration at high dim puts true neighbor gaps inside bf16's
        # ~0.4% relative error, NN-Descent churn never fell below 84%, and
        # the resulting graph searched at recall 0.22. High dim needs MORE
        # distance precision in the rounds, not less.
        space = space.replace(data=space.data.astype(jnp.bfloat16),
                              bf16=True)
    s1 = max(4, int(k * sample_rate))
    s2 = max(4, int(k * sample_rate) // 2)
    s_rev = max(8, k // 2)
    n_rand = 4
    if chunk <= 0:
        # bound the [chunk, ~s1·s2+s_rev, D] gather tensor to ~2.5 GB
        # (floor 2048, not 8192: at D=960 an 8192 floor would spill to
        # 4.6 GB and risk HBM exhaustion next to the f32+bf16 data copies)
        dim = space.data.shape[1]
        m_width = s1 * s2 + s_rev + n_rand
        chunk = min(n, max(2048, int(2.5e9 / (m_width * dim * 4))))

    t0 = time.time()
    if n > 100_000:
        knn_d, knn_i = _init_cluster_knn(space, n, k, seed, chunk=chunk)
        log.info("nndescent: cluster init done")
    else:
        knn_d, knn_i = _init_random_knn(space, n, k, seed, chunk=chunk)
    key = jax.random.PRNGKey(seed + 1)
    n_chunks = -(-n // min(chunk, n))
    block = 4  # rounds per dispatch: convergence checked between blocks
    it = 0
    while it < max_iters:
        r = min(block, max_iters - it)
        key, sub = jax.random.split(key)
        knn_d, knn_i, changes = _nnd_rounds_dev(
            space, knn_d, knn_i, sub, s1=s1, s2=s2, s_rev=s_rev,
            n_rand=n_rand, chunk=min(chunk, n), rounds=r, n_chunks=n_chunks)
        changes = np.asarray(changes)
        it += r
        log.info("nndescent rounds %d-%d: changed=%s (%.1fs)", it - r, it - 1,
                 changes.tolist(), time.time() - t0)
        if changes[-1] <= min_update_frac * n * k:
            break
    if as_numpy:
        return np.asarray(knn_d), np.asarray(knn_i)
    return knn_d, knn_i


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("chunk",))
def _assign_chunk_into(assign_buf, space, anchors_vecs, anchors_sq, lo,
                       chunk: int):
    """Nearest anchor of each node in [lo, lo+chunk) — one bf16 MXU tile,
    accumulated into a donated device buffer. The previous per-chunk
    blocking download cost ~245 tunnel round-trips at 1M (the bulk of the
    70 s cluster-init attribution); now the host sees ONE [n] download."""
    q = jax.lax.dynamic_slice_in_dim(space.data, lo, chunk).astype(jnp.float32)
    dot = jnp.dot(q.astype(jnp.bfloat16), anchors_vecs.T.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    d = anchors_sq[None, :] - 2.0 * dot        # |q|² constant per row: skip
    a = jnp.argmin(d, axis=1).astype(jnp.int32)
    return jax.lax.dynamic_update_slice_in_dim(assign_buf, a, lo, axis=0)


def _init_cluster_knn(space, n: int, k: int, seed: int, chunk: int):
    """Cluster-local kNN init: random anchors → exact anchor kNN → assign
    every node to its nearest anchor → seed each node's kNN list with random
    members of its own cluster. NN-Descent then only has to refine locally,
    converging in a handful of rounds even at 1M+ (random init needs ~log n
    rounds and still under-converges — measured)."""
    rng = np.random.default_rng(seed)
    n_anchors = int(min(max(256, n // 256), 16384))
    anchors = np.sort(rng.choice(n, size=n_anchors, replace=False)).astype(np.int32)
    a_vecs = space.data[jnp.asarray(anchors)].astype(jnp.float32)
    a_sq = jnp.sum(a_vecs * a_vecs, axis=-1)

    starts = list(range(0, n - chunk + 1, chunk)) or [0]
    if n % chunk and starts[-1] + chunk < n:
        starts.append(max(0, n - chunk))
    c = min(chunk, n)
    chunk_starts = jnp.asarray(
        np.minimum(np.asarray(starts, dtype=np.int32), n - c))
    t0 = time.time()
    assign_dev = _assign_all(space, a_vecs, a_sq, chunk_starts, n=n, chunk=c)
    assign = np.asarray(assign_dev)  # one download for the host group-by
    log.info("cluster init: assign+download %.1fs", time.time() - t0)

    # host group-by: members sorted by cluster. Only the [n] permutation and
    # the tiny per-cluster tables go back up — the candidate matrix itself is
    # drawn in-jit (at 1M the old host-built [n, 2k] int32 upload was 256 MB
    # through the tunnel, the bulk of warm cluster-init wall time).
    order = np.argsort(assign, kind="stable").astype(np.int32)
    counts = np.bincount(assign, minlength=n_anchors).astype(np.int32)
    starts_c = np.zeros(n_anchors, dtype=np.int32)
    np.cumsum(counts[:-1], out=starts_c[1:])
    order_dev = jnp.asarray(order)
    counts_dev = jnp.asarray(counts)
    starts_dev = jnp.asarray(starts_c)

    # score + dedup-merge on device: one scan dispatch over all chunks
    key = jax.random.PRNGKey(seed ^ 0x5EED)
    return _cluster_score_all(space, assign_dev, order_dev, counts_dev,
                              starts_dev, chunk_starts, key, k=k, chunk=c,
                              n=n)


@functools.partial(jax.jit, static_argnames=("n", "chunk"))
def _assign_all(space, anchors_vecs, anchors_sq, chunk_starts, n: int,
                chunk: int):
    """Nearest anchor of every node: one scan dispatch over all chunks."""
    assign = jnp.zeros((n,), dtype=jnp.int32)

    def step(buf, lo):
        return _assign_chunk_into(buf, space, anchors_vecs, anchors_sq, lo,
                                  chunk=chunk), None

    assign, _ = jax.lax.scan(step, assign, chunk_starts)
    return assign


@functools.partial(jax.jit, static_argnames=("k", "chunk", "n"))
def _cluster_score_all(space, assign_dev, order_dev, counts_dev, starts_dev,
                       chunk_starts, key, k: int, chunk: int, n: int):
    """Draw + score every node's init candidates entirely on device, one
    scan dispatch: k random members of the node's own cluster (locality) ∪
    k random global nodes (the long-range links NN-Descent's join
    exploits)."""

    def step(carry, lo):
        kd, ki = carry
        a = jax.lax.dynamic_slice_in_dim(assign_dev, lo, chunk)    # [C]
        cnt = jnp.maximum(counts_dev[a], 1)                        # [C]
        k1, k2 = jax.random.split(jax.random.fold_in(key, lo))
        pos = jax.random.randint(k1, (chunk, k), 0, cnt[:, None])
        local = order_dev[(starts_dev[a][:, None] + pos) % n]
        rand = jax.random.randint(k2, (chunk, k), 0, n)
        cc = jnp.concatenate([local, rand], axis=1).astype(jnp.int32)
        me = lo + jnp.arange(chunk, dtype=jnp.int32)[:, None]
        cc = jnp.where(cc == me, -1, cc)
        q = jax.lax.dynamic_slice_in_dim(space.data, lo, chunk
                                         ).astype(jnp.float32)
        safe = jnp.where(cc >= 0, cc, 0)
        d = space.gather_dists(q, safe)
        d = jnp.where(cc >= 0, d, FINF)
        pd = jnp.full((chunk, k), FINF, dtype=jnp.float32)
        pi = jnp.full((chunk, k), -1, dtype=jnp.int32)
        nd, ni = _dedup_merge_fast(pd, pi, d, cc, k)
        kd = jax.lax.dynamic_update_slice_in_dim(kd, nd, lo, axis=0)
        ki = jax.lax.dynamic_update_slice_in_dim(ki, ni, lo, axis=0)
        return (kd, ki), None

    kd = jnp.zeros((n, k), dtype=jnp.float32)
    ki = jnp.zeros((n, k), dtype=jnp.int32)
    (kd, ki), _ = jax.lax.scan(step, (kd, ki), chunk_starts)
    return kd, ki
