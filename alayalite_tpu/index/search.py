"""Batched lockstep beam search — the TPU-native query engine.

This replaces the reference's coroutine-per-query beam search
(/root/reference/include/executor/jobs/graph_search_job.hpp:221-335 and the
Scheduler/Worker stack, scheduler.hpp:39-222): instead of hiding one cache
miss per coroutine switch, B queries advance one hop per jitted step, so HBM
gathers are hidden by sheer width and every distance batch lands on the
MXU/VPU.

Per-query state (all [B, ...] arrays inside one ``lax.while_loop``):
  pool_d/pool_i/pool_c : the ef-wide best-first pool = the reference's
                         LinearPool (query_utils.hpp:236-312). ``pool_c`` is
                         the checked ("expanded") flag the reference packs
                         into the id's MSB.
  visited              : uint32 bitmask [B, ceil(C/32)] = DynamicBitset
                         (query_utils.hpp:69-110), per query.

Termination matches LinearPool::has_next: a query is done when its pool holds
no unchecked entry (anything further than the ef-th best was dropped by the
top-k merge, which is exactly the hnswlib ef-search stopping rule).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.topk import merge_topk_dedup, merge_topk_with_flags

FINF = float("inf")  # plain python: jnp constants at module level would init the backend at import


def _pop_best_m(pool_d, pool_i, pool_c, m: int):
    """Select the M best unchecked pool entries WITHOUT a sort.

    The pool is kept sorted ascending by distance (merge_topk_with_flags
    returns top_k output, which is sorted), so the M best unchecked entries
    are the first M slots where ~checked — a cumsum rank-select. XLA lowers
    the previous tiny-row ``top_k`` to a full sort (~2.1 ms/hop at B=4096 on
    v5e vs 0.46 ms for this — measured, scripts/opt_hop.py).

    Returns (u [B, M] popped ids, active [B, M], pool_c with picks marked).
    """
    unchecked = (~pool_c) & (pool_i >= 0) & jnp.isfinite(pool_d)
    rank = jnp.cumsum(unchecked.astype(jnp.int32), axis=1) - 1      # [B, L]
    pick = unchecked & (rank < m)
    onehot = pick[:, None, :] & (
        rank[:, None, :] == jnp.arange(m, dtype=jnp.int32)[None, :, None])
    u = jnp.sum(jnp.where(onehot, pool_i[:, None, :], 0), axis=2)   # [B, M]
    active = jnp.any(onehot, axis=2)
    return u, active, pool_c | pick


def _visited_probe_and_set(visited: jax.Array, ids: jax.Array):
    """Test-and-set ids in per-query bitmasks.

    visited: uint32 [B, W]; ids: int32 [B, K] (-1 = skip). Returns
    (new_visited, fresh_mask [B, K] bool aligned with a *sorted* copy of ids,
    sorted_ids).

    Duplicate ids within a row are deduplicated by sorting (K is small), so
    the scatter-add of single bits never carries.
    """
    B, W = visited.shape
    ids_s = jnp.sort(ids, axis=1)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -2, dtype=ids_s.dtype), ids_s[:, :-1]], axis=1)
    ok = (ids_s >= 0) & (ids_s != prev)
    word = jnp.where(ok, ids_s >> 5, 0)
    bit = jnp.where(ok, jnp.uint32(1) << (ids_s & 31).astype(jnp.uint32), jnp.uint32(0))
    old = jnp.take_along_axis(visited, word, axis=1)
    fresh = ok & ((old & bit) == 0)
    add = jnp.where(fresh, bit, jnp.uint32(0))
    flat_idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * W + word).reshape(-1)
    new_visited = visited.reshape(-1).at[flat_idx].add(add.reshape(-1)).reshape(B, W)
    return new_visited, fresh, ids_s


def _expand(space, q, visited, pool_d, pool_i, pool_c, cand_ids, ef: int):
    """Probe cand_ids against visited, compute distances for fresh ones and
    merge into the pool. cand_ids: [B, K] int32, -1 = skip."""
    visited, fresh, ids_s = _visited_probe_and_set(visited, cand_ids)
    safe = jnp.where(fresh, ids_s, 0)
    d = space.gather_dists(q, safe)
    d = jnp.where(fresh, d, FINF)
    new_i = jnp.where(fresh, ids_s, -1)
    pool_d, pool_i, pool_c = merge_topk_with_flags(
        pool_d, pool_i, pool_c,
        d, new_i, jnp.zeros_like(fresh),
        ef,
    )
    return visited, pool_d, pool_i, pool_c


def _expand_popring(space, q, popring, pool_d, pool_i, pool_c, cand_ids,
                    ef: int):
    """Popring-based expand (the r2 visited design, see block_beam_search):
    stale = already-expanded. The in-pool compare the block path needs is
    REDUNDANT here: raw-space distances of equal ids are identical every
    hop (same exact formula), so any candidate duplicating an unchecked
    pool entry carries an identical (d, id, flag) triple and collapses
    inside merge_topk_dedup — and checked pool entries were popped, so
    they are already in the ring. K x P compares instead of K x (P+L)
    (the hop's stale check is its worst-lowering XLA op — DESIGN.md
    "fused-hop kernel" entry; halving its width is the measured win the
    Pallas rewrite was chasing)."""
    stale = jnp.any(cand_ids[:, :, None] == popring[:, None, :], axis=2)
    fresh = (cand_ids >= 0) & ~stale
    safe = jnp.where(fresh, cand_ids, 0)
    d = space.gather_dists(q, safe)
    d = jnp.where(fresh, d, FINF)
    return merge_topk_dedup(
        pool_d, pool_i, pool_c, d, jnp.where(fresh, cand_ids, -1),
        jnp.zeros_like(fresh), ef)


@functools.partial(jax.jit,
                   static_argnames=("k", "ef", "max_iters", "n_expand",
                                    "visited_mode", "ring_size",
                                    "track_pops"))
def beam_search(
    space,
    nbrs: jax.Array,       # [C, R] int32 adjacency
    seeds: jax.Array,      # [B, S] int32 seed ids (-1 pad)
    queries: jax.Array,    # [B, D] f32 (already space.prep_query'd)
    k: int,
    ef: int,
    max_iters: int = 0,
    valid: Optional[jax.Array] = None,  # [C] bool result filter (tombstones)
    n_expand: int = 1,
    visited_mode: str = "ring",
    ring_size: int = 512,
    track_pops: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (dists [B, k] f32, ids [B, k] int32, -1 where absent).

    ``n_expand`` > 1 pops the best M unchecked entries per step (CAGRA-style
    multi-expansion): ~M× fewer while_loop iterations and M·R-wide distance
    batches that keep the MXU busy, at the cost of a few extra expansions vs
    the reference's strictly-greedy single pop. Recall at equal ef is
    unchanged or slightly better (wider frontier).

    ``visited_mode``: "ring" (default) — pop-ring + in-pool membership +
    merge-sort dedup, scatter-free (see _expand_popring); "bitmask" — exact
    per-query bitset (the reference's DynamicBitset semantics), ~2x slower
    per hop on TPU.
    """
    B = queries.shape[0]
    C = nbrs.shape[0]
    L = max(int(ef), int(k))
    M = max(1, int(n_expand))
    W = -(-C // 32)
    if max_iters <= 0:
        # measured on v5e (scripts/tune_hops.py): recall saturates by about
        # L/M + 4 hops; the lockstep batch pays for stragglers, so a tight
        # cap buys ~1.5x QPS at < 0.005 recall cost
        max_iters = max(8, L // M + 4)
    use_ring = visited_mode == "ring"

    pool_d = jnp.full((B, L), FINF, dtype=jnp.float32)
    pool_i = jnp.full((B, L), -1, dtype=jnp.int32)
    pool_c = jnp.zeros((B, L), dtype=bool)
    # "ring" mode r2 redesign: the visited structure is a pop-ring sized to
    # hold EVERY node the loop can expand (M * max_iters) — exact
    # checked-once semantics — plus the in-pool membership check; batch
    # duplicates collapse inside the merge sort (merge_topk_dedup).
    # ``track_pops`` and ``ring_size`` are retained for signature
    # compatibility; the pop-ring subsumes both.
    del track_pops
    P = max(8, -(-(M * max_iters) // 8) * 8)
    if use_ring:
        visited = jnp.full((B, P), -1, dtype=jnp.int32)
        pool_d, pool_i, pool_c = _expand_popring(
            space, queries, visited, pool_d, pool_i, pool_c, seeds, L)
    else:
        visited = jnp.zeros((B, W), dtype=jnp.uint32)
        visited, pool_d, pool_i, pool_c = _expand(
            space, queries, visited, pool_d, pool_i, pool_c, seeds, L)

    def has_next(pool_d, pool_i, pool_c):
        return (~pool_c) & (pool_i >= 0) & jnp.isfinite(pool_d)

    def cond(state):
        it, visited, pool_d, pool_i, pool_c = state
        return (it < max_iters) & jnp.any(has_next(pool_d, pool_i, pool_c))

    def body(state):
        it, visited, pool_d, pool_i, pool_c = state
        u, active, pool_c = _pop_best_m(pool_d, pool_i, pool_c, M)  # [B, M]
        nb = nbrs[jnp.where(active, u, 0)]                          # [B, M, R]
        nb = jnp.where(active[:, :, None], nb, -1).reshape(B, -1)
        if use_ring:
            visited = jnp.concatenate(
                [visited[:, M:], jnp.where(active, u, -1)], axis=1)
            pool_d, pool_i, pool_c = _expand_popring(
                space, queries, visited, pool_d, pool_i, pool_c, nb, L)
        else:
            visited, pool_d, pool_i, pool_c = _expand(
                space, queries, visited, pool_d, pool_i, pool_c, nb, L)
        return it + 1, visited, pool_d, pool_i, pool_c

    state = (jnp.zeros((), jnp.int32), visited, pool_d, pool_i, pool_c)
    _, visited, pool_d, pool_i, pool_c = jax.lax.while_loop(
        cond, body, state)

    # Result extraction: drop tombstoned / absent entries, return best k.
    d = pool_d
    if valid is not None:
        node_ok = valid[jnp.clip(pool_i, 0, C - 1)] & (pool_i >= 0)
        d = jnp.where(node_ok, d, FINF)
    else:
        d = jnp.where(pool_i >= 0, d, FINF)
    nd, sel = jax.lax.top_k(-d, k)
    ids = jnp.take_along_axis(pool_i, sel, axis=1)
    out_d = -nd
    ids = jnp.where(jnp.isfinite(out_d), ids, -1)
    return out_d, ids


@jax.jit
def overlay_descend(space, level_ids, level_nbrs, level_down,
                    start: jax.Array, queries: jax.Array) -> jax.Array:
    """Greedy descent within one overlay level (overlay_graph.hpp:initialize /
    hnswlib.hpp greedy layers>0 loop), batched over queries.

    start: [B] local indices; returns [B] local indices into the level below.
    """
    B = queries.shape[0]

    def cond(state):
        cur, cur_d, improved = state
        return jnp.any(improved)

    def body(state):
        cur, cur_d, improved = state
        nb_local = level_nbrs[cur]                         # [B, R2]
        ok = nb_local >= 0
        gids = level_ids[jnp.where(ok, nb_local, 0)]       # [B, R2] global
        d = space.gather_dists(queries, gids)
        d = jnp.where(ok, d, FINF)
        j = jnp.argmin(d, axis=1)
        best_d = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
        best_local = jnp.take_along_axis(nb_local, j[:, None], axis=1)[:, 0]
        better = best_d < cur_d
        new_cur = jnp.where(better & improved, best_local, cur)
        new_d = jnp.where(better & improved, best_d, cur_d)
        return new_cur, new_d, improved & better

    cur0 = start
    d0 = space.gather_dists(queries, level_ids[cur0][:, None])[:, 0]
    cur, _, _ = jax.lax.while_loop(cond, body, (cur0, d0, jnp.ones((B,), bool)))
    return level_down[cur]


def graph_seeds(space, eps: jax.Array, overlay, queries: jax.Array
                ) -> jax.Array:
    """Compute seed ids for beam search: overlay greedy descent if the graph
    has one (graph.hpp initialize_search), else the stored entry points.

    The descent starts at the top level's first LIVE slot — removals +
    compaction tombstone overlay slots in place (overlay_update.
    strip_overlay sets ids=-1), so slot 0 may be dead; descending from a
    dead slot scores a garbage baseline and can seed every query at the
    removed node. Dead slots are unreachable mid-descent (their in-edges
    are cleared), so only the entry needs the guard; if the whole top
    level is dead (or the descent somehow lands invalid) fall back to
    the stored entry points."""
    B = queries.shape[0]
    if len(overlay) == 0:
        return jnp.broadcast_to(eps[None, :], (B, eps.shape[0]))
    top = overlay[0]
    start = jnp.argmax(top.ids >= 0).astype(jnp.int32)
    cur = jnp.full((B,), start, dtype=jnp.int32)
    for lvl in overlay:
        cur = overlay_descend(space, lvl.ids, lvl.nbrs, lvl.down, cur, queries)
    ok = jnp.any(top.ids >= 0) & (cur >= 0)
    return jnp.where(ok, cur, eps[0])[:, None]


@functools.partial(jax.jit,
                   static_argnames=("k", "ef", "max_iters", "n_expand",
                                    "ring_size"))
def block_beam_search(
    space,                 # block space: query_ctx/estimate_for/gather_dists
    seeds: jax.Array,      # [B, S] int32 seed ids (-1 pad)
    queries: jax.Array,    # [B, D] f32 (already prep_query'd)
    k: int,
    ef: int,
    max_iters: int = 0,
    valid: Optional[jax.Array] = None,
    n_expand: int = 1,
    ring_size: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """Beam search over a *block* space (adjacency + quantized neighbor
    payloads packed per node): RaBitQSpace (1-bit + correction factors — the
    reference's rabitq_search, graph_search_job.hpp:92-220) or BQGSpace
    (block-SQ8). One fat gather per popped node replaces R thin ones; the
    final rerank re-scores the whole ef-pool with exact raw distances
    (covering the reference's supplement semantics).

    1-bit spaces additionally keep the reference's RESULT POOL
    (graph_search_job.hpp:92-153): every popped node's EXACT distance (the
    d_center the estimator needs anyway) merges into a k-wide exact pool,
    so a true neighbor that was expanded can never be evicted later by
    estimator noise — the failure mode that forced rabitq_ef_boost=4 on
    the plain estimate-pool design. Costs one tiny [B, k+M] merge per hop;
    gated to bits==1 (sq8-grade estimates don't evict true NNs).
    """
    B = queries.shape[0]
    C = space.capacity
    L = max(int(ef), int(k))
    M = max(1, int(n_expand))
    if max_iters <= 0:
        max_iters = max(8, L // M + 4)
    # ALAYA_RES_POOL=0 is the A/B kill-switch (read at trace time)
    use_res_pool = (getattr(space, "bits", 0) == 1
                    and os.environ.get("ALAYA_RES_POOL", "1") != "0")

    ctx = space.query_ctx(queries)

    pool_d = jnp.full((B, L), FINF, dtype=jnp.float32)
    pool_i = jnp.full((B, L), -1, dtype=jnp.int32)
    pool_c = jnp.zeros((B, L), dtype=bool)
    # pop-ring: every node this loop can ever expand (M * max_iters slots),
    # so re-expansion is impossible — exact hnswlib checked-once semantics.
    # Together with the in-pool check it is the COMPLETE visited structure:
    # a rejected candidate can be re-scored after eviction (wasted score
    # only), and within-hop duplicates are neutralized inside the merge
    # sort (merge_topk_dedup), replacing the K-wide candidate ring + K x K
    # dup compare of the round-1 design (2.1 -> ~0.7 ms/hop at B=4096).
    P = max(8, -(-(M * max_iters) // 8) * 8)
    popring = jnp.full((B, P), -1, dtype=jnp.int32)

    # seeds enter with exact distances (dups in the seed list collapse in
    # the dedup merge)
    seed_safe = jnp.where(seeds >= 0, seeds, 0)
    d_seed = jnp.where(seeds >= 0, space.gather_dists(queries, seed_safe),
                       FINF)
    pool_d, pool_i, pool_c = merge_topk_dedup(
        pool_d, pool_i, pool_c, d_seed, jnp.where(seeds >= 0, seeds, -1),
        jnp.zeros(seeds.shape, bool), L)

    def has_next(pool_d, pool_i, pool_c):
        return (~pool_c) & (pool_i >= 0) & jnp.isfinite(pool_d)

    res_d = jnp.full((B, int(k)), FINF, dtype=jnp.float32)
    res_i = jnp.full((B, int(k)), -1, dtype=jnp.int32)

    def cond(state):
        it, popring, pool_d, pool_i, pool_c, res_d, res_i = state
        return (it < max_iters) & jnp.any(has_next(pool_d, pool_i, pool_c))

    def body(state):
        it, popring, pool_d, pool_i, pool_c, res_d, res_i = state
        u, active, pool_c = _pop_best_m(pool_d, pool_i, pool_c, M)  # [B, M]
        u_safe = jnp.where(active, u, 0)
        popring = jnp.concatenate(
            [popring[:, M:], jnp.where(active, u, -1)], axis=1)
        if use_res_pool:
            # exact distances of the popped nodes into the result pool
            # (the reference computes the same d_center for the estimator)
            du = space.gather_dists(queries, u_safe)
            du = jnp.where(active, du, FINF)
            res_d, res_i, _ = merge_topk_dedup(
                res_d, res_i, jnp.zeros(res_i.shape, bool),
                du, jnp.where(active, u, -1),
                jnp.zeros(u.shape, bool), int(k))
        # estimate all M popped nodes' neighbor blocks in one batch
        if hasattr(space, "estimate_many"):
            est, nids = space.estimate_many(ctx, u_safe)            # [B, M*R]
            R = nids.shape[1] // M
            nids = jnp.where(jnp.repeat(active, R, axis=1), nids, -1)
        else:
            est, nids = jax.vmap(space.estimate_for, in_axes=(None, 1),
                                 out_axes=1)(ctx, u_safe)
            est = est.reshape(B, -1)                                # [B, M*R]
            nids = jnp.where(active[:, :, None], nids, -1).reshape(B, -1)
        seen = jnp.concatenate([popring, pool_i], axis=1)           # [B, P+L]
        stale = jnp.any(nids[:, :, None] == seen[:, None, :], axis=2)
        fresh = (nids >= 0) & ~stale
        est = jnp.where(fresh, est, FINF)
        # (measured r2: an approx_max_k pre-select shrinking the merge from
        # (L+M*R)- to (L+L')-wide is 40% SLOWER in-loop — the approx top-k
        # lowering costs more than the narrower sort saves. Negative
        # result; merge the full candidate row.)
        pool_d, pool_i, pool_c = merge_topk_dedup(
            pool_d, pool_i, pool_c,
            est, jnp.where(fresh, nids, -1), jnp.zeros_like(fresh), L)
        return it + 1, popring, pool_d, pool_i, pool_c, res_d, res_i

    state = (jnp.zeros((), jnp.int32), popring, pool_d, pool_i, pool_c,
             res_d, res_i)
    _, popring, pool_d, pool_i, pool_c, res_d, res_i = jax.lax.while_loop(
        cond, body, state)

    # exact rerank of the whole pool (supplement semantics); 1-bit spaces
    # union in the exact result pool accumulated over every popped node
    safe = jnp.where(pool_i >= 0, pool_i, 0)
    d_exact = space.gather_dists(queries, safe)
    if use_res_pool:
        pool_i = jnp.concatenate([pool_i, res_i], axis=1)
        d_exact = jnp.concatenate([d_exact, res_d], axis=1)
    node_ok = pool_i >= 0
    if valid is not None:
        node_ok &= valid[jnp.clip(pool_i, 0, C - 1)]
    # result-dedup safety net: spaces whose per-block estimates of the same
    # node differ (so dup copies are not sort-adjacent in merge_topk_dedup)
    # can leave two live copies in the pool — and a popped node sits in
    # both the candidate and result pools. L x L lower-tri compare is
    # ~free at pool width
    Lw = pool_i.shape[1]
    dup = jnp.any((pool_i[:, :, None] == pool_i[:, None, :])
                  & jnp.tril(jnp.ones((Lw, Lw), bool), k=-1)[None], axis=2)
    d_exact = jnp.where(node_ok & ~dup, d_exact, FINF)
    nd, sel = jax.lax.top_k(-d_exact, k)
    ids = jnp.take_along_axis(pool_i, sel, axis=1)
    out_d = -nd
    return out_d, jnp.where(jnp.isfinite(out_d), ids, -1)


def rabitq_beam_search(space, seeds, queries, k, ef, max_iters=0, valid=None,
                       n_expand=1, ring_size=512):
    """Back-compat alias: RaBitQ search is block_beam_search over the
    RaBitQSpace protocol."""
    return block_beam_search(space, seeds, queries, k=k, ef=ef,
                             max_iters=max_iters, valid=valid,
                             n_expand=n_expand, ring_size=ring_size)


@functools.partial(jax.jit,
                   static_argnames=("k", "ef", "max_iters", "n_expand",
                                    "visited_mode", "ring_size", "qchunk",
                                    "exact_rerank"))
def graph_search_device(
    space,
    nbrs: jax.Array,
    eps: jax.Array,             # [E] entry points (-1 pad)
    overlay,                    # tuple of OverlayLevel (may be empty)
    q_all: jax.Array,           # [Q, D] prepped queries, Q % qchunk == 0
    k: int,
    ef: int,
    max_iters: int = 0,
    valid: Optional[jax.Array] = None,
    n_expand: int = 8,
    visited_mode: str = "ring",
    ring_size: int = 512,
    qchunk: int = 4096,
    exact_rerank: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """The full graph query pipeline — overlay greedy descent, lockstep beam,
    exact re-score — for an arbitrarily large batch in ONE program (queries
    sliced in-jit via lax.map). A serving call costs one dispatch; through a
    TPU tunnel each dispatch has a ~35ms fixed floor."""
    Q, D = q_all.shape
    S = Q // qchunk

    def one(q):
        seeds = graph_seeds(space, eps, overlay, q)
        d, i = beam_search(space, nbrs, seeds, q, k=k, ef=ef,
                           max_iters=max_iters, valid=valid,
                           n_expand=n_expand, visited_mode=visited_mode,
                           ring_size=ring_size)
        if exact_rerank:
            safe = jnp.where(i >= 0, i, 0)
            vecs = space.data[safe].astype(jnp.float32)
            dot = jnp.einsum("bkd,bd->bk", vecs, q,
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
            if space.metric == "ip":
                dd = -dot
            else:
                q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
                dd = jnp.maximum(q_sq + space.sq_norms[safe] - 2.0 * dot, 0.0)
            dd = jnp.where(i >= 0, dd, FINF)
            nd, sel = jax.lax.top_k(-dd, k)
            i = jnp.take_along_axis(i, sel, axis=1)
            d = -nd
            i = jnp.where(jnp.isfinite(d), i, -1)
        return d, i

    d, i = jax.lax.map(one, q_all.reshape(S, qchunk, D))
    return d.reshape(Q, k), i.reshape(Q, k)


def seed_sample_arrays(data: jax.Array, ids: jax.Array, user_metric):
    """Build the (ids, vecs bf16, sq_norms) triple scan_seeds consumes.

    One place for the metric rule shared by the engine's search-time
    sample, the QG build's pool scan, and the sharded block search:
    scan_seeds scores ``sq − 2·dot``; under IP the ordering must be by
    ``−dot`` alone, so the norms are zeroed (cos keeps them — data is
    normalized at insert)."""
    vec = data[ids].astype(jnp.float32)
    sq = (jnp.zeros((vec.shape[0],), jnp.float32) if user_metric == "ip"
          else jnp.sum(vec * vec, axis=1))
    return ids, vec.astype(jnp.bfloat16), sq


def scan_seeds(q: jax.Array, sample_ids: jax.Array, sample_vecs: jax.Array,
               sample_sq: jax.Array, nseed: int = 8) -> jax.Array:
    """Per-query entry points from ONE MXU pass over a point sample.

    The hop-schedule sweep (results/sweep_hop_sched.json) showed recall is
    limited by serial hop depth from shared entry points; a [B, S] bf16
    scan (S=4096 at D=128: ~4 GFLOP, trivial on the MXU) starts each query
    2-4 hops closer: bsq8@100k holds 0.957 recall at 4 hops instead of 8 —
    238k -> 438k chip QPS (scripts/proto_seedscan.py). Fills the role the
    overlay hierarchy plays for raw graphs (the reference's upper HNSW
    layers, hnswlib.hpp greedy descent) for block indices, TPU-style.

    Seed selection uses the approximate top-k unit — exact top-k of a
    4096-wide row is a full sort (~1.5 ms/chunk), and seeds only need to
    be *close*.
    """
    dot = jnp.dot(q.astype(jnp.bfloat16), sample_vecs.T,
                  preferred_element_type=jnp.float32)       # [B, S]
    d = sample_sq[None, :] - 2.0 * dot
    if d.shape[1] > 4 * nseed:
        _, sel = jax.lax.approx_max_k(-d, nseed, recall_target=0.9)
    else:
        _, sel = jax.lax.top_k(-d, nseed)
    return sample_ids[sel]


@functools.partial(jax.jit,
                   static_argnames=("k", "ef", "max_iters", "n_expand",
                                    "ring_size", "qchunk"))
def block_search_device(
    space,                      # block space (RaBitQ / BQG)
    eps: jax.Array,
    q_all: jax.Array,
    k: int,
    ef: int,
    max_iters: int = 0,
    valid: Optional[jax.Array] = None,
    n_expand: int = 8,
    ring_size: int = 256,
    qchunk: int = 4096,
    seed_sample: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """block_beam_search for a large batch in one dispatch (lax.map).

    ``seed_sample`` = (ids [S], vecs [S, D] bf16, sq_norms [S]) enables the
    per-query seed scan (see scan_seeds); None falls back to the shared
    entry points ``eps``.
    """
    Q, D = q_all.shape
    S = Q // qchunk

    def one(q):
        if seed_sample is not None:
            seeds = scan_seeds(q, *seed_sample)
        else:
            seeds = jnp.broadcast_to(eps[None, :], (q.shape[0], eps.shape[0]))
        return block_beam_search(space, seeds, q, k=k, ef=ef,
                                 max_iters=max_iters, valid=valid,
                                 n_expand=n_expand, ring_size=ring_size)

    d, i = jax.lax.map(one, q_all.reshape(S, qchunk, D))
    return d.reshape(Q, k), i.reshape(Q, k)
