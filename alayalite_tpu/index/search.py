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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.topk import merge_topk_with_flags

FINF = float("inf")  # plain python: jnp constants at module level would init the backend at import


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


@functools.partial(jax.jit,
                   static_argnames=("k", "ef", "max_iters", "n_expand"))
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
) -> Tuple[jax.Array, jax.Array]:
    """Returns (dists [B, k] f32, ids [B, k] int32, -1 where absent).

    ``n_expand`` > 1 pops the best M unchecked entries per step (CAGRA-style
    multi-expansion): ~M× fewer while_loop iterations and M·R-wide distance
    batches that keep the MXU busy, at the cost of a few extra expansions vs
    the reference's strictly-greedy single pop. Recall at equal ef is
    unchanged or slightly better (wider frontier).
    """
    B = queries.shape[0]
    C = nbrs.shape[0]
    L = max(int(ef), int(k))
    M = max(1, int(n_expand))
    W = -(-C // 32)
    if max_iters <= 0:
        max_iters = (4 * L) // M + 32

    pool_d = jnp.full((B, L), FINF, dtype=jnp.float32)
    pool_i = jnp.full((B, L), -1, dtype=jnp.int32)
    pool_c = jnp.zeros((B, L), dtype=bool)
    visited = jnp.zeros((B, W), dtype=jnp.uint32)

    visited, pool_d, pool_i, pool_c = _expand(
        space, queries, visited, pool_d, pool_i, pool_c, seeds, L)

    slot_iota = jnp.arange(L, dtype=jnp.int32)[None, :]

    def has_next(pool_d, pool_i, pool_c):
        return (~pool_c) & (pool_i >= 0) & jnp.isfinite(pool_d)

    def cond(state):
        it, visited, pool_d, pool_i, pool_c = state
        return (it < max_iters) & jnp.any(has_next(pool_d, pool_i, pool_c))

    def body(state):
        it, visited, pool_d, pool_i, pool_c = state
        cand = jnp.where(has_next(pool_d, pool_i, pool_c), pool_d, FINF)
        negd, sel = jax.lax.top_k(-cand, M)                         # [B, M]
        active = jnp.isfinite(-negd)                                # [B, M]
        u = jnp.take_along_axis(pool_i, sel, axis=1)                # [B, M]
        pool_c = pool_c | jnp.any(
            (slot_iota[:, None, :] == sel[:, :, None]) & active[:, :, None],
            axis=1)
        nb = nbrs[jnp.where(active, u, 0)]                          # [B, M, R]
        nb = jnp.where(active[:, :, None], nb, -1).reshape(B, -1)
        visited, pool_d, pool_i, pool_c = _expand(
            space, queries, visited, pool_d, pool_i, pool_c, nb, L)
        return it + 1, visited, pool_d, pool_i, pool_c

    state = (jnp.zeros((), jnp.int32), visited, pool_d, pool_i, pool_c)
    _, visited, pool_d, pool_i, pool_c = jax.lax.while_loop(cond, body, state)

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


def graph_seeds(graph, space, queries: jax.Array, num_seeds: int = 0) -> jax.Array:
    """Compute seed ids for beam search: overlay greedy descent if the graph
    has one (graph.hpp initialize_search), else the stored entry points."""
    B = queries.shape[0]
    if len(graph.overlay) == 0:
        return jnp.broadcast_to(graph.eps[None, :], (B, graph.eps.shape[0]))
    cur = jnp.zeros((B,), dtype=jnp.int32)  # top level entry: local slot 0
    for lvl in graph.overlay:
        cur = overlay_descend(space, lvl.ids, lvl.nbrs, lvl.down, cur, queries)
    return cur[:, None]


@functools.partial(jax.jit, static_argnames=("k", "ef", "max_iters"))
def rabitq_beam_search(
    space,                 # RaBitQSpace (adjacency lives inside the space)
    seeds: jax.Array,      # [B, S] int32 seed ids (-1 pad)
    queries: jax.Array,    # [B, D] f32 (already prep_query'd)
    k: int,
    ef: int,
    max_iters: int = 0,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Beam search driven by RaBitQ *estimated* distances with exact rerank.

    The reference's rabitq_search_solo (graph_search_job.hpp:92-220): pop the
    node with the best estimated distance, compute its exact distance (the
    raw vector rides in the node chunk), estimate all 32 neighbors from their
    1-bit codes in one shot, and key final results by exact distances. Here
    the fastscan batch becomes one MXU contraction per hop
    (space.estimate_block) and the final rerank re-scores the whole ef-pool
    exactly (covering the reference's supplement step).
    """
    B = queries.shape[0]
    C = space.capacity
    L = max(int(ef), int(k))
    W = -(-C // 32)
    if max_iters <= 0:
        max_iters = 2 * L + 16

    qrot, qsum = space.rotate_queries(queries)

    pool_d = jnp.full((B, L), FINF, dtype=jnp.float32)
    pool_i = jnp.full((B, L), -1, dtype=jnp.int32)
    pool_c = jnp.zeros((B, L), dtype=bool)
    visited = jnp.zeros((B, W), dtype=jnp.uint32)

    # seeds enter with exact distances
    visited, fresh, seed_s = _visited_probe_and_set(visited, seeds)
    d0 = space.gather_dists(queries, jnp.where(fresh, seed_s, 0))
    d0 = jnp.where(fresh, d0, FINF)
    pool_d, pool_i, pool_c = merge_topk_with_flags(
        pool_d, pool_i, pool_c,
        d0, jnp.where(fresh, seed_s, -1), jnp.zeros_like(fresh), L)

    slot_iota = jnp.arange(L, dtype=jnp.int32)[None, :]

    def has_next(pool_d, pool_i, pool_c):
        return (~pool_c) & (pool_i >= 0) & jnp.isfinite(pool_d)

    def cond(state):
        it, visited, pool_d, pool_i, pool_c = state
        return (it < max_iters) & jnp.any(has_next(pool_d, pool_i, pool_c))

    def body(state):
        it, visited, pool_d, pool_i, pool_c = state
        cand = jnp.where(has_next(pool_d, pool_i, pool_c), pool_d, FINF)
        sel = jnp.argmin(cand, axis=1)
        sel_d = jnp.take_along_axis(cand, sel[:, None], axis=1)[:, 0]
        active = jnp.isfinite(sel_d)
        u = jnp.take_along_axis(pool_i, sel[:, None], axis=1)[:, 0]
        pool_c = pool_c | ((slot_iota == sel[:, None]) & active[:, None])
        u_safe = jnp.where(active, u, 0)
        d_center = space.gather_dists(queries, u_safe[:, None])[:, 0]
        est, nids = space.estimate_block(qrot, qsum, d_center, u_safe)
        nids = jnp.where(active[:, None], nids, -1)
        visited, fresh, ids_s = _visited_probe_and_set(visited, nids)
        # align est with the sorted/deduped id order from the probe
        order = jnp.argsort(nids, axis=1)
        est_s = jnp.take_along_axis(est, order, axis=1)
        est_s = jnp.where(fresh, est_s, FINF)
        pool_d, pool_i, pool_c = merge_topk_with_flags(
            pool_d, pool_i, pool_c,
            est_s, jnp.where(fresh, ids_s, -1), jnp.zeros_like(fresh), L)
        return it + 1, visited, pool_d, pool_i, pool_c

    state = (jnp.zeros((), jnp.int32), visited, pool_d, pool_i, pool_c)
    _, visited, pool_d, pool_i, pool_c = jax.lax.while_loop(cond, body, state)

    # exact rerank of the whole pool (rabitq res_pool + supplement semantics)
    safe = jnp.where(pool_i >= 0, pool_i, 0)
    d_exact = space.gather_dists(queries, safe)
    node_ok = pool_i >= 0
    if valid is not None:
        node_ok &= valid[jnp.clip(pool_i, 0, C - 1)]
    d_exact = jnp.where(node_ok, d_exact, FINF)
    nd, sel = jax.lax.top_k(-d_exact, k)
    ids = jnp.take_along_axis(pool_i, sel, axis=1)
    out_d = -nd
    return out_d, jnp.where(jnp.isfinite(out_d), ids, -1)
