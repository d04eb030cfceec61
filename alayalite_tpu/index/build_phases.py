"""Device-resident builder phases.

The graph builders are host-orchestrated but every heavy intermediate stays
on device: through a TPU tunnel, host↔device transfers run at pipe speed,
and the candidate pools / pairwise prunes at 1M scale are gigabytes. Phases
accumulate into donated device buffers; the host only sees the final
adjacency (one ~N·R·4-byte download for the BFS repair).

Phase inventory (all chunked to bound the [chunk, M, D] tensors):
  search_pool_dev   — lockstep beam pools for every node's own vector
  prune_all_dev     — MRNG occlusion prune of [pool ∪ kNN] candidates
  reverse_edges_dev — bounded reverse-edge table via random-slot scatter
                      (reservoir semantics like the reference's bounded
                      insert under locks, nsg_builder.hpp:414-499)
  reprune_with_reverse_dev — re-prune every node with [edges ∪ reverse]
  fill_degree_dev   — pad rows to exactly r with nearest unused candidates
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .prune import occlusion_prune_chunk
from .search import beam_search

log = logging.getLogger("alayalite_tpu")
FINF = float("inf")


def bf16_pool_space(space):
    """Traversal-only bf16 copy of a raw space for the candidate-pool
    beams (shared by the HNSW and QG builders). Pool distances only
    order candidates for the prune, which re-scores pairs in f32;
    measured (v5e 100k): recall unchanged (+0.001) and the pools phase
    halves — the f32 gather+einsum was the cost. ALAYA_POOL_BF16=0
    opts out (returns the space unchanged)."""
    import os

    if os.environ.get("ALAYA_POOL_BF16", "1") != "1":
        return space
    return space.replace(data=space.data.astype(jnp.bfloat16), bf16=True)


def _chunks(n: int, chunk: int):
    """Chunk starts covering [0, n) with a possibly-overlapping tail."""
    chunk = min(chunk, n)
    starts = list(range(0, n - chunk + 1, chunk))
    if n % chunk and (not starts or starts[-1] + chunk < n):
        starts.append(n - chunk)
    return starts, chunk


def search_pool_dev(space, nbrs_dev: jax.Array, eps: np.ndarray, ef: int,
                    n: int, chunk: int = 4096, n_rand_seeds: int = 16,
                    seed: int = 0, max_iters: int = 0, seed_sample=None,
                    knn_seed: int = 0,
                    ) -> Tuple[jax.Array, jax.Array]:
    """Beam-search pool for each of the first n nodes' own vectors.
    Returns device (pool_d [n, ef], pool_i [n, ef]).

    ``max_iters`` caps the hop count (0 = beam_search auto, ef/8+4 hops at
    ef=200). ``seed_sample`` = (ids, vecs bf16, sq_norms) enables per-node
    seed selection via one MXU scan (search.scan_seeds) — each node's beam
    starts 2-4 hops closer, so a tight ``max_iters`` keeps pool quality
    (the 1M pools phase is ~47% of the whole QG build at 29 auto hops).
    ``knn_seed`` > 0 additionally seeds each node's beam with its first
    ``knn_seed`` kNN-graph neighbors — the beam starts INSIDE the local
    neighborhood, not merely near it, cutting the hops needed to fill an
    ef-pool.

    The phase runs as a handful of dispatches: chunk starts are processed
    in groups of ``ALAYA_POOL_GROUP`` (default 32), each group ONE lax.scan
    dispatch with the [n, ef] pools as the donated carry. The previous
    per-chunk host loop paid ~245 dispatch round-trips + eager seed glue at
    1M — tens of seconds of tunnel latency for ~zero chip work; a single
    245-long scan program in turn crashed the TPU worker at 1M shapes
    (fine at 200k), so the group size bounds the program."""
    import os

    eps_dev = jnp.asarray(np.asarray(eps, dtype=np.int32))
    starts, chunk = _chunks(n, chunk)
    group = max(1, int(os.environ.get("ALAYA_POOL_GROUP", "32")))
    starts = np.asarray(starts, dtype=np.int32)
    if starts.size % group:
        # pad with copies of the last start: the tail chunk is recomputed
        # with identical queries and written to the same rows — idempotent
        starts = np.concatenate(
            [starts, np.full(-starts.size % group, starts[-1], np.int32)])
    pool_d = jnp.zeros((n, ef), dtype=jnp.float32)
    pool_i = jnp.zeros((n, ef), dtype=jnp.int32)
    key = jax.random.PRNGKey(seed ^ 0xB00F)
    sample = (None, None, None) if seed_sample is None else seed_sample
    for g in range(0, starts.size, group):
        pool_d, pool_i = _search_pool_scan(
            space, nbrs_dev, eps_dev, jnp.asarray(starts[g:g + group]), key,
            pool_d, pool_i, *sample, chunk=chunk, ef=ef, n=n,
            n_rand_seeds=n_rand_seeds, max_iters=max_iters,
            knn_seed=knn_seed, with_sample=seed_sample is not None)
    return pool_d, pool_i


@functools.partial(
    jax.jit, donate_argnums=(5, 6),
    static_argnames=("chunk", "ef", "n", "n_rand_seeds", "max_iters",
                     "knn_seed", "with_sample"))
def _search_pool_scan(space, nbrs_dev, eps_dev, starts_dev, key, pool_d,
                      pool_i, sample_ids, sample_vecs, sample_sq,
                      chunk: int, ef: int, n: int, n_rand_seeds: int,
                      max_iters: int, knn_seed: int, with_sample: bool):
    from .search import scan_seeds

    def step(carry, lo):
        pd, pi = carry
        qj = jax.lax.dynamic_slice_in_dim(space.data, lo, chunk
                                          ).astype(jnp.float32)
        sub = jax.random.fold_in(key, lo)
        rand = jax.random.randint(sub, (chunk, n_rand_seeds), 0, n,
                                  dtype=jnp.int32)
        seeds = jnp.concatenate(
            [jnp.broadcast_to(eps_dev[None, :], (chunk, eps_dev.shape[0])),
             rand], axis=1)
        if knn_seed > 0:
            own = jax.lax.dynamic_slice_in_dim(nbrs_dev, lo, chunk
                                               )[:, :knn_seed]
            seeds = jnp.concatenate([own, seeds], axis=1)
        if with_sample:
            seeds = jnp.concatenate(
                [scan_seeds(qj, sample_ids, sample_vecs, sample_sq), seeds],
                axis=1)
        d, i = beam_search(space, nbrs_dev, seeds, qj,
                           k=ef, ef=ef, n_expand=8, max_iters=max_iters)
        pd = jax.lax.dynamic_update_slice_in_dim(pd, d, lo, 0)
        pi = jax.lax.dynamic_update_slice_in_dim(pi, i, lo, 0)
        return (pd, pi), None

    (pool_d, pool_i), _ = jax.lax.scan(step, (pool_d, pool_i), starts_dev)
    return pool_d, pool_i


def block_pool_dev(bspace, eps: np.ndarray, ef: int, n: int,
                   chunk: int = 4096, n_rand_seeds: int = 16, seed: int = 0,
                   max_iters: int = 0, seed_sample=None, n_expand: int = 8,
                   ) -> Tuple[jax.Array, jax.Array]:
    """Beam-search pools over a *block* space whose neighbor blocks were
    packed from the kNN graph (one fat gather per pop instead of M·R thin
    ones — the pools phase at 1M is gather-bound: ~3G thin rows over 12
    hops). The final in-search exact rerank re-scores the whole pool from
    raw vectors, so the returned pool_d is exact f32 — the occlusion prune
    consumes it bias-free. Same group-scan dispatch structure as
    search_pool_dev."""
    import os

    eps_dev = jnp.asarray(np.asarray(eps, dtype=np.int32))
    starts, chunk = _chunks(n, chunk)
    group = max(1, int(os.environ.get("ALAYA_POOL_GROUP", "32")))
    starts = np.asarray(starts, dtype=np.int32)
    if starts.size % group:
        starts = np.concatenate(
            [starts, np.full(-starts.size % group, starts[-1], np.int32)])
    pool_d = jnp.zeros((n, ef), dtype=jnp.float32)
    pool_i = jnp.zeros((n, ef), dtype=jnp.int32)
    key = jax.random.PRNGKey(seed ^ 0xB10C)
    sample = (None, None, None) if seed_sample is None else seed_sample
    for g in range(0, starts.size, group):
        pool_d, pool_i = _block_pool_scan(
            bspace, eps_dev, jnp.asarray(starts[g:g + group]), key,
            pool_d, pool_i, *sample, chunk=chunk, ef=ef, n=n,
            n_rand_seeds=n_rand_seeds, max_iters=max_iters,
            n_expand=n_expand, with_sample=seed_sample is not None)
    return pool_d, pool_i


@functools.partial(
    jax.jit, donate_argnums=(4, 5),
    static_argnames=("chunk", "ef", "n", "n_rand_seeds", "max_iters",
                     "n_expand", "with_sample"))
def _block_pool_scan(bspace, eps_dev, starts_dev, key, pool_d, pool_i,
                     sample_ids, sample_vecs, sample_sq, chunk: int, ef: int,
                     n: int, n_rand_seeds: int, max_iters: int,
                     n_expand: int, with_sample: bool):
    from .search import block_beam_search, scan_seeds

    def step(carry, lo):
        pd, pi = carry
        qj = jax.lax.dynamic_slice_in_dim(bspace.data, lo, chunk
                                          ).astype(jnp.float32)
        sub = jax.random.fold_in(key, lo)
        rand = jax.random.randint(sub, (chunk, n_rand_seeds), 0, n,
                                  dtype=jnp.int32)
        seeds = jnp.concatenate(
            [jnp.broadcast_to(eps_dev[None, :], (chunk, eps_dev.shape[0])),
             rand], axis=1)
        if with_sample:
            seeds = jnp.concatenate(
                [scan_seeds(qj, sample_ids, sample_vecs, sample_sq), seeds],
                axis=1)
        d, i = block_beam_search(bspace, seeds, qj, k=ef, ef=ef,
                                 n_expand=n_expand, max_iters=max_iters)
        pd = jax.lax.dynamic_update_slice_in_dim(pd, d, lo, 0)
        pi = jax.lax.dynamic_update_slice_in_dim(pi, i, lo, 0)
        return (pd, pi), None

    (pool_d, pool_i), _ = jax.lax.scan(step, (pool_d, pool_i), starts_dev)
    return pool_d, pool_i


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("chunk", "ef"))
def _twohop_chunk_into(pool_d, pool_i, space, knn_i_all, lo, chunk: int,
                       ef: int):
    """CAGRA-style candidate pool for one chunk: each node's kNN row ∪ its
    neighbors' kNN rows (2-hop), scored exactly, dedup-top-ef. One fat
    gather + one sort replaces the beam's ~12 sequential hops."""
    ki = jax.lax.dynamic_slice_in_dim(knn_i_all, lo, chunk)        # [C, K]
    safe = jnp.where(ki >= 0, ki, 0)
    hop2 = knn_i_all[safe]                                         # [C, K, K]
    hop2 = jnp.where((ki >= 0)[:, :, None], hop2, -1).reshape(chunk, -1)
    cand = jnp.concatenate([ki, hop2], axis=1)                     # [C, K+K²]
    me = lo + jnp.arange(chunk, dtype=jnp.int32)[:, None]
    cand = jnp.where(cand == me, -1, cand)
    qv = jax.lax.dynamic_slice_in_dim(space.data, lo, chunk
                                      ).astype(jnp.float32)
    d = space.gather_dists(qv, jnp.where(cand >= 0, cand, 0))
    d = jnp.where(cand >= 0, d, FINF)
    from .prune import _sort_dedup

    sd, si = _sort_dedup(d, cand)
    return (jax.lax.dynamic_update_slice_in_dim(pool_d, sd[:, :ef], lo, 0),
            jax.lax.dynamic_update_slice_in_dim(pool_i, si[:, :ef], lo, 0))


def twohop_pool_dev(space, knn_i: jax.Array, ef: int, n: int,
                    chunk: int = 4096) -> Tuple[jax.Array, jax.Array]:
    """2-hop candidate pools from a kNN graph (device in/out).

    The beam-search pools (search_pool_dev) walk ~12 sequential hops per
    chunk; on a converged NN-Descent graph the true ef-nearest are almost
    all within two hops of the kNN row, so one [C, K+K²] gather + exact
    scoring recovers pool quality at a fraction of the serial depth — the
    CAGRA construction (pool ∪ reverse ∪ prune) expressed TPU-side."""
    pool_d = jnp.zeros((n, ef), dtype=jnp.float32)
    pool_i = jnp.zeros((n, ef), dtype=jnp.int32)
    starts, chunk = _chunks(n, chunk)
    for idx, lo in enumerate(starts):
        pool_d, pool_i = _twohop_chunk_into(
            pool_d, pool_i, space, knn_i, jnp.asarray(lo, jnp.int32),
            chunk=chunk, ef=ef)
        if idx % 50 == 49:
            log.info("twohop pool: %d/%d", lo + chunk, n)
    return pool_d, pool_i


def _prune_opts():
    import os

    # bf16 pair distances default ON: 1M prune family 112 -> 73 s at
    # -0.0008 recall@ef32 (identical recall at 100k). MCAP stays opt-in:
    # 96 was recall-neutral at 100k but broke repair convergence at 1M
    # (nearest-only rows put every repair bridge in the worst-edge slot,
    # where the next round clobbers it).
    return (int(os.environ.get("ALAYA_PRUNE_MCAP", "0")),
            os.environ.get("ALAYA_PRUNE_BF16", "1") == "1")


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("r", "alpha", "chunk", "mcap", "bf16"))
def _prune_chunk_into(out_buf, space, cand_d, cand_i, lo, r: int,
                      alpha: float, chunk: int, mcap: int = 0,
                      bf16: bool = False):
    cd = jax.lax.dynamic_slice_in_dim(cand_d, lo, chunk)
    ci = jax.lax.dynamic_slice_in_dim(cand_i, lo, chunk)
    vecs = jax.lax.dynamic_slice_in_dim(space.data, lo, chunk
                                        ).astype(jnp.float32)
    # drop self-edges
    me = lo + jnp.arange(chunk, dtype=jnp.int32)[:, None]
    cd = jnp.where(ci == me, FINF, cd)
    ci = jnp.where(ci == me, -1, ci)
    res = occlusion_prune_chunk(space, vecs, cd, ci, r=r, alpha=alpha,
                                mcap=mcap, bf16=bf16)
    return jax.lax.dynamic_update_slice_in_dim(out_buf, res, lo, 0)


def prune_all_dev(space, cand_d: jax.Array, cand_i: jax.Array, r: int,
                  alpha: float = 1.0, chunk: int = 4096) -> jax.Array:
    """Occlusion-prune every node's candidate row (device in/out).
    One dispatch: lax.scan over chunk starts (see search_pool_dev)."""
    n = cand_i.shape[0]
    starts, chunk = _chunks(n, chunk)
    starts_dev = jnp.asarray(np.asarray(starts, dtype=np.int32))
    mcap, bf16 = _prune_opts()
    return _prune_all_scan(space, cand_d, cand_i, starts_dev, r=r,
                           alpha=alpha, chunk=chunk, n=n, mcap=mcap,
                           bf16=bf16)


@functools.partial(jax.jit,
                   static_argnames=("r", "alpha", "chunk", "n", "mcap",
                                    "bf16"))
def _prune_all_scan(space, cand_d, cand_i, starts_dev, r: int, alpha: float,
                    chunk: int, n: int, mcap: int = 0, bf16: bool = False):
    out = jnp.zeros((n, r), dtype=jnp.int32)

    def step(out, lo):
        return _prune_chunk_into(out, space, cand_d, cand_i, lo, r=r,
                                 alpha=alpha, chunk=chunk, mcap=mcap,
                                 bf16=bf16), None

    out, _ = jax.lax.scan(step, out, starts_dev)
    return out


@functools.partial(jax.jit, static_argnames=("width",))
def reverse_edges_dev(nbrs: jax.Array, key: jax.Array,
                      width: int) -> jax.Array:
    """Bounded reverse-edge table [n, width] via random-slot scatter.
    Collisions drop entries — reservoir semantics; the reference's bounded
    locked insertion drops overflow the same way."""
    n, r = nbrs.shape
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, r))
    slot = jax.random.randint(key, (n, r), 0, width)
    rev = jnp.full((n, width), -1, dtype=jnp.int32)
    ok = nbrs >= 0
    # invalid edges scatter to sentinel row n and DROP — routing them to
    # row 0 with value -1 would clobber node 0's valid reverse samples
    rev = rev.at[jnp.where(ok, nbrs, n).reshape(-1), slot.reshape(-1)].set(
        src.reshape(-1), mode="drop")
    return rev


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("r", "alpha", "chunk", "mcap", "bf16"))
def _reprune_chunk_into(out_buf, space, nbrs, rev, lo, r: int, alpha: float,
                        chunk: int, mcap: int = 0, bf16: bool = False):
    nb = jax.lax.dynamic_slice_in_dim(nbrs, lo, chunk)
    rv = jax.lax.dynamic_slice_in_dim(rev, lo, chunk)
    ci = jnp.concatenate([nb, rv], axis=1)
    me = lo + jnp.arange(chunk, dtype=jnp.int32)[:, None]
    ci = jnp.where(ci == me, -1, ci)
    vecs = jax.lax.dynamic_slice_in_dim(space.data, lo, chunk
                                        ).astype(jnp.float32)
    safe = jnp.where(ci >= 0, ci, 0)
    cd = space.gather_dists(vecs, safe)
    cd = jnp.where(ci >= 0, cd, FINF)
    res = occlusion_prune_chunk(space, vecs, cd, ci, r=r, alpha=alpha,
                                mcap=mcap, bf16=bf16)
    return jax.lax.dynamic_update_slice_in_dim(out_buf, res, lo, 0)


def reprune_with_reverse_dev(space, nbrs: jax.Array, rev: jax.Array, r: int,
                             alpha: float = 1.0,
                             chunk: int = 4096) -> jax.Array:
    """Re-prune every node over [current edges ∪ reverse candidates].
    One dispatch: lax.scan over chunk starts."""
    n = nbrs.shape[0]
    starts, chunk = _chunks(n, chunk)
    starts_dev = jnp.asarray(np.asarray(starts, dtype=np.int32))
    mcap, bf16 = _prune_opts()
    return _reprune_scan(space, nbrs, rev, starts_dev, r=r, alpha=alpha,
                         chunk=chunk, n=n, mcap=mcap, bf16=bf16)


@functools.partial(jax.jit,
                   static_argnames=("r", "alpha", "chunk", "n", "mcap",
                                    "bf16"))
def _reprune_scan(space, nbrs, rev, starts_dev, r: int, alpha: float,
                  chunk: int, n: int, mcap: int = 0, bf16: bool = False):
    out = jnp.zeros((n, r), dtype=jnp.int32)

    def step(out, lo):
        return _reprune_chunk_into(out, space, nbrs, rev, lo, r=r,
                                   alpha=alpha, chunk=chunk, mcap=mcap,
                                   bf16=bf16), None

    out, _ = jax.lax.scan(step, out, starts_dev)
    return out


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("r", "chunk"))
def _fill_chunk_into(out_buf, nbrs, cand_d, cand_i, lo, r: int, chunk: int):
    nb = jax.lax.dynamic_slice_in_dim(nbrs, lo, chunk)
    cd = jax.lax.dynamic_slice_in_dim(cand_d, lo, chunk)
    ci = jax.lax.dynamic_slice_in_dim(cand_i, lo, chunk)
    me = lo + jnp.arange(chunk, dtype=jnp.int32)[:, None]
    cd = jnp.where(ci == me, FINF, cd)
    ci = jnp.where(ci == me, -1, ci)
    order = jnp.argsort(cd, axis=1)
    ci = jnp.take_along_axis(ci, order, axis=1)
    cat = jnp.concatenate([nb, ci], axis=1)
    # keep-first dedup, stable-compact left (fusion._union_rows, device ed.)
    m = cat.shape[1]
    order_keys = jnp.argsort(cat, axis=1, stable=True)
    s = jnp.take_along_axis(cat, order_keys, axis=1)
    first = jnp.concatenate(
        [jnp.ones_like(s[:, :1], dtype=bool), s[:, 1:] != s[:, :-1]], axis=1)
    first &= s >= 0
    keep = jnp.zeros_like(first)
    keep = jnp.put_along_axis(keep, order_keys, first, axis=1,
                              inplace=False)
    compact = jnp.argsort(~keep, axis=1, stable=True)
    vals = jnp.take_along_axis(jnp.where(keep, cat, -1), compact, axis=1)
    res = vals[:, :r]
    if r > m:
        res = jnp.pad(res, ((0, 0), (0, r - m)), constant_values=-1)
    return jax.lax.dynamic_update_slice_in_dim(out_buf, res, lo, 0)


def fill_degree_dev(nbrs: jax.Array, cand_d: jax.Array, cand_i: jax.Array,
                    r: int, chunk: int = 4096) -> jax.Array:
    """Pad every row to exactly r edges with nearest unused candidates.
    One dispatch: lax.scan over chunk starts."""
    n = nbrs.shape[0]
    starts, chunk = _chunks(n, chunk)
    starts_dev = jnp.asarray(np.asarray(starts, dtype=np.int32))
    return _fill_scan(nbrs, cand_d, cand_i, starts_dev, r=r, chunk=chunk,
                      n=n)


@functools.partial(jax.jit, static_argnames=("r", "chunk", "n"))
def _fill_scan(nbrs, cand_d, cand_i, starts_dev, r: int, chunk: int, n: int):
    out = jnp.zeros((n, r), dtype=jnp.int32)

    def step(out, lo):
        return _fill_chunk_into(out, nbrs, cand_d, cand_i, lo, r=r,
                                chunk=chunk), None

    out, _ = jax.lax.scan(step, out, starts_dev)
    return out
