"""Single-dispatch online insert for block (bsq8) indices.

The round-2 insert path was host-orchestrated: ~20 dispatches per batch
(search, raw append, reverse group-by on host, candidate gather, prune,
requantize, adjacency writes), which through a TPU tunnel's ~35 ms floor
capped throughput at ~47 vec/s. This jitted step runs the ENTIRE reference
pipeline — GraphUpdateJob::insert_and_update (graph_update_job.hpp:66-137)
plus RaBitQSpace::update_nei's requantization (rabitq_space.hpp:138-161),
SQ8-block edition — in ONE program:

  1. beam-search each new vector's top-R edges (estimated + exact rerank)
  2. append raw vectors + encode the new nodes' packed blocks
  3. bounded reverse-edge scatter (reservoir semantics, like the
     reference's locked bounded insertion) instead of a host group-by
  4. re-select + requantize every touched node's block: candidates =
     current edges ∪ the new sources pointing at it, top-R by exact
     distance

Touched-node scatters are duplicate-safe by construction: duplicate dst
copies compute from the same pre-update state, so every duplicate write
carries identical data (XLA scatter order is undefined for duplicates).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

FINF = float("inf")


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("r", "w", "ef", "iters", "m"))
def fused_block_insert(
    space,                  # BQGSpace (donated)
    graph_nbrs: jax.Array,  # [C, R] i32 (donated)
    eps: jax.Array,         # [E] i32 shared entry points
    vecs: jax.Array,        # [B, D] f32 (suffix past ``count`` is padding)
    count: jax.Array,       # scalar i32: real rows in ``vecs``
    key: jax.Array,         # PRNG key for reverse-slot reservoir
    seed_sample,            # scan_seeds tuple or None
    r: int, w: int, ef: int, iters: int, m: int,
) -> Tuple[object, jax.Array, jax.Array]:
    """Returns (space', graph_nbrs', new_ids [B] i32 with -1 pads/overflow)."""
    from ..spaces.bqg import _encode_block
    from .prune import _sort_dedup
    from .search import block_beam_search, scan_seeds

    B, D = vecs.shape
    C = space.capacity
    v = space.prep_query(vecs)

    # 1. edges for the new nodes (existing nodes only: new slots are not
    #    yet valid, so results cannot reference them)
    if seed_sample is not None:
        seeds = scan_seeds(v, *seed_sample)
    else:
        seeds = jnp.broadcast_to(eps[None, :], (B, eps.shape[0]))
    d_nb, ids_nb = block_beam_search(space, seeds, v, k=r, ef=max(ef, r),
                                     max_iters=iters, valid=space.valid,
                                     n_expand=m)

    # 2. append raw vectors at the bump pointer
    start = space.num
    slots = start + jnp.arange(B, dtype=jnp.int32)
    ok = (jnp.arange(B) < count) & (slots < C)
    slot_safe = jnp.where(ok, slots, 0)
    data = space.data.at[slot_safe].set(
        jnp.where(ok[:, None], v, space.data[slot_safe]))
    sq = space.sq_norms.at[slot_safe].set(
        jnp.where(ok, jnp.sum(v * v, axis=-1), space.sq_norms[slot_safe]))
    valid = space.valid.at[slot_safe].set(
        jnp.where(ok, True, space.valid[slot_safe]))
    new_num = jnp.minimum(start + count, C).astype(jnp.int32)

    # new rows = exact top-r of [searched existing ∪ the batch's own
    # nearest]. The search preceded the append, so its results cannot
    # reference same-batch nodes — but the reference inserts sequentially,
    # where point t DOES link to points < t (graph_update_job.hpp:66-89);
    # without within-batch edges a batch of outliers forms an unreachable
    # island (measured on the raw path: 0.15 self-recall). One [B, B] MXU
    # pairwise restores the sequential semantics, both directions at once.
    dot_b = jnp.einsum("bd,cd->bc", v, v,
                       preferred_element_type=jnp.float32)
    vsq = jnp.sum(v * v, axis=-1)
    if space.metric == "ip":
        pin = -dot_b
    else:
        pin = jnp.maximum(vsq[:, None] + vsq[None, :] - 2.0 * dot_b, 0.0)
    bad = ((~ok)[None, :] | (~ok)[:, None]
           | (jnp.arange(B)[:, None] == jnp.arange(B)[None, :]))
    pin = jnp.where(bad, FINF, pin)
    # mates are capped at 4 candidates so a batch landing in one tight
    # region cannot crowd the searched graph edges out of the top-r row
    # (see fused_raw_connect: unbounded mates collapsed fresh rows onto
    # the batch island, churn recall 0.81 -> 0.69); 4 is plenty for
    # within-island reachability of an outlier batch
    kb = min(4, B)
    nd_in, sel_in = jax.lax.top_k(-pin, kb)
    batch_ids = jnp.where(jnp.isfinite(nd_in), slots[sel_in], -1)
    cand_n = jnp.concatenate([ids_nb, batch_ids], axis=1)
    cd_n = jnp.concatenate([jnp.where(ids_nb >= 0, d_nb, FINF), -nd_in],
                           axis=1)
    _, si_n = _sort_dedup(cd_n, cand_n)
    rows_new = jnp.where(ok[:, None], si_n[:, :r], -1)
    codes_new, xsq_new = _encode_block(data, space.dmin, space.scale,
                                       rows_new,
                                       store_sq=space.metric == "l2")
    nbr_ids = space.nbr_ids.at[slot_safe].set(
        jnp.where(ok[:, None], rows_new, space.nbr_ids[slot_safe]))
    nbr_codes = space.nbr_codes.at[slot_safe].set(
        jnp.where(ok[:, None, None], codes_new,
                  space.nbr_codes[slot_safe]))
    nbr_xsq = space.nbr_xsq.at[slot_safe].set(
        jnp.where(ok[:, None], xsq_new, space.nbr_xsq[slot_safe]))
    graph_nbrs = graph_nbrs.at[slot_safe].set(
        jnp.where(ok[:, None], rows_new, graph_nbrs[slot_safe]))

    # 3. bounded reverse table: which new nodes point at each touched dst
    #    (random-slot reservoir — collisions drop, like reverse_edges_dev)
    dst = jnp.where(ok[:, None] & (rows_new >= 0), rows_new, C)  # C = drop
    src = jnp.broadcast_to(slots[:, None], (B, r))
    slot_rand = jax.random.randint(key, (B, r), 0, w)
    rev = jnp.full((C, w), -1, dtype=jnp.int32)
    rev = rev.at[dst.reshape(-1), slot_rand.reshape(-1)].set(
        src.reshape(-1), mode="drop")

    # 4. re-select + requantize every touched row. Duplicate dsts in
    #    ``touched`` read identical state and write identical rows.
    touched = jnp.where(dst < C, dst, 0).reshape(-1)          # [B*r]
    is_real = (dst < C).reshape(-1)
    tq = data[touched].astype(jnp.float32)
    cand = jnp.concatenate([nbr_ids[touched], rev[touched]], axis=1)
    cand = jnp.where(cand == touched[:, None], -1, cand)      # no self-loop
    cd = _bqg_exact_dists(space, data, sq, tq, cand)
    _, sorted_ids = _sort_dedup(cd, cand)
    rows_t = sorted_ids[:, :r]
    codes_t, xsq_t = _encode_block(data, space.dmin, space.scale, rows_t,
                                   store_sq=space.metric == "l2")
    # pad entries scatter to index C with mode="drop" — no write at all
    # (a pad aimed at any real slot could race a real write)
    t_write = jnp.where(is_real, touched, C)
    nbr_ids = nbr_ids.at[t_write].set(rows_t, mode="drop")
    nbr_codes = nbr_codes.at[t_write].set(codes_t, mode="drop")
    nbr_xsq = nbr_xsq.at[t_write].set(xsq_t, mode="drop")
    graph_nbrs = graph_nbrs.at[t_write].set(rows_t, mode="drop")

    space = space.replace(data=data, sq_norms=sq, valid=valid, num=new_num,
                          nbr_ids=nbr_ids, nbr_codes=nbr_codes,
                          nbr_xsq=nbr_xsq)
    return space, graph_nbrs, jnp.where(ok, slots, -1)


@functools.partial(jax.jit, donate_argnums=(1,),
                   static_argnames=("row_w", "alpha", "chunk", "w"))
def fused_raw_connect(
    space,                  # RawSpace AFTER the batch's rows were appended
    graph_nbrs: jax.Array,  # [C, W] i32 adjacency (donated)
    new_ids: jax.Array,     # [B] i32 slots of the inserted rows (-1 pad)
    new_rows: jax.Array,    # [B, r] i32 edges found for the new rows
    key: jax.Array,         # PRNG key for the reverse-slot reservoir
    row_w: int,
    alpha: float = 1.0,
    chunk: int = 2048,
    w: int = 16,
) -> Tuple[jax.Array, jax.Array]:
    """Raw-graph edition of the fused connect: new-row scatter + bounded
    reverse re-prune in ONE program, so the adjacency never leaves the
    device (the round-3 host path downloaded + re-uploaded the full [C, W]
    table per insert batch — ~256 MB of tunnel traffic at 1M x 32).

    Covers hnsw/nsg/fusion raw and sq-quantized indices (the reference's
    GraphUpdateJob::insert_and_update, graph_update_job.hpp:66-89, with the
    heuristic re-prune of hnswlib.hpp:291-350 on every touched node).

    The reverse table builds IN-KERNEL (bounded reservoir, like
    fused_block_insert step 3): the r5 diagnostic put the old host path's
    [T, K] upload at ~0.35 s/batch through the tunnel plus ~0.1 s of host
    group-by — more than half the connect window. ``touched`` is the flat
    [B*row_w] destination list WITH duplicates; duplicate rows read
    identical post-step-1 state and write identical results, so scatter
    order is immaterial. Returns (graph_nbrs', touched [B*row_w] i32 with
    -1 pads) — the caller feeds ``touched`` straight into the shadow
    block re-encode without a host round-trip.

    The touched re-prune uses the PARALLEL RNG rule by default (one
    [chunk, M, M] masked reduction instead of a 48-step sequential scan;
    the fill restores its slight over-prune — see the r4-measured notes
    below). ALAYA_CONNECT_PRUNE=seq keeps the sequential rule for A/Bs
    (read at trace time)."""
    import os

    from .prune import occlusion_prune_chunk

    par = os.environ.get("ALAYA_CONNECT_PRUNE", "par") != "seq"

    B = new_ids.shape[0]
    C = graph_nbrs.shape[0]

    # 1. new rows = a few within-batch mates + the searched existing
    #    edges. The search ran BEFORE the append, so its results cannot
    #    reference same-batch nodes — but the reference inserts
    #    sequentially, where point t DOES link to points < t
    #    (graph_update_job.hpp:66-89); without the within-batch edges a
    #    batch of outliers forms an unreachable island (measured: 0.15
    #    self-recall on a 40-outlier batch). One [B, B] MXU pairwise
    #    restores the sequential semantics, both directions at once.
    ok_n = new_ids >= 0
    nb_safe = jnp.where(ok_n, new_ids, 0)
    vnew = space.data[nb_safe].astype(jnp.float32)              # [B, D]
    dot = jnp.einsum("bd,cd->bc", vnew, vnew,
                     preferred_element_type=jnp.float32)
    if space.metric == "ip":
        pin = -dot
    else:
        sqn = space.sq_norms[nb_safe]
        pin = jnp.maximum(sqn[:, None] + sqn[None, :] - 2.0 * dot, 0.0)
    self_or_pad = (~ok_n[None, :]) | (jnp.arange(B)[:, None]
                                      == jnp.arange(B)[None, :])
    pin = jnp.where(self_or_pad | (~ok_n[:, None]), FINF, pin)
    kb = min(new_rows.shape[1], B)
    nd_in, sel_in = jax.lax.top_k(-pin, kb)
    batch_ids = jnp.where(jnp.isfinite(nd_in), new_ids[sel_in], -1)

    # New rows = a small QUOTA of batch mates + the searched neighbors,
    # never a joint prune. Two measured traps shape this:
    #  - joint occlusion over [searched ∪ mates]: when the batch lands in
    #    one tight region (the common online-update pattern) mates are
    #    nearest, get selected first, and any handful of selected
    #    co-located mates occludes EVERY remote searched candidate with
    #    probability ~1 - 2^-k (mate<->candidate distance differs from
    #    node<->candidate distance by a zero-mean projection) — fresh
    #    rows collapse onto the batch island and detach from the graph
    #    (30%-churn recall 0.81 -> 0.69, rows 92-100% batch-internal);
    #  - occlusion over the searched set alone: the candidate pool is
    #    already exactly row-width, so the prune only THINS the row
    #    (degree 16 -> ~7, churn recall 0.50) — the reference prunes an
    #    ef_construction-deep pool down to R, never an R-deep one.
    # So: up to 4 mates (occlusion-diversified among themselves, enough
    # for within-island reachability of an outlier batch) take priority,
    # the searched top-r fills the rest unpruned — the reference's
    # sequential insert gets the same mix for free: early points anchor
    # to the graph before later mates exist (graph_update_job.hpp:66-89).
    q_m = min(4, kb)
    rows_m = occlusion_prune_chunk(space, vnew, -nd_in, batch_ids,
                                   r=q_m, alpha=alpha)
    cat_i = jnp.concatenate([rows_m, new_rows], axis=1)  # ids disjoint
    if cat_i.shape[1] < row_w:  # fusion rows are 2*max_nbrs wide
        cat_i = jnp.pad(cat_i, ((0, 0), (0, row_w - cat_i.shape[1])),
                        constant_values=-1)
    order = jnp.argsort(cat_i < 0, axis=1, stable=True)
    pruned_new = jnp.take_along_axis(cat_i, order, axis=1)[:, :row_w]
    full_rows = jnp.where(ok_n[:, None], pruned_new, -1)
    w_idx = jnp.where(ok_n, new_ids, C)
    graph_nbrs = graph_nbrs.at[w_idx].set(full_rows, mode="drop")

    # 2. re-prune every touched dst: candidates = current edges ∪ the new
    #    sources; occlusion rule at full row width, then FILL the remaining
    #    slots with the unselected CURRENT edges in distance order — chunked
    #    in-jit to bound the [chunk, M, M] pair tensor.
    #
    #    The fill is load-bearing (measured on 30% churn, fresh batches
    #    co-located at the origin): without it the occlusion pass over a
    #    row_w+K pool (a) THINS the row — the pool is barely deeper than the
    #    row, so rows decay 16 -> ~9 edges per churn round — and (b) lets
    #    the co-located fresh sources occlude every remote current edge with
    #    p ~ 1-2^-k, so origin-adjacent base rows swing to 60-100% fresh
    #    edges and the base graph fragments (recall 0.81 -> 0.50 over 3
    #    rounds). With the fill, degree is preserved and one batch can only
    #    displace as many existing edges as it has occlusion-DIVERSE sources
    #    (~1-2 when the batch is one tight cluster). The reference gets the
    #    bounded version for free by inserting sequentially: each insert
    #    offers a touched row exactly ONE new candidate
    #    (hnswlib.hpp:291-350 via graph_update_job.hpp:66-89).

    # bounded reverse reservoir, device-built (random slot; collisions
    # drop — the reference's locked bounded insertion analog). Mates are
    # included: a mate edge u->v proposes v->u exactly like the
    # sequential reference, and v (a same-batch node) re-prunes against
    # its just-written row (the donated-table write above sequences
    # before the reads below).
    dst = jnp.where(ok_n[:, None] & (full_rows >= 0), full_rows, C)
    src = jnp.broadcast_to(jnp.where(ok_n, new_ids, -1)[:, None],
                           (B, row_w))
    slot_rand = jax.random.randint(key, (B, row_w), 0, w)
    rev = jnp.full((C, w), -1, dtype=jnp.int32)
    rev = rev.at[dst.reshape(-1), slot_rand.reshape(-1)].set(
        src.reshape(-1), mode="drop")
    touched = dst.reshape(-1)                          # [B*row_w], C = pad
    T = touched.shape[0]
    nck = -(-T // chunk)
    if T % chunk:
        touched = jnp.pad(touched, (0, nck * chunk - T),
                          constant_values=C)

    def body(t_c):
        # Access pattern: one bf16 gather of the candidate rows feeds both
        # the d(node, .) einsum and the occlusion pair matrix (the r5
        # diagnostic showed the f32 double-gather alone at ~0.5 s/batch).
        t_safe = jnp.where(t_c < C, t_c, 0)
        cur = graph_nbrs[t_safe]                       # [chunk, row_w]
        rev_c = rev[t_safe]                            # [chunk, w]
        cand = jnp.concatenate([cur, rev_c], axis=1)   # [chunk, M]
        q = space.data[t_safe].astype(jnp.bfloat16)
        safe = jnp.where(cand >= 0, cand, 0)
        vecs = space.data[safe].astype(jnp.bfloat16)   # [chunk, M, D] ONCE
        dot_q = jnp.einsum("cmd,cd->cm", vecs, q,
                           preferred_element_type=jnp.float32)
        if space.metric == "ip":
            d = -dot_q
            sq_c = None
        else:
            sq_c = space.sq_norms[safe]
            d = jnp.maximum(space.sq_norms[t_safe][:, None]
                            + sq_c - 2.0 * dot_q, 0.0)
        d = jnp.where((cand >= 0) & (cand != t_c[:, None]), d, FINF)
        mm = cand.shape[1]
        if par:
            # parallel RNG rule on the SAME gathered vecs: after sorting
            # by d(node, .), j is occluded iff some nearer i has
            # alpha-scaled d(i, j) < d(node, j) — the sequential greedy's
            # slight over-prune is restored by the fill below. TWO sorts
            # total (candidate order + final priority compaction); the
            # 4-sort draft cost ~0.7 s/batch in kernel time alone.
            ord_c = jnp.argsort(d, axis=1)                      # sort 1
            d_s = jnp.take_along_axis(d, ord_c, axis=1)
            cand_s = jnp.take_along_axis(cand, ord_c, axis=1)
            dup = jnp.any((cand_s[:, None, :] == cand_s[:, :, None])
                          & jnp.triu(jnp.ones((mm, mm), bool), k=1)[None],
                          axis=1)                       # j dups an i < j
            cand_s = jnp.where(dup, -1, cand_s)
            d_s = jnp.where(dup, FINF, d_s)
            vecs_s = jnp.take_along_axis(vecs, ord_c[:, :, None], axis=1)
            dots = jnp.einsum("cmd,cnd->cmn", vecs_s, vecs_s,
                              preferred_element_type=jnp.float32)
            if space.metric == "ip":
                pair_d = -dots
            else:
                sq_s = jnp.take_along_axis(sq_c, ord_c, axis=1)
                pair_d = jnp.maximum(
                    sq_s[:, :, None] + sq_s[:, None, :] - 2.0 * dots, 0.0)
            if alpha == 1.0:
                thr = d_s
            else:
                thr = d_s * jnp.where(d_s >= 0, 1.0 / alpha, alpha)
            nearer = jnp.triu(jnp.ones((mm, mm), bool), k=1)[None]  # i < j
            occ = jnp.any(nearer & (cand_s >= 0)[:, :, None]
                          & (pair_d < thr[:, None, :]), axis=1)
            selected = (cand_s >= 0) & jnp.isfinite(d_s) & ~occ
            # fill preference rides the SAME compaction: priority 0 =
            # selected, 1 = unselected CURRENT edge (the load-bearing
            # degree-preserving fill), 2 = dropped; within a priority the
            # sorted candidate order is already ascending distance
            was_cur = jnp.take_along_axis(
                jnp.arange(mm)[None, :] < row_w, ord_c, axis=1)
            prio = jnp.where(selected, 0,
                             jnp.where(was_cur & jnp.isfinite(d_s)
                                       & (cand_s >= 0), 1, 2))
            ord2 = jnp.argsort(prio * mm
                               + jnp.arange(mm, dtype=prio.dtype)[None],
                               axis=1)                          # sort 2
            out = jnp.take_along_axis(cand_s, ord2, axis=1)[:, :row_w]
            out_p = jnp.take_along_axis(prio, ord2, axis=1)[:, :row_w]
            return jnp.where(out_p < 2, out, -1)
        sel = occlusion_prune_chunk(space, q.astype(jnp.float32), d,
                                    cand, r=row_w, alpha=alpha)
        in_sel = (cur[:, :, None] == sel[:, None, :]).any(-1)
        d_fill = jnp.where(in_sel, FINF, d[:, :row_w])  # unselected cur only
        ord_f = jnp.argsort(d_fill, axis=1)
        fill = jnp.take_along_axis(cur, ord_f, axis=1)
        fill = jnp.where(jnp.isfinite(
            jnp.take_along_axis(d_fill, ord_f, axis=1)), fill, -1)
        cat = jnp.concatenate([sel, fill], axis=1)      # sel first, asc dist
        order = jnp.argsort(cat < 0, axis=1, stable=True)
        return jnp.take_along_axis(cat, order, axis=1)[:, :row_w]

    pruned = jax.lax.map(body, touched.reshape(nck, chunk))
    t_write = jnp.where(touched < C, touched, C)
    out_nbrs = graph_nbrs.at[t_write].set(
        pruned.reshape(nck * chunk, row_w), mode="drop")
    return out_nbrs, jnp.where(touched[:T] < C, touched[:T], -1)


def _bqg_exact_dists(space, data, sq, q, ids):
    """Exact distances with the UPDATED data/sq arrays (the space pytree
    still holds pre-insert buffers at trace time)."""
    safe = jnp.clip(ids, 0, data.shape[0] - 1)
    vecs = data[safe]
    dot = jnp.einsum("bkd,bd->bk", vecs, q,
                     preferred_element_type=jnp.float32)
    if space.metric == "ip":
        d = -dot
    else:
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        d = jnp.maximum(q_sq + sq[safe] - 2.0 * dot, 0.0)
    return jnp.where(ids >= 0, d, FINF)
