"""Online maintenance of the overlay hierarchy and tombstone compaction.

TPU-native analog of the reference's incremental HNSW maintenance:

  - ``extend_overlay`` — each inserted point draws a level with
    P(level >= l) = R^-l (hnswlib.hpp get_random_level, mult_ = 1/ln(R))
    and is linked into every overlay level up to it, exactly as
    ``add_point`` links layers > 0 (hnswlib.hpp:652-750). Levels are
    pre-padded at build time (hnsw.py::_build_overlay), so linking is pure
    in-place slot assignment — no array growth, no search recompile.
  - ``rewire_removed`` — the reference routes searches *through* removed
    nodes via their 2-hop neighborhoods (graph_search_job.hpp:373-417) and
    rebuilds affected nodes' edges with GraphUpdateJob::update
    (graph_update_job.hpp:105-137). Here the same candidate rule — current
    edges ∪ removed neighbors' edges, minus removed, top-R by exact
    distance — is applied to every affected node in one batch when the
    tombstone fraction crosses ``IndexParams.compaction_threshold``.

Host-orchestrated by design: overlay levels hold ~n/R nodes and compaction
is rare; the distance evaluations run on device in one gather per batch.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graph import Graph, OverlayLevel

log = logging.getLogger("alayalite_tpu")

FINF = float("inf")


def _batch_dists(space, q_vecs: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Exact d(q_vecs[i], ids[i, :]) with -1-safe gathers, [B, K] f32."""
    idj = jnp.asarray(np.where(ids >= 0, ids, 0))
    q = space.prep_query(jnp.asarray(q_vecs, dtype=jnp.float32))
    d = np.asarray(space.gather_dists(q, idj))
    return np.where(ids >= 0, d, np.inf)


def draw_levels(rng: np.random.Generator, count: int, r: int,
                max_level: int) -> np.ndarray:
    """Reference level law: floor(-ln(U) / ln(R)), capped at the built
    hierarchy's depth (hnswlib.hpp get_random_level)."""
    ratio = max(2, int(r))
    u = rng.uniform(low=np.finfo(np.float64).tiny, size=count)
    lv = np.floor(-np.log(u) / np.log(ratio)).astype(np.int64)
    return np.minimum(lv, max_level).astype(np.int32)


def extend_overlay(graph: Graph, space, new_ids: np.ndarray,
                   rng: np.random.Generator, r: int) -> Graph:
    """Link inserted nodes into the overlay hierarchy in place.

    For each node with drawn level l >= 1: occupy a free slot in overlay
    levels depth-1 .. depth-l (bottom-up), connect to its r2 nearest
    occupied members, and patch those members' reverse rows (append into a
    free slot, else replace their farthest edge if the new node is closer —
    hnswlib's shrink-on-overflow rule). ``down`` chains through the slots
    assigned one level below. A full level just stops accepting (logged);
    searches remain correct, only seed quality for the very newest nodes
    degrades to the base entry points.
    """
    depth = len(graph.overlay)
    new_ids = np.asarray(new_ids, dtype=np.int32)
    new_ids = new_ids[new_ids >= 0]
    if depth == 0 or new_ids.size == 0:
        return graph
    lv = draw_levels(rng, new_ids.size, r, depth)
    if not (lv >= 1).any():
        return graph

    if os.environ.get("ALAYA_OVERLAY_HOST", "") != "1":
        # device path: the whole link runs in ONE jitted program. The host
        # path below issues ~50-100 eager device ops per batch; through a
        # TPU tunnel with a per-dispatch floor that measured 21-37 s per
        # 1024-insert batch (the entire rest of the insert is < 1 s warm).
        up = new_ids[lv >= 1]
        lv_up = lv[lv >= 1]
        mcap = -(-int(up.size) // 32) * 32
        pad = mcap - up.size
        overlay = _extend_overlay_dev(
            tuple(graph.overlay), space,
            jnp.asarray(np.pad(up, (0, pad), constant_values=-1)),
            jnp.asarray(np.pad(lv_up, (0, pad), constant_values=0)))
        return Graph(nbrs=graph.nbrs, eps=graph.eps, overlay=overlay)

    levels = [{
        "ids": np.array(l.ids), "nbrs": np.array(l.nbrs),
        "down": np.array(l.down),
    } for l in graph.overlay]
    up = new_ids[lv >= 1]
    up_vecs = np.asarray(space.data[jnp.asarray(up)].astype(jnp.float32))
    vec_of = {int(g): up_vecs[i] for i, g in enumerate(up)}
    below_slot = {}  # ids linked at the level just below -> their slot there
    changed = False
    for li in range(depth - 1, -1, -1):
        need = depth - li  # nodes with lv >= need belong in list index li
        members = new_ids[lv >= need]
        if li < depth - 1 and members.size:
            # only nodes actually linked one level below may climb: a node
            # truncated out of a full lower level degrades to the levels it
            # did reach (round-2 advisor: KeyError otherwise)
            members = np.asarray([g for g in members if int(g) in below_slot],
                                 dtype=np.int32)
        if members.size == 0:
            break
        L = levels[li]
        ids, nbrs, down = L["ids"], L["nbrs"], L["down"]
        free = np.flatnonzero(ids < 0)
        if free.size < members.size:
            log.warning("overlay level %d full (%d slots, %d inserts); "
                        "extra inserts stay base-layer only",
                        li, ids.size, members.size)
            members = members[: free.size]
            if members.size == 0:
                below_slot = {}
                continue
        occ = np.flatnonzero(ids >= 0)
        slots = free[: members.size]
        qv = np.stack([vec_of[int(g)] for g in members])
        # distances to every occupied member (levels hold ~n/R nodes)
        d = _batch_dists(space, qv, np.broadcast_to(ids[occ],
                                                    (members.size, occ.size)))
        r2 = nbrs.shape[1]
        k = min(r2, occ.size)
        sel = np.argsort(d, axis=1)[:, :k]  # local positions into occ
        ids[slots] = members
        down[slots] = (members if li == depth - 1 else
                       np.array([below_slot[int(g)] for g in members],
                                dtype=np.int32))
        rows = np.full((members.size, r2), -1, np.int32)
        rows[:, :k] = occ[sel]
        nbrs[slots] = rows
        this_slot = dict(zip(members.tolist(), slots.tolist()))
        # reverse edges: free slot, else replace the farthest if the new
        # node is closer (hnswlib shrink-on-overflow). All overflow rows
        # are scored in ONE device call — a per-edge call costs ~35 ms
        # through a TPU tunnel.
        pending = []  # (slot_of_new, c_slot, d_new_to_c)
        for m in range(members.size):
            for j, c in enumerate(occ[sel[m]]):
                crow = nbrs[c]
                hole = np.flatnonzero(crow < 0)
                if hole.size:
                    crow[hole[0]] = slots[m]
                else:
                    pending.append((slots[m], int(c), d[m, sel[m, j]]))
        if pending:
            c_slots = np.array([p[1] for p in pending], dtype=np.int32)
            c_vecs = np.asarray(space.data[jnp.asarray(ids[c_slots])]
                                .astype(jnp.float32))
            cd = _batch_dists(space, c_vecs, ids[nbrs[c_slots]])
            # per-row running distances: two pending entries hitting the
            # same full row must see each other's replacements (the batch
            # cd is pre-replacement state — comparing against it lets a
            # farther second insert evict a closer first one, diverging
            # from hnswlib's sequential shrink rule)
            cur_d = {}
            for row_i, (new_slot, c, dnew) in enumerate(pending):
                row_d = cur_d.setdefault(c, np.array(cd[row_i]))
                worst = int(np.argmax(row_d))
                if dnew < row_d[worst]:
                    nbrs[c][worst] = new_slot
                    row_d[worst] = dnew
        below_slot = this_slot
        changed = True

    if not changed:
        return graph
    overlay = tuple(
        OverlayLevel(ids=jnp.asarray(L["ids"]), nbrs=jnp.asarray(L["nbrs"]),
                     down=jnp.asarray(L["down"]))
        for L in levels)
    return Graph(nbrs=graph.nbrs, eps=graph.eps, overlay=overlay)


@functools.partial(jax.jit, donate_argnums=(0,))
def _extend_overlay_dev(overlay, space, up: jax.Array, lv_up: jax.Array):
    """Device edition of ``extend_overlay``: identical linking semantics
    (free-slot occupation bottom-up, r2-nearest rows against the PRE-batch
    occupants, hnswlib shrink-on-overflow reverse patch applied
    sequentially) in one jitted program, so an insert batch pays one
    dispatch here instead of ~50-100 eager tunnel round-trips.

    ``up``: [M] global ids with drawn level >= 1 (-1 pad); ``lv_up``: their
    levels. Returns the new overlay tuple. Full levels drop the overflow
    members (they stay base-layer only, like the host path's warning).
    """
    depth = len(overlay)
    ok0 = up >= 0
    gsafe = jnp.where(ok0, up, 0)
    # cos data is stored normalized (RawSpace.fit/insert), so raw rows are
    # directly comparable under the compute metric, same as the host path
    qv = space.data[gsafe].astype(jnp.float32)                 # [M, D]
    qsq = (space.sq_norms[gsafe] if space.metric != "ip"
           else jnp.zeros(gsafe.shape, jnp.float32))
    below_slot = jnp.full(up.shape, -1, jnp.int32)
    out = [None] * depth
    for li in range(depth - 1, -1, -1):
        L = overlay[li]
        need = depth - li
        Cl, r2 = L.nbrs.shape
        elig = ok0 & (lv_up >= need)
        if li < depth - 1:
            # only nodes actually linked one level below may climb
            elig = elig & (below_slot >= 0)
        occ = L.ids >= 0                                       # pre-batch
        n_free = jnp.sum(~occ)
        rank = jnp.cumsum(elig.astype(jnp.int32)) - 1
        take = elig & (rank < n_free)
        free_asc = jnp.argsort(occ)                            # free first
        slot = jnp.where(take, free_asc[jnp.clip(rank, 0, Cl - 1)], Cl)

        # member -> occupied distances in one contraction
        lg = jnp.where(occ, L.ids, 0)
        lx = space.data[lg].astype(jnp.float32)                # [Cl, D]
        dots = qv @ lx.T                                       # [M, Cl]
        if space.metric == "ip":
            d = -dots
        else:
            d = jnp.maximum(
                qsq[:, None] + space.sq_norms[lg][None, :] - 2.0 * dots, 0.0)
        d = jnp.where(occ[None, :] & take[:, None], d, FINF)
        k = min(r2, Cl)
        nd, sel = jax.lax.top_k(-d, k)                         # slot indices
        dsel = -nd
        sel = jnp.where(jnp.isfinite(nd), sel, -1)
        if k < r2:
            sel = jnp.pad(sel, ((0, 0), (0, r2 - k)), constant_values=-1)
            dsel = jnp.pad(dsel, ((0, 0), (0, r2 - k)),
                           constant_values=FINF)

        ids2 = L.ids.at[slot].set(up, mode="drop")             # Cl = drop
        nbrs2 = L.nbrs.at[slot].set(sel, mode="drop")
        dwn = up if li == depth - 1 else below_slot
        down2 = L.down.at[slot].set(dwn, mode="drop")

        # reverse patch, sequential like hnswlib: fill a hole, else
        # replace the farthest existing edge if the new node is closer.
        # Later pairs see earlier replacements via the scan carry.
        safe_sel = jnp.where(sel >= 0, sel, 0)
        c_gid = L.ids[safe_sel]                                # [M, r2]
        cvec = space.data[c_gid].astype(jnp.float32)           # [M, r2, D]
        csq = (space.sq_norms[c_gid] if space.metric != "ip"
               else jnp.zeros(c_gid.shape, jnp.float32))

        def step(nb, pair):
            m, j = pair // r2, pair % r2
            c = sel[m, j]
            valid = (c >= 0) & take[m]
            csafe = jnp.where(valid, c, 0)
            row = nb[csafe]                                    # [r2] slots
            holes = row < 0
            has_hole = jnp.any(holes)
            hole_idx = jnp.argmax(holes)
            rsafe = jnp.where(row >= 0, row, 0)
            rgid = ids2[rsafe]                                 # incl. new
            rvec = space.data[rgid].astype(jnp.float32)        # [r2, D]
            cd = rvec @ cvec[m, j]
            if space.metric == "ip":
                rd = -cd
            else:
                rd = jnp.maximum(
                    space.sq_norms[rgid] + csq[m, j] - 2.0 * cd, 0.0)
            rd = jnp.where(row >= 0, rd, -FINF)
            worst = jnp.argmax(rd)
            do_repl = (~has_hole) & (dsel[m, j] < rd[worst])
            idx = jnp.where(has_hole, hole_idx, worst)
            write = valid & (has_hole | do_repl)
            nb = nb.at[jnp.where(write, csafe, Cl), idx].set(
                slot[m], mode="drop")
            return nb, None

        nbrs2, _ = jax.lax.scan(step, nbrs2,
                                jnp.arange(up.shape[0] * r2, dtype=jnp.int32))
        out[li] = OverlayLevel(ids=ids2, nbrs=nbrs2, down=down2)
        below_slot = jnp.where(take, slot, -1).astype(jnp.int32)
    return tuple(out)


def affected_by_removal(nbrs: np.ndarray, removed: np.ndarray) -> np.ndarray:
    """Live node ids having at least one removed neighbor."""
    hit = np.isin(nbrs, removed).any(axis=1)
    aff = np.flatnonzero(hit).astype(np.int32)
    return aff[~np.isin(aff, removed)]


def rewire_candidates(nbrs: np.ndarray, affected: np.ndarray,
                      removed: np.ndarray) -> np.ndarray:
    """Per-affected-node candidate rows: current edges ∪ the edges of its
    removed neighbors (the 2-hop detour), removed + self masked to -1.

    Fully vectorized (the round-1 per-node Python loop cost minutes at 1M
    with 20% churn): one [A, W, W] gather, a per-row sort-dedup, and a
    stable left-pack. Candidate ORDER is irrelevant downstream —
    engine._topr_dedup re-sorts by exact distance and keeps the best copy
    of any duplicate id — so sort-based dedup only shrinks the row width.
    Width is padded to a 16-bucket so the jitted gather/prune consumers see
    recurring shapes."""
    n, width = nbrs.shape
    affected = np.asarray(affected, dtype=np.int32)
    if affected.size == 0:
        return np.empty((0, width), np.int32)
    rem = np.zeros(n, bool)
    rr = np.asarray(removed, dtype=np.int64)
    rem[rr[(rr >= 0) & (rr < n)]] = True
    cur = nbrs[affected]                                   # [A, W]
    safe = np.clip(cur, 0, n - 1)
    is_live = (cur >= 0) & ~rem[safe]
    is_rem = (cur >= 0) & rem[safe]
    direct = np.where(is_live, cur, -1)
    hop2 = nbrs[np.where(is_rem, cur, 0)]                  # [A, W, W]
    ok2 = (is_rem[:, :, None] & (hop2 >= 0)
           & ~rem[np.clip(hop2, 0, n - 1)]
           & (hop2 != affected[:, None, None]))
    hop2 = np.where(ok2, hop2, -1).reshape(affected.size, -1)
    cand = np.concatenate([direct, hop2], axis=1)
    # dedup: descending sort packs valid ids left and makes duplicates
    # adjacent; blank later copies, then stable-left-pack the survivors
    s = np.sort(cand, axis=1)[:, ::-1]
    s[:, 1:][s[:, 1:] == s[:, :-1]] = -1
    order = np.argsort(s < 0, axis=1, kind="stable")
    s = np.take_along_axis(s, order, axis=1)
    maxc = max(int((s >= 0).sum(axis=1).max()), width)
    # coarse 128-bucket: the candidate width varies with tombstone density,
    # and every distinct width is a fresh XLA compile of the gather +
    # top-R consumers (~30-60 s each through a TPU tunnel)
    maxc = -(-maxc // 128) * 128
    if maxc > s.shape[1]:
        s = np.pad(s, ((0, 0), (0, maxc - s.shape[1])), constant_values=-1)
    return np.ascontiguousarray(s[:, :maxc], dtype=np.int32)


def strip_overlay(graph: Graph, removed: np.ndarray) -> Graph:
    """Drop removed nodes from overlay levels: their slots become padding
    and rows pointing at them lose that edge. Down-chains through removed
    slots are left intact (a removed node can still route, matching the
    base layer's route-through-tombstone semantics)."""
    if len(graph.overlay) == 0:
        return graph
    removed = np.asarray(removed, dtype=np.int32)
    out = []
    changed = False
    for lvl in graph.overlay:
        ids = np.asarray(lvl.ids)
        dead = np.flatnonzero(np.isin(ids, removed))
        if dead.size == 0:
            out.append(lvl)
            continue
        nbrs = np.asarray(lvl.nbrs)
        nbrs = np.where(np.isin(nbrs, dead), -1, nbrs)
        ids = ids.copy()
        ids[dead] = -1
        out.append(OverlayLevel(ids=jnp.asarray(ids), nbrs=jnp.asarray(nbrs),
                                down=lvl.down))
        changed = True
    if not changed:
        return graph
    return Graph(nbrs=graph.nbrs, eps=graph.eps, overlay=tuple(out))
