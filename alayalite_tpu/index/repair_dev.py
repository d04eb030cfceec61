"""Device-resident connectivity repair (tree_grow/attach_unlinked analog,
/root/reference/include/index/graph/nsg/nsg_builder.hpp:500-628).

The host repair (nsg._attach_unreached) needs the full adjacency on the
host — a ~N·R·4-byte download (128 MB at 1M) plus ~10-60 s of numpy BFS
per build. Here every step runs on device against the resident adjacency:

- reachability : push-BFS under ``lax.while_loop`` — each pass scatters
  one True per live edge of the frontier into the next mask (32M-index
  scatter at 1M×32; O(diameter) passes),
- components   : min-label propagation over the unreached subgraph with
  pointer jumping (``labels[labels]``), so convergence is ~log(diameter)
  not diameter,
- attach       : one repair edge per component — the component
  representative hooked under its nearest *reached* node (exact MXU
  scan with the reached mask as validity), slots assigned by per-target
  rank so edges added in the same round never clobber each other.

The host only ever sees per-round scalars and the ≤REP_CAP representative
ids; the adjacency itself never leaves the device, which also lets the
downstream block re-quantization (rabitq.update_neighbors) and Graph
construction consume the device array directly — no bulk download at all.
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

log = logging.getLogger("alayalite_tpu")

REP_CAP = 8192  # components attached per round (rest picked up next round)


@jax.jit
def _expand_reached_dev(nbrs: jax.Array, reached: jax.Array) -> jax.Array:
    """Grow ``reached`` to the directed-BFS fixpoint along ``nbrs`` rows.
    Frontier-restricted push: only rows that became reachable last pass
    scatter their edges (sentinel index n drops everything else)."""
    n = nbrs.shape[0]

    def body(carry):
        reached, frontier = carry
        tgt = jnp.where(frontier[:, None] & (nbrs >= 0), nbrs, n)
        hit = jnp.zeros(n + 1, jnp.bool_).at[tgt.reshape(-1)].set(True)[:n]
        new_frontier = hit & ~reached
        return reached | hit, new_frontier

    reached, _ = lax.while_loop(lambda c: jnp.any(c[1]), body,
                                (reached, reached))
    return reached


@jax.jit
def _component_labels_dev(nbrs: jax.Array, mask: jax.Array) -> jax.Array:
    """Min-label connected components of the subgraph induced by ``mask``
    (edges undirected, matching nsg._components_of). Returns int32 labels
    (the smallest member id of each component; n where ~mask)."""
    n = nbrs.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    # edge i->k valid iff both endpoints are members
    mask_ext = jnp.concatenate([mask, jnp.zeros(1, jnp.bool_)])
    safe_nbrs = jnp.where(nbrs >= 0, nbrs, n)
    edge_ok = mask[:, None] & mask_ext[safe_nbrs]
    tgt = jnp.where(edge_ok, safe_nbrs, n)
    labels0 = jnp.where(mask, iota, n)

    def body(carry):
        labels, _ = carry
        lab_ext = jnp.concatenate([labels, jnp.array([n], jnp.int32)])
        # pull along out-edges
        pulled = jnp.min(jnp.where(edge_ok, lab_ext[tgt], n), axis=1)
        new = jnp.minimum(labels, pulled.astype(jnp.int32))
        # push along out-edges (covers the reverse direction)
        pushed = jnp.full(n + 1, n, jnp.int32).at[tgt.reshape(-1)].min(
            jnp.broadcast_to(new[:, None], tgt.shape).reshape(-1))[:n]
        new = jnp.minimum(new, pushed)
        # pointer jumping: labels point at member nodes, so chase them
        lab_ext = jnp.concatenate([new, jnp.array([n], jnp.int32)])
        new = jnp.minimum(new, lab_ext[jnp.where(new < n, new, n)])
        new = jnp.where(mask, new, n)
        return new, jnp.any(new != labels)

    labels, _ = lax.while_loop(lambda c: c[1], body,
                               (labels0, jnp.array(True)))
    return labels


@jax.jit
def _representatives_dev(labels: jax.Array, mask: jax.Array) -> jax.Array:
    """Up to REP_CAP component representatives (the node whose id equals
    its label), padded with n."""
    n = labels.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    score = jnp.where(mask & (labels == iota), iota, n)
    neg_top, _ = lax.top_k(-score, min(REP_CAP, n))
    return -neg_top  # ascending rep ids, padded with n


@partial(jax.jit, donate_argnums=(0, 3))
def _attach_dev(nbrs: jax.Array, reps: jax.Array, srcs: jax.Array,
                protected: jax.Array) -> tuple:
    """Write edge src→rep for every valid (rep, src) pair. Pairs are
    grouped by src; the k-th pair of a src takes the row's k-th
    *preferred* slot, where the preference order is unprotected empty
    slots first (in position order), then unprotected occupied slots
    FROM THE ROW'S END — rows are distance-sorted, so overflow clobbers
    the worst build edge, not the best (clobbering slot 0 of a thin
    scan-built graph re-disconnects whole subtrees and makes the repair
    oscillate — measured at 1M). ``protected[row, slot]`` marks slots
    holding a prior round's repair bridge; they sort LAST, so a later
    round never silently overwrites a bridge (the second oscillation
    mode: a cursor over a per-round-recomputed permutation landed
    exactly on the previous round's bridge once that bridge flipped the
    slot from empty to occupied-near-the-end). Protected slots are only
    reused if every slot of the row is already a bridge. Returns
    (nbrs, protected) updated."""
    n, r = nbrs.shape
    k = reps.shape[0]
    valid = (reps < n) & (srcs >= 0)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(jnp.where(valid, srcs, big))
    s = srcs[order]
    u = reps[order]
    v = valid[order]
    idx = jnp.arange(k, dtype=jnp.int32)
    new_group = jnp.concatenate([jnp.ones(1, jnp.bool_), s[1:] != s[:-1]])
    group_start = lax.cummax(jnp.where(new_group, idx, 0))
    rank = idx - group_start
    s_safe = jnp.where(v, s, 0)
    rows = nbrs[s_safe]                              # [K, R]
    prot = protected[s_safe]                         # [K, R]
    col = jnp.arange(r, dtype=jnp.int32)[None, :]
    # preference key: unprotected empties ascending (0..r-1), unprotected
    # occupied descending from the end (2r..3r-1 reversed), protected
    # last (4r..5r-1) — argsort yields the policy above
    pref_key = jnp.where(rows < 0, col, 3 * r - 1 - col)
    pref_key = jnp.where(prot, 4 * r + col, pref_key)
    perm = jnp.argsort(pref_key, axis=1)
    pos = rank % r
    slot = perm[idx, pos].astype(jnp.int32)
    nbrs = nbrs.at[jnp.where(v, s, n), slot].set(u, mode="drop")
    protected = protected.at[jnp.where(v, s, n), slot].set(True, mode="drop")
    return nbrs, protected


@partial(jax.jit, static_argnames=("tile", "metric"))
def _nearest_valid_dev(qs: jax.Array, data: jax.Array, sq: jax.Array,
                       valid: jax.Array, tile: int, metric: str) -> jax.Array:
    """Nearest valid node id for each query row — a tiled in-jit min-scan.

    Replaces the repair's exact_topk call: eager exact_topk at 1M x 960
    materialized a full-array copy (pad to the tile multiple), an unfused
    |x|² transient, and the [Q, tile] distance tile all at once — HBM
    exhaustion next to the resident f32 data (measured, GIST-1M build).
    Here the base is sliced in-jit (overlapping tail tiles are harmless
    under min) and |x|² comes from the space's stored sq_norms. bf16
    scoring: repair only needs a *near* reached node."""
    n = data.shape[0]
    nt = -(-n // tile)
    starts = jnp.minimum(jnp.arange(nt, dtype=jnp.int32) * tile,
                         jnp.int32(n - tile))
    qb = qs.astype(jnp.bfloat16)

    def body(i, carry):
        best_d, best_i = carry
        lo = starts[i]
        xt = lax.dynamic_slice_in_dim(data, lo, tile).astype(jnp.bfloat16)
        vt = lax.dynamic_slice_in_dim(valid, lo, tile)
        dot = jnp.dot(qb, xt.T, preferred_element_type=jnp.float32)
        if metric == "ip":
            d = -dot
        else:  # |q|² constant per row: drop it
            sqt = lax.dynamic_slice_in_dim(sq, lo, tile)
            d = sqt[None, :] - 2.0 * dot
        d = jnp.where(vt[None, :], d, jnp.inf)
        j = jnp.argmin(d, axis=1)
        dm = jnp.take_along_axis(d, j[:, None], 1)[:, 0]
        ni = (lo + j).astype(jnp.int32)
        upd = dm < best_d
        return jnp.where(upd, dm, best_d), jnp.where(upd, ni, best_i)

    init = (jnp.full((qs.shape[0],), jnp.inf, jnp.float32),
            jnp.zeros((qs.shape[0],), jnp.int32))
    _, best_i = lax.fori_loop(0, nt, body, init)
    return best_i


def repair_connectivity_dev(space, nbrs: jax.Array, ep: int,
                            max_rounds: int = 24,
                            tol: float = 2e-4) -> jax.Array:
    """Device-resident repair loop; same convergence contract as the host
    _attach_unreached (residual unreachable ≤ tol·n, verified by a full
    BFS from scratch — bridges are slot-protected across rounds, but a
    fully-bridged row wraps and may clobber). Only scalars and ≤REP_CAP-id
    vectors cross the host boundary."""
    n = nbrs.shape[0]
    seed = jnp.zeros(n, jnp.bool_).at[ep].set(True)
    reached = _expand_reached_dev(nbrs, seed)
    protected = jnp.zeros(nbrs.shape, jnp.bool_)
    # hoisted out of the round loop: at near-capacity high-dim shapes the
    # [:n] slice materializes a multi-GB fresh device array per round
    data_n = space.data[:n] if n != space.capacity else space.data
    norms_n = (space.sq_norms[:n] if n != space.capacity
               else space.sq_norms)
    verified = True
    for _round in range(max_rounds):
        missing = int(jnp.sum(~reached))
        if missing <= max(0, int(tol * n)) and _round > 0:
            if verified:
                break
            reached = _expand_reached_dev(nbrs, seed)
            verified = True
            continue
        if missing == 0:
            break
        verified = False
        mask = ~reached
        labels = _component_labels_dev(nbrs, mask)
        reps = _representatives_dev(labels, mask)
        n_comp = int(jnp.sum(reps < n))
        log.info("attach round %d (device): %d unreached in %d components",
                 _round, missing, n_comp)
        if n_comp == 0:  # isolated only via dropped edges; nothing to hook
            break
        qs = space.data[jnp.minimum(reps, n - 1)].astype(jnp.float32)
        tile = min(16384, n)
        srcs = _nearest_valid_dev(qs, data_n, norms_n,
                                  reached, tile=tile, metric=space.metric)
        nbrs, protected = _attach_dev(nbrs, reps, srcs, protected)
        reached = _expand_reached_dev(nbrs, reached)
    return nbrs


def repair_connectivity(space, nbrs, ep: int, n_small: int = 200_000):
    """THE repair dispatch for every builder (hnsw/nsg/qg share the
    policy): device-resident repair when the adjacency is a device array
    and large enough that the bulk download dominates (> n_small rows —
    below that the host BFS is faster than the device loop's per-round
    dispatches and the download is cheap); host numpy repair otherwise.
    ALAYA_REPAIR forces a mode ("device"/"host") for A/Bs."""
    import os

    import numpy as np

    mode = os.environ.get("ALAYA_REPAIR")
    on_dev = isinstance(nbrs, jax.Array)
    use_dev = on_dev and (mode == "device"
                          or (mode != "host" and nbrs.shape[0] > n_small))
    if use_dev:
        # adjacency stays device-resident end to end: repair, any block
        # re-quantization, and Graph construction all consume the device
        # array — no ~N·R·4-byte download (128 MB at 1M)
        return repair_connectivity_dev(space, nbrs, ep)
    from .nsg import _attach_unreached

    if on_dev:
        nbrs = np.array(nbrs)  # blocks on queued device phases too
    return _attach_unreached(space, nbrs, ep)
