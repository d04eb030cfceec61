"""Top-k pool primitives for batched beam search.

TPU-native replacement for the reference's LinearPool / SearchBuffer
(include/utils/query_utils.hpp:236-312, rabitq_utils/search_utils/buffer.hpp:
32-122): instead of a per-query sorted array with branchy binary-search
inserts, the pool is a fixed-width [B, L] array batch merged with
``lax.top_k`` each step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def merge_topk(
    d1: jax.Array, i1: jax.Array, d2: jax.Array, i2: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge two batched candidate sets by smallest distance → top-k.

    Shapes: d1 [B, L1], d2 [B, L2] → ([B, k], [B, k]) sorted ascending.
    """
    cat_d = jnp.concatenate([d1, d2], axis=-1)
    cat_i = jnp.concatenate([i1, i2], axis=-1)
    sd, si = jax.lax.sort_key_val(cat_d, cat_i, dimension=-1)
    return sd[..., :k], si[..., :k]


def merge_topk_with_flags(
    d1: jax.Array, i1: jax.Array, f1: jax.Array,
    d2: jax.Array, i2: jax.Array, f2: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """merge_topk carrying a per-entry bool flag (e.g. 'checked').

    Implemented as ONE ``lax.sort_key_val`` with (id, flag) packed into a
    single i32 payload: XLA lowers the three-array ``top_k`` variant to a
    variadic sort whose 3-way comparator costs 4.5x more on v5e (measured
    3.62 ms vs 0.81 ms at [4096, 288], scripts/opt_hop2.py). Stable sort,
    first-operand entries win ties — identical semantics to the top_k form.
    Packing is exact for any id ≥ -1 (arithmetic shift restores the sign).
    """
    cat_d = jnp.concatenate([d1, d2], axis=-1)
    pay = jnp.concatenate([i1 * 2 + f1.astype(jnp.int32),
                           i2 * 2 + f2.astype(jnp.int32)], axis=-1)
    sd, sp = jax.lax.sort_key_val(cat_d, pay, dimension=-1)
    sd, sp = sd[..., :k], sp[..., :k]
    return sd, sp >> 1, (sp & 1) == 1


def merge_topk_dedup(
    d1: jax.Array, i1: jax.Array, f1: jax.Array,
    d2: jax.Array, i2: jax.Array, f2: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """merge_topk_with_flags that also neutralizes duplicate ids.

    Assumes duplicates carry IDENTICAL (distance, id, flag) triples — true
    for within-hop candidate dups, which all come from the same estimate
    formula — so after the stable sort they are ADJACENT. The later copy is
    marked (id = -1, flag = checked): the pop rank-select skips it and the
    final rerank masks it, at the cost of one dead pool slot until it is
    evicted. This replaces the K x K broadcast-compare dup check in the hop
    (~2x the dedup stage's cost at K=256 on v5e, scripts/proto_fresh.py).
    """
    cat_d = jnp.concatenate([d1, d2], axis=-1)
    pay = jnp.concatenate([i1 * 2 + f1.astype(jnp.int32),
                           i2 * 2 + f2.astype(jnp.int32)], axis=-1)
    sd, sp = jax.lax.sort_key_val(cat_d, pay, dimension=-1)
    sd, sp = sd[..., :k], sp[..., :k]
    prev = jnp.concatenate([jnp.full_like(sp[..., :1], -3), sp[..., :-1]],
                           axis=-1)
    dup = (sp == prev) & (sp >= 0) & jnp.isfinite(sd)
    # dups go to (FINF, -1, checked): the pop rank-select skips them this
    # hop (the unchecked subsequence keeps its sorted order) and the next
    # merge's sort sinks them off the pool entirely — no dead slots.
    sd = jnp.where(dup, jnp.inf, sd)
    ids = jnp.where(dup, -1, sp >> 1)
    flags = ((sp & 1) == 1) | dup
    return sd, ids, flags
