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
