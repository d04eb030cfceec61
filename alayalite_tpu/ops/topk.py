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
    nd, sel = jax.lax.top_k(-cat_d, k)
    ni = jnp.take_along_axis(cat_i, sel, axis=-1)
    return -nd, ni


def merge_topk_with_flags(
    d1: jax.Array, i1: jax.Array, f1: jax.Array,
    d2: jax.Array, i2: jax.Array, f2: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """merge_topk carrying a per-entry bool flag (e.g. 'checked')."""
    cat_d = jnp.concatenate([d1, d2], axis=-1)
    cat_i = jnp.concatenate([i1, i2], axis=-1)
    cat_f = jnp.concatenate([f1, f2], axis=-1)
    nd, sel = jax.lax.top_k(-cat_d, k)
    ni = jnp.take_along_axis(cat_i, sel, axis=-1)
    nf = jnp.take_along_axis(cat_f, sel, axis=-1)
    return -nd, ni, nf
