"""Frozen copy of the round-1 ring visited-filter, kept so the r1
measurement scripts (opt_hop.py, profile_block_hop.py, proto_fresh.py)
remain runnable after the library moved to the pop-ring design
(index/search.py::_expand_popring, r2)."""

from typing import Optional

import jax
import jax.numpy as jnp


def _ring_fresh(ring: jax.Array, pool_i: jax.Array, cand: jax.Array,
                pop_ring: Optional[jax.Array] = None):
    in_ring = jnp.any(cand[:, :, None] == ring[:, None, :], axis=2)
    in_pool = jnp.any(cand[:, :, None] == pool_i[:, None, :], axis=2)
    K = cand.shape[1]
    dup = (cand[:, :, None] == cand[:, None, :]) & \
        jnp.tril(jnp.ones((K, K), dtype=bool), k=-1)[None, :, :]
    dup_earlier = jnp.any(dup, axis=2)
    fresh = (cand >= 0) & ~in_ring & ~in_pool & ~dup_earlier
    if pop_ring is not None:
        fresh &= ~jnp.any(cand[:, :, None] == pop_ring[:, None, :], axis=2)
    return fresh
