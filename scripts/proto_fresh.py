"""A/B the hop dedup: current _ring_fresh (vs prev-hop candidates, K x 536
compares) against a pop-ring check (vs the M*hops popped nodes + pool +
within-K dup), which is semantically exact for re-expansion prevention:
  - a node can only be re-EXPANDED if it re-enters the pool unchecked after
    having been popped -> popring membership catches every such case.
  - candidates equal to a current pool entry are dups -> pool check.
  - within-hop duplicate candidates -> K x K (or across-row-only) check.
Re-adding a previously-seen-but-evicted UNCHECKED candidate is harmless
(it merges only if it beats the pool tail, same as first time).

Run: python scripts/proto_fresh.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alayalite_tpu.utils.platforms import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _r1_ring import _ring_fresh  # noqa: E402

B, K, L, RING, P, M, R = 4096, 256, 24, 256, 64, 8, 32
ITERS = 32
rng = np.random.default_rng(0)
N = 100000

nids0 = jnp.asarray(rng.integers(0, N, size=(B, K)).astype(np.int32))
pool_i = jnp.asarray(rng.integers(0, N, size=(B, L)).astype(np.int32))
ring0 = jnp.asarray(rng.integers(0, N, size=(B, RING)).astype(np.int32))
popring0 = jnp.asarray(rng.integers(0, N, size=(B, P)).astype(np.int32))


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(name, fn, *args):
    sync(fn(*args))
    t0 = time.time()
    sync(fn(*args))
    dt = time.time() - t0 - 0.035
    print(f"{name:28} {dt*1000/ITERS:8.3f} ms/hop", flush=True)


def loop(body):
    @jax.jit
    def run(nids, pool_i, ring):
        def f(i, carry):
            nids, acc = carry
            fresh = body((nids + i) % N, pool_i, ring)
            return nids, acc + fresh[:, :1].astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, f, (nids, jnp.zeros((B, 1))))
    return run


def cur(nids, pool_i, ring):
    return _ring_fresh(ring, pool_i, nids)


def popring_full(nids, pool_i, popring):
    seen = jnp.concatenate([popring, pool_i], axis=1)       # [B, P+L]
    hit = jnp.any(nids[:, :, None] == seen[:, None, :], axis=2)
    first = jnp.triu(jnp.ones((K, K), bool), k=1)           # j' < j
    dup = jnp.any((nids[:, :, None] == nids[:, None, :]) & first.T[None],
                  axis=2)
    return ~(hit | dup) & (nids >= 0)


def popring_rows(nids, pool_i, popring):
    # within-K restricted to ACROSS the M rows (rows are dup-free by build)
    seen = jnp.concatenate([popring, pool_i], axis=1)
    hit = jnp.any(nids[:, :, None] == seen[:, None, :], axis=2)
    g = nids.reshape(B, M, R)
    # dup vs any EARLIER row
    dup = jnp.zeros((B, M, R), bool)
    for m in range(1, M):
        prev = g[:, :m].reshape(B, m * R)
        dup = dup.at[:, m].set(
            jnp.any(g[:, m][:, :, None] == prev[:, None, :], axis=2))
    return ~(hit | dup.reshape(B, K)) & (nids >= 0)


timeit("ring_fresh (current)", loop(cur), nids0, pool_i, ring0)
timeit("popring + KxK dup", loop(popring_full), nids0, pool_i, popring0)
timeit("popring + across-row dup", loop(popring_rows), nids0, pool_i, popring0)
