"""Ablate the lockstep beam-search iteration: which op eats the time?

Times 32-iteration fori_loops of progressively more complete iteration
bodies at serving shapes (B=4096, ef=64, M*R=128 candidates, N=100k).
Run on the TPU, single process.
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

B = int(os.environ.get("AB_B", "4096"))
N = int(os.environ.get("AB_N", "100000"))
D = int(os.environ.get("AB_D", "128"))
K = int(os.environ.get("AB_K", "128"))     # candidates per iteration
L = int(os.environ.get("AB_L", "64"))      # pool width
ITERS = 32

print(f"# B={B} N={N} D={D} K={K} L={L} iters={ITERS}", file=sys.stderr)

rng = np.random.default_rng(0)
data = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
sqn = jnp.sum(data * data, axis=1)
q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
ids0 = jnp.asarray(rng.integers(0, N, size=(B, K)).astype(np.int32))
W = -(-N // 32)


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    dt = time.time() - t0
    print(f"{name:28} {dt*1000/ITERS:8.3f} ms/iter  total {dt*1000:8.1f} ms",
          flush=True)
    return out


def loop(body):
    @jax.jit
    def run(ids):
        def f(i, carry):
            return body(i, carry)
        return jax.lax.fori_loop(0, ITERS, f, (ids, jnp.zeros((B, L)),
                                               jnp.zeros((B, L), jnp.int32),
                                               jnp.zeros((B, W), jnp.uint32)))
    return run


def rotate(i, ids):
    return (ids + i * 7919) % N


# 1. gather + distance only
def body_gather(i, carry):
    ids, pd, pi, vis = carry
    ids = rotate(i, ids)
    vecs = data[ids]
    dot = jnp.einsum("bkd,bd->bk", vecs, q, preferred_element_type=jnp.float32)
    d = -dot
    return ids, pd + d[:, :L] * 0, pi, vis


# 2. + visited probe (sort + scatter)
def body_visited(i, carry):
    ids, pd, pi, vis = carry
    ids = rotate(i, ids)
    ids_s = jnp.sort(ids, axis=1)
    prev = jnp.concatenate([jnp.full((B, 1), -2, jnp.int32), ids_s[:, :-1]], axis=1)
    ok = (ids_s >= 0) & (ids_s != prev)
    word = jnp.where(ok, ids_s >> 5, 0)
    bit = jnp.where(ok, jnp.uint32(1) << (ids_s & 31).astype(jnp.uint32), jnp.uint32(0))
    old = jnp.take_along_axis(vis, word, axis=1)
    fresh = ok & ((old & bit) == 0)
    add = jnp.where(fresh, bit, jnp.uint32(0))
    flat = (jnp.arange(B, dtype=jnp.int32)[:, None] * W + word).reshape(-1)
    vis = vis.reshape(-1).at[flat].add(add.reshape(-1)).reshape(B, W)
    return ids, pd, pi, vis


# 3. + merge top_k
def body_merge(i, carry):
    ids, pd, pi, vis = carry
    ids = rotate(i, ids)
    vecs = data[ids]
    dot = jnp.einsum("bkd,bd->bk", vecs, q, preferred_element_type=jnp.float32)
    d = -dot
    cat_d = jnp.concatenate([pd, d], axis=1)
    cat_i = jnp.concatenate([pi, ids], axis=1)
    nd, sel = jax.lax.top_k(-cat_d, L)
    ni = jnp.take_along_axis(cat_i, sel, axis=1)
    return ids, -nd, ni, vis


# 4. full iteration (gather+dist + visited + merge)
def body_full(i, carry):
    ids, pd, pi, vis = carry
    _, pd2, pi2, vis = body_visited(i, (ids, pd, pi, vis))
    return body_merge(i, (ids, pd2, pi2, vis))


print("warming + timing (each compiled once):", file=sys.stderr)
timeit("gather+dist", loop(body_gather), ids0)
timeit("visited(sort+scatter)", loop(body_visited), ids0)
timeit("merge(top_k)", loop(body_merge), ids0)
timeit("full", loop(body_full), ids0)

# scatter alone
def body_scatter(i, carry):
    ids, pd, pi, vis = carry
    ids = rotate(i, ids)
    word = ids >> 5
    bit = jnp.uint32(1) << (ids & 31).astype(jnp.uint32)
    flat = (jnp.arange(B, dtype=jnp.int32)[:, None] * W + word).reshape(-1)
    vis = vis.reshape(-1).at[flat].add(bit.reshape(-1)).reshape(B, W)
    return ids, pd, pi, vis


def body_sort(i, carry):
    ids, pd, pi, vis = carry
    ids = rotate(i, ids)
    ids = jnp.sort(ids, axis=1)
    return ids, pd, pi, vis


timeit("scatter only", loop(body_scatter), ids0)
timeit("sort only", loop(body_sort), ids0)
