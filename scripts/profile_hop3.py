"""Round-2 hop profile: time the CURRENT block_beam_search stages.

Stages (index/search.py::block_beam_search body as of r2):
  pop       : _pop_best_m rank-select over the sorted [B, L] pool
  estimate  : BQGSpace.estimate_many — fat gather + pallas block_diagdot
  stale     : popring+pool membership check (replaces the r1 ring)
  merge     : merge_topk_dedup (ONE sort_key_val, packed payload)
  hop       : full body chained
  search    : whole block_beam_search via block_search_device shapes,
              repeated in-jit (chip rate, amortizing the ~35 ms relay floor)

Run on TPU (single process): python scripts/profile_hop3.py
Env: PH_B, PH_N, PH_EF, PH_M, PH_RING, PH_ITERS.
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

from alayalite_tpu.index.search import (_pop_best_m,  # noqa: E402
                                        block_beam_search)
from alayalite_tpu.ops.topk import merge_topk_dedup  # noqa: E402
from alayalite_tpu.spaces.bqg import BQGSpace  # noqa: E402

B = int(os.environ.get("PH_B", "4096"))
N = int(os.environ.get("PH_N", "100000"))
D = int(os.environ.get("PH_D", "128"))
R = int(os.environ.get("PH_R", "32"))
M = int(os.environ.get("PH_M", "8"))
L = int(os.environ.get("PH_EF", "24"))
RING = int(os.environ.get("PH_RING", "64"))  # popring: M*max_iters slots
ITERS = int(os.environ.get("PH_ITERS", "32"))
K = M * R

print(f"# B={B} N={N} D={D} R={R} M={M} K={K} L={L} ring={RING} iters={ITERS}",
      file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
data = rng.normal(size=(N, D)).astype(np.float32)
space = BQGSpace.create(N, D, degree=R).fit(data)
space = space.update_neighbors(
    rng.integers(0, N, size=(N, R)).astype(np.int32))
q_np = rng.normal(size=(B, D)).astype(np.float32)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(name, fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    out = fn(*args)
    sync(out)
    dt = time.time() - t0 - 0.035
    print(f"{name:22} {dt*1000/ITERS:8.3f} ms/iter  total {dt*1000:8.1f} ms",
          flush=True)


def loop(body):
    @jax.jit
    def run(sp, q, pool_d, pool_i, pool_c, ring):
        ctx = sp.query_ctx(q)

        def f(i, carry):
            return body(i, carry, sp, ctx)
        return jax.lax.fori_loop(0, ITERS, f, (pool_d, pool_i, pool_c, ring))
    return run


pool_d0 = jnp.asarray(np.sort(rng.normal(size=(B, L)).astype(np.float32), 1))
pool_i0 = jnp.asarray(rng.integers(0, N, size=(B, L)).astype(np.int32))
pool_c0 = jnp.zeros((B, L), dtype=bool)
ring0 = jnp.asarray(rng.integers(0, N, size=(B, RING)).astype(np.int32))
q = jnp.asarray(q_np)


def body_pop(i, carry, sp, ctx):
    pool_d, pool_i, pool_c, ring = carry
    u, act, pool_c2 = _pop_best_m(pool_d, pool_i, pool_c, M)
    return pool_d + 1e-12 * u[:, :1], pool_i, pool_c, ring


def body_est(i, carry, sp, ctx):
    pool_d, pool_i, pool_c, ring = carry
    u, act, _ = _pop_best_m(pool_d, pool_i, pool_c, M)
    est, nids = sp.estimate_many(ctx, jnp.where(act, u, 0))
    return pool_d + 1e-12 * est[:, :1], pool_i, pool_c, ring


def body_stale(i, carry, sp, ctx):
    # popring+pool membership check (replaces the r1 candidate ring)
    pool_d, pool_i, pool_c, popring = carry
    u, act, _ = _pop_best_m(pool_d, pool_i, pool_c, M)
    popring = jnp.concatenate([popring[:, M:], jnp.where(act, u, -1)], axis=1)
    nids = (u[:, :1] + jnp.arange(K, dtype=jnp.int32)[None]) % N
    seen = jnp.concatenate([popring, pool_i], axis=1)
    stale = jnp.any(nids[:, :, None] == seen[:, None, :], axis=2)
    return (pool_d + 1e-12 * stale[:, :1].astype(jnp.float32), pool_i,
            pool_c, popring)


def body_merge(i, carry, sp, ctx):
    pool_d, pool_i, pool_c, ring = carry
    u, act, pool_c = _pop_best_m(pool_d, pool_i, pool_c, M)
    est = jnp.abs(jnp.sin(u[:, :1] * 1.0)) * jnp.ones((B, K)) + i
    nids = (u[:, :1] + jnp.arange(K, dtype=jnp.int32)[None]) % N
    pool_d, pool_i, pool_c = merge_topk_dedup(
        pool_d, pool_i, pool_c, est, nids, jnp.zeros((B, K), bool), L)
    return pool_d, pool_i, pool_c, ring


def body_hop(i, carry, sp, ctx):
    pool_d, pool_i, pool_c, popring = carry
    u, act, pool_c = _pop_best_m(pool_d, pool_i, pool_c, M)
    popring = jnp.concatenate([popring[:, M:], jnp.where(act, u, -1)], axis=1)
    est, nids = sp.estimate_many(ctx, jnp.where(act, u, 0))
    nids = jnp.where(jnp.repeat(act, R, axis=1), nids, -1)
    seen = jnp.concatenate([popring, pool_i], axis=1)
    stale = jnp.any(nids[:, :, None] == seen[:, None, :], axis=2)
    fresh = (nids >= 0) & ~stale
    est = jnp.where(fresh, est, np.float32(np.inf))
    pool_d, pool_i, pool_c = merge_topk_dedup(
        pool_d, pool_i, pool_c, est, jnp.where(fresh, nids, -1),
        jnp.zeros_like(fresh), L)
    return pool_d, pool_i, pool_c, popring


for name, body in [("pop(rank-select)", body_pop), ("estimate_many", body_est),
                   ("stale(popring)", body_stale), ("merge(dedup)", body_merge),
                   ("full hop", body_hop)]:
    timeit(name, loop(body), space, q, pool_d0, pool_i0, pool_c0, ring0)

# ---- whole-search chip rate: REPS searches inside one jit ----
REPS = 8
seeds = jnp.asarray(rng.integers(0, N, size=(B, 1)).astype(np.int32))


@jax.jit
def whole(sp, q, seeds):
    def f(i, acc):
        d, ids = block_beam_search(sp, seeds, q + acc * 1e-12, k=10, ef=L,
                                   n_expand=M, ring_size=RING)
        return acc + d[0, 0]
    return jax.lax.fori_loop(0, REPS, f, jnp.float32(0.0))


sync(whole(space, q, seeds))
t0 = time.time()
sync(whole(space, q, seeds))
dt = time.time() - t0 - 0.035
per = dt / REPS
print(f"whole search          {per*1000:8.3f} ms  -> chip QPS {B/per:,.0f}",
      flush=True)
