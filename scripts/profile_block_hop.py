"""Decompose the bsq8 block-search hop cost on the real TPU.

Times ITERS-iteration fori_loops of progressively larger subsets of the
block_beam_search hop body (index/search.py::block_beam_search) at serving
shapes, to find where the ~5.8 ms/hop (B=4096, round 1) actually goes:

  pop        : top_k(M) over the [B, L] pool
  gather     : nbr_codes[u] fat-row gather       [B, M, R, D] u8
  estimate   : gather + u8->bf16 + einsum + xsq
  ring       : _ring_fresh (in_ring / in_pool / dup broadcast compares)
  merge      : merge_topk_with_flags([B,L] pool, [B, K] candidates)
  full       : everything chained (the real hop)

Run on TPU, single process:  python scripts/profile_block_hop.py
Env: PB_B, PB_N, PB_L, PB_M, PB_RING override shapes.
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

from alayalite_tpu.ops.topk import merge_topk_with_flags  # noqa: E402
from _r1_ring import _ring_fresh  # noqa: E402

B = int(os.environ.get("PB_B", "4096"))
N = int(os.environ.get("PB_N", "100000"))
D = int(os.environ.get("PB_D", "128"))
R = int(os.environ.get("PB_R", "32"))
M = int(os.environ.get("PB_M", "8"))
L = int(os.environ.get("PB_L", "32"))
RING = int(os.environ.get("PB_RING", "256"))
ITERS = int(os.environ.get("PB_ITERS", "32"))
K = M * R

print(f"# B={B} N={N} D={D} R={R} M={M} K={K} L={L} ring={RING} iters={ITERS}",
      file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 256, size=(N, R, D)).astype(np.uint8))
nids = jnp.asarray(rng.integers(0, N, size=(N, R)).astype(np.int32))
xsq = jnp.asarray(rng.normal(size=(N, R)).astype(np.float32))
qs = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32)).astype(jnp.bfloat16)
qconst = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))

pool_d0 = jnp.asarray(np.sort(rng.normal(size=(B, L)).astype(np.float32), axis=1))
pool_i0 = jnp.asarray(rng.integers(0, N, size=(B, L)).astype(np.int32))
pool_c0 = jnp.zeros((B, L), dtype=bool)
ring0 = jnp.asarray(rng.integers(0, N, size=(B, RING)).astype(np.int32))


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(name, fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    out = fn(*args)
    sync(out)
    dt = time.time() - t0 - 0.035
    print(f"{name:22} {dt*1000/ITERS:8.3f} ms/hop   total {dt*1000:8.1f} ms",
          flush=True)


def loop(body):
    # big arrays MUST be jit arguments: captured constants ship with the
    # remote-compile request through the tunnel (HTTP 413 on the 400MB
    # codes tensor) — CLAUDE.md TPU rules
    @jax.jit
    def run(codes, nids, xsq, qs, qconst, pool_d, pool_i, pool_c, ring):
        env = (codes, nids, xsq, qs, qconst)

        def f(i, carry):
            return body(i, carry, env)
        return jax.lax.fori_loop(0, ITERS, f, (pool_d, pool_i, pool_c, ring))
    return run


def pops(i, pool_d, pool_i, pool_c):
    cand = jnp.where((~pool_c) & jnp.isfinite(pool_d), pool_d, jnp.inf)
    negd, sel = jax.lax.top_k(-cand, M)
    u = jnp.take_along_axis(pool_i, sel, axis=1)
    return (u + i) % N, sel, jnp.isfinite(-negd)


def body_pop(i, carry, env):
    pool_d, pool_i, pool_c, ring = carry
    u, sel, act = pops(i, pool_d, pool_i, pool_c)
    pool_d = pool_d + 1e-12 * u[:, :1]
    return pool_d, pool_i, pool_c, ring


def body_gather(i, carry, env):
    codes, nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, sel, act = pops(i, pool_d, pool_i, pool_c)
    c = codes[u]                                   # [B, M, R, D]
    pool_d = pool_d + 1e-12 * c[:, 0, 0, 0].astype(jnp.float32)[:, None]
    return pool_d, pool_i, pool_c, ring


def body_estimate(i, carry, env):
    codes, nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, sel, act = pops(i, pool_d, pool_i, pool_c)
    c = codes[u].reshape(B, K, D)
    cf = (c.astype(jnp.int16) - 128).astype(jnp.bfloat16)
    dot = jnp.einsum("bkd,bd->bk", cf, qs, preferred_element_type=jnp.float32)
    est = qconst[:, None] - 2.0 * dot + xsq[u].reshape(B, K)
    pool_d = pool_d + 1e-12 * est[:, :1]
    return pool_d, pool_i, pool_c, ring


def body_ring(i, carry, env):
    codes, nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, sel, act = pops(i, pool_d, pool_i, pool_c)
    cand = nids[u].reshape(B, K)
    fresh = _ring_fresh(ring, pool_i, cand)
    ring = jnp.concatenate([ring[:, K:], cand], axis=1) if K < RING else cand[:, -RING:]
    pool_d = pool_d + 1e-12 * fresh[:, :1].astype(jnp.float32)
    return pool_d, pool_i, pool_c, ring


def body_merge(i, carry, env):
    codes, nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, sel, act = pops(i, pool_d, pool_i, pool_c)
    est = qconst[:, None] * jnp.ones((B, K)) + i
    cand = nids[u].reshape(B, K)
    pool_d, pool_i, pool_c = merge_topk_with_flags(
        pool_d, pool_i, pool_c, est, cand, jnp.zeros((B, K), bool), L)
    return pool_d, pool_i, pool_c, ring


def body_full(i, carry, env):
    codes, nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    slot_iota = jnp.arange(L, dtype=jnp.int32)[None, :]
    u, sel, act = pops(i, pool_d, pool_i, pool_c)
    pool_c = pool_c | jnp.any(
        (slot_iota[:, None, :] == sel[:, :, None]) & act[:, :, None], axis=1)
    c = codes[u].reshape(B, K, D)
    cf = (c.astype(jnp.int16) - 128).astype(jnp.bfloat16)
    dot = jnp.einsum("bkd,bd->bk", cf, qs, preferred_element_type=jnp.float32)
    est = qconst[:, None] - 2.0 * dot + xsq[u].reshape(B, K)
    cand = nids[u].reshape(B, K)
    fresh = _ring_fresh(ring, pool_i, cand)
    est = jnp.where(fresh, est, jnp.inf)
    pool_d, pool_i, pool_c = merge_topk_with_flags(
        pool_d, pool_i, pool_c, est, jnp.where(fresh, cand, -1),
        jnp.zeros((B, K), bool), L)
    ring = jnp.concatenate([ring[:, K:], cand], axis=1) if K < RING else cand[:, -RING:]
    return pool_d, pool_i, pool_c, ring


for name, body in [("pop", body_pop), ("gather", body_gather),
                   ("estimate", body_estimate), ("ring", body_ring),
                   ("merge", body_merge), ("full", body_full)]:
    timeit(name, loop(body), codes, nids, xsq, qs, qconst,
           pool_d0, pool_i0, pool_c0, ring0)
