"""A/B micro-bench for block-search hop optimizations on the real TPU.

Round-1 profile (scripts/profile_block_hop.py, B=4096 M=8 R=32 L=32):
    pop 2.08 | gather 1.08 | estimate(math) 1.80 | ring 0.39 | merge 1.98
    full 7.54 ms/hop
Hypotheses tested here:
    pop_rank  : the pool is kept sorted by the merge, so selecting the M
                best unchecked entries is a cumsum rank-select, not a top_k
                (XLA lowers tiny-row top_k to a full sort).
    merge_2st : two-stage merge — approx_max_k over the K=256 candidates
                down to L, then exact top_k over 2L (sort of 64, not 288).
    est_i8    : codes pre-centered to int8 (one convert, no int16 hop).
    full_opt  : everything combined.

Run: python scripts/opt_hop.py
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
from alayalite_tpu.ops.topk import merge_topk_with_flags  # noqa: E402

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
codes_u8 = jnp.asarray(rng.integers(0, 256, size=(N, R, D)).astype(np.uint8))
codes_i8 = jnp.asarray(
    (rng.integers(0, 256, size=(N, R, D)) - 128).astype(np.int8))
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
    @jax.jit
    def run(codes, nids, xsq, qs, qconst, pool_d, pool_i, pool_c, ring):
        env = (codes, nids, xsq, qs, qconst)

        def f(i, carry):
            return body(i, carry, env)
        return jax.lax.fori_loop(0, ITERS, f, (pool_d, pool_i, pool_c, ring))
    return run


# ---------------------------------------------------------------- pops
def pops_topk(i, pool_d, pool_i, pool_c):
    cand = jnp.where((~pool_c) & jnp.isfinite(pool_d), pool_d, jnp.inf)
    negd, sel = jax.lax.top_k(-cand, M)
    u = jnp.take_along_axis(pool_i, sel, axis=1)
    return (u + i) % N, sel, jnp.isfinite(-negd), pool_c


def pops_rank(i, pool_d, pool_i, pool_c):
    """Pool is sorted ascending by distance → the M best unchecked entries
    are the first M where ~checked: a cumsum rank select, no sort."""
    unchecked = (~pool_c) & jnp.isfinite(pool_d) & (pool_i >= 0)
    rank = jnp.cumsum(unchecked.astype(jnp.int32), axis=1) - 1   # [B, L]
    pick = unchecked & (rank < M)
    onehot = pick[:, None, :] & (rank[:, None, :] ==
                                 jnp.arange(M, dtype=jnp.int32)[None, :, None])
    u = jnp.sum(jnp.where(onehot, pool_i[:, None, :], 0), axis=2)  # [B, M]
    act = jnp.any(onehot, axis=2)
    pool_c = pool_c | pick
    return (jnp.where(act, u, 0) + i) % N, None, act, pool_c


def body_pop_rank(i, carry, env):
    pool_d, pool_i, pool_c, ring = carry
    u, _, act, pool_c = pops_rank(i, pool_d, pool_i, pool_c)
    pool_d = pool_d + 1e-12 * u[:, :1]
    return pool_d, pool_i, pool_c, ring


# ---------------------------------------------------------------- merge
def body_merge_2st(i, carry, env):
    codes, _nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, _, act, pool_c = pops_rank(i, pool_d, pool_i, pool_c)
    est = qconst[:, None] * jnp.ones((B, K)) + i
    cand = _nids[u].reshape(B, K)
    # stage 1: approximate top-L of the K candidates (PartialReduce)
    nv, sel = jax.lax.approx_max_k(-est, L, recall_target=0.95)
    ci = jnp.take_along_axis(cand, sel, axis=1)
    # stage 2: exact merge of 2L
    pool_d, pool_i, pool_c = merge_topk_with_flags(
        pool_d, pool_i, pool_c, -nv, ci, jnp.zeros((B, L), bool), L)
    return pool_d, pool_i, pool_c, ring


def body_merge_exact64(i, carry, env):
    codes, _nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, _, act, pool_c = pops_rank(i, pool_d, pool_i, pool_c)
    est = qconst[:, None] * jnp.ones((B, K)) + i
    cand = _nids[u].reshape(B, K)
    nv, sel = jax.lax.top_k(-est, L)
    ci = jnp.take_along_axis(cand, sel, axis=1)
    pool_d, pool_i, pool_c = merge_topk_with_flags(
        pool_d, pool_i, pool_c, -nv, ci, jnp.zeros((B, L), bool), L)
    return pool_d, pool_i, pool_c, ring


# ---------------------------------------------------------------- estimate
def body_est_u8(i, carry, env):
    codes, _nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, _, act, pool_c = pops_rank(i, pool_d, pool_i, pool_c)
    c = codes[u].reshape(B, K, D)
    cf = (c.astype(jnp.int16) - 128).astype(jnp.bfloat16)
    dot = jnp.einsum("bkd,bd->bk", cf, qs, preferred_element_type=jnp.float32)
    est = qconst[:, None] - 2.0 * dot + xsq[u].reshape(B, K)
    pool_d = pool_d + 1e-12 * est[:, :1]
    return pool_d, pool_i, pool_c, ring


def body_est_i8(i, carry, env):
    codes, _nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, _, act, pool_c = pops_rank(i, pool_d, pool_i, pool_c)
    c = codes[u].reshape(B, K, D)                  # int8 pre-centered
    cf = c.astype(jnp.bfloat16)
    dot = jnp.einsum("bkd,bd->bk", cf, qs, preferred_element_type=jnp.float32)
    est = qconst[:, None] - 2.0 * dot + xsq[u].reshape(B, K)
    pool_d = pool_d + 1e-12 * est[:, :1]
    return pool_d, pool_i, pool_c, ring


def body_est_i8_dotgen(i, carry, env):
    """int8 codes fed straight to dot_general with f32 accumulation."""
    codes, _nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, _, act, pool_c = pops_rank(i, pool_d, pool_i, pool_c)
    c = codes[u].reshape(B, K, D)
    dot = jax.lax.dot_general(
        c, qs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    est = qconst[:, None] - 2.0 * dot + xsq[u].reshape(B, K)
    pool_d = pool_d + 1e-12 * est[:, :1]
    return pool_d, pool_i, pool_c, ring


# ---------------------------------------------------------------- full
def body_full_opt(i, carry, env):
    codes, _nids, xsq, qs, qconst = env
    pool_d, pool_i, pool_c, ring = carry
    u, _, act, pool_c = pops_rank(i, pool_d, pool_i, pool_c)
    c = codes[u].reshape(B, K, D)
    cf = c.astype(jnp.bfloat16)
    dot = jnp.einsum("bkd,bd->bk", cf, qs, preferred_element_type=jnp.float32)
    est = qconst[:, None] - 2.0 * dot + xsq[u].reshape(B, K)
    cand = _nids[u].reshape(B, K)
    fresh = _ring_fresh(ring, pool_i, cand)
    est = jnp.where(fresh, est, jnp.inf)
    nv, sel = jax.lax.approx_max_k(-est, L, recall_target=0.95)
    ci = jnp.take_along_axis(jnp.where(fresh, cand, -1), sel, axis=1)
    pool_d, pool_i, pool_c = merge_topk_with_flags(
        pool_d, pool_i, pool_c, -nv, ci, jnp.zeros((B, L), bool), L)
    ring = (cand[:, -RING:] if K >= RING else
            jnp.concatenate([ring[:, K:], cand], axis=1))
    return pool_d, pool_i, pool_c, ring


CASES = [
    ("pop_rank", body_pop_rank, codes_u8),
    ("merge_2st", body_merge_2st, codes_u8),
    ("merge_exact64", body_merge_exact64, codes_u8),
    ("est_u8(rankpop)", body_est_u8, codes_u8),
    ("est_i8", body_est_i8, codes_i8),
    ("est_i8_dotgen", body_est_i8_dotgen, codes_i8),
    ("full_opt", body_full_opt, codes_i8),
]

only = os.environ.get("PB_ONLY")
for name, body, codes in CASES:
    if only and only not in name:
        continue
    timeit(name, loop(body), codes, nids, xsq, qs, qconst,
           pool_d0, pool_i0, pool_c0, ring0)
