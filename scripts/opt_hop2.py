"""Hop optimization A/B round 2: merge alternatives + pallas roll calibration.

proto_pallas_sort findings (v5e): lane-layout 4-roll bitonic sort-256 =
2.62 ms (loses to XLA's 1.98 ms top_k-288); sublane rolls 7x worse; 3D VPU
ops miscompile. diagdot (fused u8 decode+dot, BT=32) = 0.213 ms vs 1.8 ms
XLA estimate math — the one confirmed kernel win.

Here: can the MERGE get cheaper in XLA itself?
  merge_topk3    : current — top_k over [B, 288] with (d, i, c) payloads
  merge_keyval   : lax.sort_key_val (key f32, payload packed i32)
  merge_packed   : ONE jnp.sort of mantissa-packed keys + take_along_axis
  roll_cal       : pallas roll cost on [BT, 256] f32 at BT in {8, 32}

Run: python scripts/opt_hop2.py
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B, K, L = 4096, 256, 32
W = K + L
ITERS = 32
FMAX = float(np.finfo(np.float32).max)

rng = np.random.default_rng(0)
pool_d0 = jnp.asarray(np.sort(rng.normal(size=(B, L)).astype(np.float32), 1))
pool_i0 = jnp.asarray(rng.integers(0, 1 << 20, size=(B, L)).astype(np.int32))
pool_c0 = jnp.zeros((B, L), dtype=bool)
est0 = jnp.asarray(rng.normal(size=(B, K)).astype(np.float32) + 3.0)
cand0 = jnp.asarray(rng.integers(0, 1 << 20, size=(B, K)).astype(np.int32))


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def timeit(name, fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    out = fn(*args)
    sync(out)
    dt = time.time() - t0 - 0.035
    print(f"{name:18} {dt*1000/ITERS:8.3f} ms/iter", flush=True)
    return out


def loop(body):
    @jax.jit
    def run(pool_d, pool_i, pool_c, est, cand):
        def f(i, carry):
            pd, pi, pc = body(i, carry, est, cand)
            return pd, pi, pc
        return jax.lax.fori_loop(0, ITERS, f, (pool_d, pool_i, pool_c))
    return run


# --- current: top_k with three arrays ---------------------------------
def body_topk3(i, carry, est, cand):
    pd, pi, pc = carry
    d = jnp.concatenate([pd, est + i * 1e-9], axis=1)
    ids = jnp.concatenate([pi, cand], axis=1)
    c = jnp.concatenate([pc, jnp.zeros((B, K), bool)], axis=1)
    nd, sel = jax.lax.top_k(-d, L)
    return (-nd, jnp.take_along_axis(ids, sel, 1),
            jnp.take_along_axis(c, sel, 1))


# --- sort_key_val with packed payload ----------------------------------
def body_keyval(i, carry, est, cand):
    pd, pi, pc = carry
    d = jnp.concatenate([pd, est + i * 1e-9], axis=1)
    pay = jnp.concatenate([pi * 2 + pc.astype(jnp.int32), cand * 2], axis=1)
    sd, sp = jax.lax.sort_key_val(d, pay, dimension=1)
    sd, sp = sd[:, :L], sp[:, :L]
    return sd, sp >> 1, (sp & 1) == 1


# --- ONE packed sort + take_along --------------------------------------
def body_packed(i, carry, est, cand):
    pd, pi, pc = carry
    d = jnp.concatenate([pd, est + i * 1e-9], axis=1)          # [B, W]
    # keys positive: stuff slot index into the low 9 mantissa bits
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)
    idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    packed = jax.lax.bitcast_convert_type((bits & ~0x1FF) | idx, jnp.float32)
    sp = jnp.sort(packed, axis=1)[:, :L]
    sbits = jax.lax.bitcast_convert_type(sp, jnp.int32)
    sel = sbits & 0x1FF
    sd = jax.lax.bitcast_convert_type(sbits & ~0x1FF, jnp.float32)
    ids = jnp.concatenate([pi, cand], axis=1)
    c = jnp.concatenate([pc, jnp.zeros((B, K), bool)], axis=1)
    return (sd, jnp.take_along_axis(ids, sel, 1),
            jnp.take_along_axis(c, sel, 1))


for name, body in [("merge_topk3", body_topk3),
                   ("merge_keyval", body_keyval),
                   ("merge_packed", body_packed)]:
    timeit(name, loop(body), pool_d0, pool_i0, pool_c0, est0, cand0)


# --- pallas roll calibration -------------------------------------------
def roll_kernel_n(n_rolls):
    def kern(x_ref, o_ref):
        x = x_ref[:]
        acc = x
        for j in range(n_rolls):
            acc = pltpu.roll(acc, 1 + (j % 7), axis=1)
        o_ref[:] = acc
    return kern


for BT in (8, 32):
    for n_rolls in (36, 144):
        f = pl.pallas_call(
            roll_kernel_n(n_rolls),
            out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
            grid=(B // BT,),
            in_specs=[pl.BlockSpec((BT, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BT, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM))
        jf = jax.jit(f)
        out = jf(est0)
        sync(out)
        t0 = time.time()
        out = jf(est0)
        sync(out)
        dt = time.time() - t0 - 0.035
        print(f"roll BT={BT:3d} n={n_rolls:4d}: {dt*1e3:8.3f} ms "
              f"({dt*1e9/n_rolls/(B//BT):6.1f} ns/roll/tile)", flush=True)
