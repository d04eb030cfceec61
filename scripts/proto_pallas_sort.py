"""Prototype: bitonic sort + merge + MXU diag-dot inside one Pallas kernel.

De-risks the fused-hop kernel (ops/pallas_block.py) before building it:
  1. XOR-partner compare-exchange via two pltpu.rolls per stage
  2. full bitonic sort of [BT, K=256] keys with an i32 payload
  3. sorted-merge of two sorted-L lists (reverse + bitonic merge)
  4. MXU dot with block-diagonal extraction: per-query codes x own query

Run CPU-interpret:  JAX_PLATFORMS=cpu python scripts/proto_pallas_sort.py
Run TPU:            python scripts/proto_pallas_sort.py
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

INTERPRET = jax.default_backend() == "cpu"
FINF = float("inf")


def _xor_partner(x, d: int):
    """Value of each lane's XOR-d partner along the last axis (len power of 2,
    d a power of 2 < len): lanes with bit d clear read lane i+d, lanes with
    bit d set read lane i-d. Both are the same circular roll read."""
    n = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    up_i = ((lane & d) == 0).astype(jnp.int32)
    fwd = pltpu.roll(x, n - d, axis=len(x.shape) - 1)   # x[(i+d) % n]
    bwd = pltpu.roll(x, d, axis=len(x.shape) - 1)       # x[(i-d) % n]
    return jnp.where(up_i == 1, fwd, bwd), up_i


def _cmpex(keys, pay, d: int, dir_i):
    """One bitonic compare-exchange stage: each element keeps min or max of
    (self, partner) depending on sort direction and which side it's on.
    dir_i: int32 0/1 array broadcastable to keys — 1 where ascending.
    All mask algebra stays in int32: Mosaic cannot lower i8->i1 truncations
    that bool-tensor select/xor chains produce."""
    pk, up_i = _xor_partner(keys, d)
    pp, _ = _xor_partner(pay, d)
    # ascending block: lower lane keeps min; descending: lower keeps max
    keep_min = up_i ^ (1 - dir_i)
    lt = (pk < keys).astype(jnp.int32)
    gt = (pk > keys).astype(jnp.int32)
    swap = (keep_min * lt + (1 - keep_min) * gt) == 1
    return (jnp.where(swap, pk, keys), jnp.where(swap, pp, pay))


def bitonic_sort(keys, pay, ascending: bool = True):
    """Full bitonic sort along the last axis (power-of-2 length)."""
    n = keys.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, len(keys.shape) - 1)
    size = 2
    while size <= n:
        if size == n:
            dir_i = jnp.ones_like(lane) if ascending else jnp.zeros_like(lane)
        else:
            blk = ((lane & size) == 0).astype(jnp.int32)
            dir_i = blk if ascending else 1 - blk
        d = size // 2
        while d >= 1:
            keys, pay = _cmpex(keys, pay, d, dir_i)
            d //= 2
        size *= 2
    return keys, pay


def _reverse_lanes(x):
    """Reverse along the last axis without lax.rev (unsupported in Mosaic):
    i -> i ^ (n-1), as a cascade of XOR-partner half-swaps."""
    d = x.shape[-1] // 2
    while d >= 1:
        x, _ = _xor_partner(x, d)
        d //= 2
    return x


def merge_sorted(kd_a, pi_a, kd_b, pi_b):
    """Merge two ascending sorted-L lists into ascending sorted-2L
    (classic bitonic merge: reverse B, concat, then merge network).
    In the fused kernel the candidate list is produced descending instead,
    skipping the reversal."""
    L = kd_a.shape[-1]
    kd = jnp.concatenate([kd_a, _reverse_lanes(kd_b)], axis=-1)
    pi = jnp.concatenate([pi_a, _reverse_lanes(pi_b)], axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, kd.shape, len(kd.shape) - 1)
    dir_i = jnp.ones_like(lane)
    d = L
    while d >= 1:
        kd, pi = _cmpex(kd, pi, d, dir_i)
        d //= 2
    return kd, pi


# ------------------------------------------------------------------ kernels
def sort_kernel(k_ref, p_ref, ko_ref, po_ref):
    ko, po = bitonic_sort(k_ref[:], p_ref[:])
    ko_ref[:] = ko
    po_ref[:] = po


def merge_kernel(ka_ref, pa_ref, kb_ref, pb_ref, ko_ref, po_ref):
    ko, po = merge_sorted(ka_ref[:], pa_ref[:], kb_ref[:], pb_ref[:])
    ko_ref[:] = ko
    po_ref[:] = po


def diagdot_kernel(codes_ref, q_ref, out_ref):
    """codes [BT, K, D] u8, q [BT, D] bf16 -> out [BT, K] f32 where
    out[b, k] = sum_d (codes[b,k,d]-128) * q[b,d]."""
    BT, K, D = codes_ref.shape
    c = codes_ref[:].reshape(BT * K, D)
    cf = (c.astype(jnp.int32) - 128).astype(jnp.bfloat16)
    p = jnp.dot(cf, q_ref[:].T, preferred_element_type=jnp.float32)  # [BT*K, BT]
    p = p.reshape(BT, K, BT)
    b_ids = jax.lax.broadcasted_iota(jnp.int32, (BT, K, BT), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BT, K, BT), 2)
    out_ref[:] = jnp.sum(jnp.where(b_ids == col, p, 0.0), axis=2)


def run(name, kernel, out_shape, *args, grid_bt=None, iters=1):
    n_in = len(args)
    if grid_bt is None:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                            for _ in out_shape) if isinstance(out_shape, tuple)
            else pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )
    else:
        B = args[0].shape[0]
        bspec = lambda a: pl.BlockSpec((grid_bt,) + a.shape[1:],
                                       lambda i: (i,) + (0,) * (a.ndim - 1),
                                       memory_space=pltpu.VMEM)
        outs = out_shape if isinstance(out_shape, tuple) else (out_shape,)
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=(B // grid_bt,),
            in_specs=[bspec(a) for a in args],
            out_specs=tuple(
                pl.BlockSpec((grid_bt,) + o.shape[1:],
                             lambda i: (i,) + (0,) * (len(o.shape) - 1),
                             memory_space=pltpu.VMEM) for o in outs)
            if isinstance(out_shape, tuple) else
            pl.BlockSpec((grid_bt,) + out_shape.shape[1:],
                         lambda i: (i,) + (0,) * (len(out_shape.shape) - 1),
                         memory_space=pltpu.VMEM),
            interpret=INTERPRET,
        )
    jf = jax.jit(f)
    out = jf(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[:1]), out)
    t0 = time.time()
    for _ in range(iters):
        out = jf(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[:1]), out)
    dt = (time.time() - t0 - 0.035) / iters
    print(f"{name:20} {dt*1e3:8.3f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    B, K, L, D = (256, 256, 32, 128) if INTERPRET else (4096, 256, 32, 128)
    BT = 32
    iters = 1 if INTERPRET else 20

    # --- sort correctness + speed
    keys = rng.normal(size=(B, K)).astype(np.float32)
    pay = rng.integers(0, 1 << 20, size=(B, K)).astype(np.int32)
    ko, po = run("bitonic_sort_256", sort_kernel,
                 (jax.ShapeDtypeStruct((B, K), jnp.float32),
                  jax.ShapeDtypeStruct((B, K), jnp.int32)),
                 jnp.asarray(keys), jnp.asarray(pay), grid_bt=BT, iters=iters)
    ref = np.sort(keys, axis=1)
    np.testing.assert_allclose(np.asarray(ko), ref, rtol=0, atol=0)
    order = np.argsort(keys, axis=1, kind="stable")
    np.testing.assert_array_equal(
        np.sort(np.asarray(po), axis=1),
        np.sort(np.take_along_axis(pay, order, axis=1), axis=1))
    print("sort OK")

    # --- merge correctness + speed
    ka = np.sort(rng.normal(size=(B, L)).astype(np.float32), axis=1)
    kb = np.sort(rng.normal(size=(B, L)).astype(np.float32), axis=1)
    pa = rng.integers(0, 1 << 20, size=(B, L)).astype(np.int32)
    pb = rng.integers(0, 1 << 20, size=(B, L)).astype(np.int32)
    km, pm = run("merge_32_32", merge_kernel,
                 (jax.ShapeDtypeStruct((B, 2 * L), jnp.float32),
                  jax.ShapeDtypeStruct((B, 2 * L), jnp.int32)),
                 jnp.asarray(ka), jnp.asarray(pa), jnp.asarray(kb),
                 jnp.asarray(pb), grid_bt=BT, iters=iters)
    np.testing.assert_allclose(np.asarray(km),
                               np.sort(np.concatenate([ka, kb], 1), axis=1))
    print("merge OK")

    # --- MXU diag dot
    codes = rng.integers(0, 256, size=(B, K, D)).astype(np.uint8)
    q = rng.normal(size=(B, D)).astype(np.float32).astype(jnp.bfloat16)
    out = run("diagdot", diagdot_kernel,
              jax.ShapeDtypeStruct((B, K), jnp.float32),
              jnp.asarray(codes), jnp.asarray(q), grid_bt=BT, iters=iters)
    ref = np.einsum("bkd,bd->bk",
                    (codes.astype(np.int32) - 128).astype(np.float32),
                    np.asarray(q, dtype=np.float32).astype(np.float32))
    err = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-3)
    print("diagdot max rel err:", float(err.max()))
    assert float(err.max()) < 0.05
    print("diagdot OK")


if __name__ == "__main__":
    main()
