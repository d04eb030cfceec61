"""Round 2 of fused-hop kernel de-risking: layout + packing experiments.

Findings from proto_pallas_sort.py (v5e, B=4096, BT=32, lane-dim sort):
    bitonic_sort_256 2.62 ms | merge_32_32 1.61 ms | diagdot 0.213 ms
Lane-dim rolls cost ~143 ns each; 36 stages x 4 rolls kills it. Tests here:
  s_sort_sub   : sort along SUBLANES ([K, BT] layout, BT=128 lanes) — rolls
                 over sublanes are vreg permutes (cheap for d>=8)
  s_sort_pack  : single-array sort, candidate idx packed in the f32 key's
                 low mantissa bits (2 rolls/stage instead of 4)
  s_sort_sub_pack: both
  vpu_dot      : est via VPU broadcast-mul + lane reduction (no P matrix)
  ring_probe   : stale-candidate check loop in [K, BT] layout

Run: python scripts/proto_pallas_sort2.py
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
B = 256 if INTERPRET else 4096
K, L, D = 256, 32, 128
ITERS = 1 if INTERPRET else 20


def _xor_partner(x, d: int, axis: int):
    n = x.shape[axis]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    up_i = ((lane & d) == 0).astype(jnp.int32)
    fwd = pltpu.roll(x, n - d, axis=axis)
    bwd = pltpu.roll(x, d, axis=axis)
    return jnp.where(up_i == 1, fwd, bwd), up_i


def _cmpex(keys, pays, d: int, dir_i, axis: int):
    pk, up_i = _xor_partner(keys, d, axis)
    pps = [_xor_partner(p, d, axis)[0] for p in pays]
    keep_min = up_i ^ (1 - dir_i)
    lt = (pk < keys).astype(jnp.int32)
    gt = (pk > keys).astype(jnp.int32)
    swap = (keep_min * lt + (1 - keep_min) * gt) == 1
    return (jnp.where(swap, pk, keys),
            [jnp.where(swap, pp, p) for pp, p in zip(pps, pays)])


def bitonic_sort(keys, pays, axis: int, ascending: bool = True):
    n = keys.shape[axis]
    lane = jax.lax.broadcasted_iota(jnp.int32, keys.shape, axis)
    size = 2
    while size <= n:
        if size == n:
            dir_i = jnp.ones_like(lane) if ascending else jnp.zeros_like(lane)
        else:
            blk = ((lane & size) == 0).astype(jnp.int32)
            dir_i = blk if ascending else 1 - blk
        d = size // 2
        while d >= 1:
            keys, pays = _cmpex(keys, pays, d, dir_i, axis)
            d //= 2
        size *= 2
    return keys, pays


# -------------------------------------------------------------- kernels
def sort_sub_kernel(k_ref, p_ref, ko_ref, po_ref):
    ko, pos = bitonic_sort(k_ref[:], [p_ref[:]], axis=0)
    ko_ref[:] = ko
    po_ref[:] = pos[0]


def sort_sub_pack_kernel(k_ref, ko_ref):
    ko, _ = bitonic_sort(k_ref[:], [], axis=0)
    ko_ref[:] = ko


def sort_lane_pack_kernel(k_ref, ko_ref):
    ko, _ = bitonic_sort(k_ref[:], [], axis=1)
    ko_ref[:] = ko


def vpu_dot_kernel(codes_ref, q_ref, out_ref):
    """codes [BT, K, D] u8, q [BT, D] bf16 -> out [BT, K] f32 via VPU
    broadcast-mul + lane-dim reduce (no MXU, no diag extraction)."""
    cf = (codes_ref[:].astype(jnp.int32) - 128).astype(jnp.bfloat16)
    prod = cf * q_ref[:][:, None, :]
    out_ref[:] = jnp.sum(prod.astype(jnp.float32), axis=2)


def ring_probe_kernel(nids_ref, ring_ref, out_ref):
    """stale[k, b] = nids[k,b] in ring[:, b]; [K, BT] / [RING, BT] layout.
    fori over RING rows, 8 rows per step."""
    RING = ring_ref.shape[0]
    nids = nids_ref[:]

    def body(j, acc):
        for t in range(8):
            acc = acc | (nids == ring_ref[j * 8 + t, :][None, :]).astype(
                jnp.int32)
        return acc

    acc = jax.lax.fori_loop(0, RING // 8, body,
                            jnp.zeros(nids.shape, jnp.int32))
    out_ref[:] = acc


def run(name, f, *args, iters=ITERS):
    jf = jax.jit(f)
    out = jf(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    t0 = time.time()
    out = jf(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
    dt = time.time() - t0 - 0.035
    print(f"{name:22} {dt*1e3/iters:8.3f} ms", flush=True)
    return out


def pcall(kernel, out_shape, grid, in_specs, out_specs):
    return pl.pallas_call(kernel, out_shape=out_shape, grid=grid,
                          in_specs=in_specs, out_specs=out_specs,
                          interpret=INTERPRET)


def main():
    rng = np.random.default_rng(0)
    BT = 128

    # ---------- sublane sort, key + payload ----------
    keys = rng.normal(size=(K, B)).astype(np.float32)
    pay = rng.integers(0, 1 << 20, size=(K, B)).astype(np.int32)

    def loop_n(f, n):
        def g(*args):
            out = f(*args)
            for _ in range(n - 1):
                out = f(out[0] + 0.0, out[1]) if isinstance(out, tuple) \
                    else f(out + 0.0)
            return out
        return g

    f = pcall(sort_sub_kernel,
              (jax.ShapeDtypeStruct((K, B), jnp.float32),
               jax.ShapeDtypeStruct((K, B), jnp.int32)),
              (B // BT,),
              [pl.BlockSpec((K, BT), lambda i: (0, i), memory_space=pltpu.VMEM)] * 2,
              tuple(pl.BlockSpec((K, BT), lambda i: (0, i),
                                 memory_space=pltpu.VMEM) for _ in range(2)))
    ko, po = run("sort_sub(k+payload)", loop_n(f, ITERS),
                 jnp.asarray(keys), jnp.asarray(pay), iters=ITERS)
    np.testing.assert_allclose(np.asarray(ko)[:, :64],
                               np.sort(keys, axis=0)[:, :64])
    print("  sort_sub OK")

    # ---------- sublane sort, packed key ----------
    kp = rng.normal(size=(K, B)).astype(np.float32)
    kp_bits = (kp.view(np.int32) & ~np.int32(0xFF)) | np.arange(
        K, dtype=np.int32)[:, None]
    kp_packed = np.abs(kp_bits.view(np.float32))  # positive keys
    f = pcall(sort_sub_pack_kernel,
              jax.ShapeDtypeStruct((K, B), jnp.float32),
              (B // BT,),
              [pl.BlockSpec((K, BT), lambda i: (0, i), memory_space=pltpu.VMEM)],
              pl.BlockSpec((K, BT), lambda i: (0, i), memory_space=pltpu.VMEM))
    ko = run("sort_sub(packed)", loop_n(f, ITERS), jnp.asarray(kp_packed),
             iters=ITERS)
    np.testing.assert_allclose(np.asarray(ko)[:, :64],
                               np.sort(kp_packed, axis=0)[:, :64])
    print("  sort_sub_packed OK")

    # ---------- lane sort, packed key (is packing alone enough?) ----------
    f = pcall(sort_lane_pack_kernel,
              jax.ShapeDtypeStruct((B, K), jnp.float32),
              (B // BT,),
              [pl.BlockSpec((BT, K), lambda i: (i, 0), memory_space=pltpu.VMEM)],
              pl.BlockSpec((BT, K), lambda i: (i, 0), memory_space=pltpu.VMEM))
    ko = run("sort_lane(packed)", loop_n(f, ITERS),
             jnp.asarray(np.ascontiguousarray(kp_packed.T)), iters=ITERS)
    np.testing.assert_allclose(np.asarray(ko)[:64, :],
                               np.sort(kp_packed.T, axis=1)[:64, :])
    print("  sort_lane_packed OK")

    # ---------- VPU dot ----------
    BTd = 32
    codes = rng.integers(0, 256, size=(B, K, D)).astype(np.uint8)
    q = rng.normal(size=(B, D)).astype(np.float32).astype(jnp.bfloat16)
    f = pcall(vpu_dot_kernel,
              jax.ShapeDtypeStruct((B, K), jnp.float32),
              (B // BTd,),
              [pl.BlockSpec((BTd, K, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((BTd, D), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)],
              pl.BlockSpec((BTd, K), lambda i: (i, 0),
                           memory_space=pltpu.VMEM))
    out = run("vpu_dot", f, jnp.asarray(codes), jnp.asarray(q), iters=1)
    ref = np.einsum("bkd,bd->bk", codes.astype(np.int32) - 128,
                    np.asarray(q, dtype=np.float32))
    err = np.max(np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1e-3))
    print("  vpu_dot max rel err:", float(err))

    # ---------- ring probe ----------
    RING = 256
    nids = rng.integers(0, 1 << 20, size=(K, B)).astype(np.int32)
    ring = rng.integers(0, 1 << 20, size=(RING, B)).astype(np.int32)
    f = pcall(ring_probe_kernel,
              jax.ShapeDtypeStruct((K, B), jnp.int32),
              (B // BT,),
              [pl.BlockSpec((K, BT), lambda i: (0, i), memory_space=pltpu.VMEM),
               pl.BlockSpec((RING, BT), lambda i: (0, i),
                            memory_space=pltpu.VMEM)],
              pl.BlockSpec((K, BT), lambda i: (0, i), memory_space=pltpu.VMEM))
    out = run("ring_probe", loop_n(f, 1), jnp.asarray(nids),
              jnp.asarray(ring), iters=1)
    ref = (nids[:, None, :] == ring[None, :, :]).any(axis=1).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(out), ref)
    print("  ring_probe OK")


if __name__ == "__main__":
    main()
