"""Prototype 2: DOUBLE-BUFFERED DMA-gather estimate kernel.

proto_dma_gather.py (negative result, DESIGN.md) issued all of a tile's
per-node HBM->VMEM copies, waited, then computed — the grid step
serialized DMA issue/wait against the MXU work. This variant ping-pongs
two VMEM scratch buffers: while tile t computes from buffer t%2, tile
t+1's 256 node blocks are already in flight into buffer (t+1)%2, so the
DMA issue cost hides under the previous tile's decode+dot.

A/B on real TPU:   python scripts/proto_dma_gather2.py
Correctness (CPU): ALAYA_INTERP=1 python scripts/proto_dma_gather2.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alayalite_tpu.utils.platforms import enable_compile_cache  # noqa: E402

if os.environ.get("ALAYA_INTERP") == "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B = int(os.environ.get("PD_B", "4096"))
N = int(os.environ.get("PD_N", "100000"))
D = int(os.environ.get("PD_D", "128"))
R = int(os.environ.get("PD_R", "32"))
M = int(os.environ.get("PD_M", "8"))
BT = int(os.environ.get("PD_BT", "32"))
ITERS = int(os.environ.get("PD_ITERS", "32"))
INTERP = os.environ.get("ALAYA_INTERP") == "1"
BTM = BT * M
K = M * R


def kernel(u_ref, qs_ref, codes_ref, out_ref, scratch, sems):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def issue(base, buf):
        # one counting DMA semaphore per buffer: 2*BTM per-block semaphores
        # overflow the 2 KB sflag space (measured: "Used 2.1K of 2.0K")
        def start(i, _):
            nid = u_ref[base + i]
            pltpu.make_async_copy(codes_ref.at[nid], scratch.at[buf, i],
                                  sems.at[buf]).start()
            return 0
        jax.lax.fori_loop(0, BTM, start, 0)

    @pl.when(t == 0)
    def _():
        issue(0, 0)

    @pl.when(t + 1 < nt)
    def _():
        # overlap: tile t+1's blocks stream in while tile t computes
        @pl.when(nxt == 0)
        def _():
            issue((t + 1) * BTM, 0)

        @pl.when(nxt == 1)
        def _():
            issue((t + 1) * BTM, 1)

    def wait_buf(buf):
        def wait(i, _):
            nid = u_ref[t * BTM + i]
            pltpu.make_async_copy(codes_ref.at[nid], scratch.at[buf, i],
                                  sems.at[buf]).wait()
            return 0
        jax.lax.fori_loop(0, BTM, wait, 0)

    def compute(buf):
        c = scratch[buf].reshape(BTM * R, D)
        cf = (c.astype(jnp.int32) - 128).astype(jnp.bfloat16)
        p = jnp.dot(cf, qs_ref[:].T, preferred_element_type=jnp.float32)
        p = p.reshape(BT, K, BT)
        row = jax.lax.broadcasted_iota(jnp.int32, (BT, K, BT), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (BT, K, BT), 2)
        out_ref[:] = jnp.sum(jnp.where(row == col, p, 0.0), axis=2)

    @pl.when(slot == 0)
    def _():
        wait_buf(0)
        compute(0)

    @pl.when(slot == 1)
    def _():
        wait_buf(1)
        compute(1)


@functools.partial(jax.jit, static_argnames=())
def dma2_diagdot(codes, u, qs):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, D), lambda t, u: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BT, K), lambda t, u: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, BTM, R, D), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.float32),
        grid_spec=grid_spec,
        interpret=INTERP,
    )(u.reshape(-1), qs.astype(jnp.bfloat16), codes)


@jax.jit
def xla_diagdot(codes, u, qs):
    from alayalite_tpu.ops.pallas_block import block_diagdot

    g = codes[u].reshape(B, K, D)
    return block_diagdot(g, qs)


rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 256, size=(N, R, D)).astype(np.uint8))
u = jnp.asarray(rng.integers(0, N, size=(B, M)).astype(np.int32))
qs = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

t0 = time.time()
a = np.asarray(dma2_diagdot(codes, u, qs))
print(f"dma2 compile+run {time.time()-t0:.1f}s", flush=True)
b = np.asarray(xla_diagdot(codes, u, qs))
err = np.max(np.abs(a - b) / (1 + np.abs(b)))
print(f"max rel err: {err:.2e}", flush=True)
assert err < 1e-2, "MISMATCH"

if not INTERP:
    def sync(x):
        np.asarray(x).ravel()[:1]

    @jax.jit
    def loop_dma2(codes, u, qs):
        def f(i, acc):
            return acc + dma2_diagdot(codes, (u + i) % N, qs)[0, 0]
        return jax.lax.fori_loop(0, ITERS, f, jnp.float32(0.0))

    @jax.jit
    def loop_xla(codes, u, qs):
        def f(i, acc):
            return acc + xla_diagdot(codes, (u + i) % N, qs)[0, 0]
        return jax.lax.fori_loop(0, ITERS, f, jnp.float32(0.0))

    for name, fn in [("xla gather+kernel", loop_xla), ("dma2 dbl-buf", loop_dma2)]:
        sync(fn(codes, u, qs))
        t0 = time.time()
        sync(fn(codes, u, qs))
        dt = time.time() - t0 - 0.035
        print(f"{name:20} {dt*1000/ITERS:8.3f} ms/hop", flush=True)
