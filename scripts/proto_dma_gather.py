"""Prototype: fold the per-hop neighbor-block gather INTO the Pallas
estimate kernel via manual HBM->VMEM DMAs (scalar-prefetched node ids).

Current hop (index/search.py + ops/pallas_block.py): XLA gathers
codes[u] -> [B, M*R, D] u8 through HBM (materialized), then the diagdot
kernel re-reads it. This kernel DMAs each popped node's 4 KB code block
straight into VMEM scratch and computes the decode+dot there — one HBM
pass instead of two, and the gather rides the DMA engines.

A/B on real TPU:   python scripts/proto_dma_gather.py
Correctness (CPU): ALAYA_INTERP=1 python scripts/proto_dma_gather.py
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

    def start(i, _):
        nid = u_ref[t * BTM + i]
        pltpu.make_async_copy(codes_ref.at[nid], scratch.at[i],
                              sems.at[i]).start()
        return 0

    jax.lax.fori_loop(0, BTM, start, 0)

    def wait(i, _):
        nid = u_ref[t * BTM + i]
        pltpu.make_async_copy(codes_ref.at[nid], scratch.at[i],
                              sems.at[i]).wait()
        return 0

    jax.lax.fori_loop(0, BTM, wait, 0)

    c = scratch[:].reshape(BTM * R, D)
    cf = (c.astype(jnp.int32) - 128).astype(jnp.bfloat16)
    p = jnp.dot(cf, qs_ref[:].T, preferred_element_type=jnp.float32)
    p = p.reshape(BT, K, BT)
    row = jax.lax.broadcasted_iota(jnp.int32, (BT, K, BT), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (BT, K, BT), 2)
    out_ref[:] = jnp.sum(jnp.where(row == col, p, 0.0), axis=2)


@functools.partial(jax.jit, static_argnames=())
def dma_diagdot(codes, u, qs):
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
            pltpu.VMEM((BTM, R, D), jnp.uint8),
            pltpu.SemaphoreType.DMA((BTM,)),
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

a = np.asarray(dma_diagdot(codes, u, qs))
b = np.asarray(xla_diagdot(codes, u, qs))
err = np.max(np.abs(a - b) / (1 + np.abs(b)))
print(f"max rel err: {err:.2e}", flush=True)
assert err < 1e-2, "MISMATCH"

if not INTERP:
    def sync(x):
        np.asarray(x).ravel()[:1]

    @jax.jit
    def loop_dma(codes, u, qs):
        def f(i, acc):
            return acc + dma_diagdot(codes, (u + i) % N, qs)[0, 0]
        return jax.lax.fori_loop(0, ITERS, f, jnp.float32(0.0))

    @jax.jit
    def loop_xla(codes, u, qs):
        def f(i, acc):
            return acc + xla_diagdot(codes, (u + i) % N, qs)[0, 0]
        return jax.lax.fori_loop(0, ITERS, f, jnp.float32(0.0))

    for name, fn in [("xla gather+kernel", loop_xla), ("dma kernel", loop_dma)]:
        sync(fn(codes, u, qs))
        t0 = time.time()
        sync(fn(codes, u, qs))
        dt = time.time() - t0 - 0.035
        print(f"{name:20} {dt*1000/ITERS:8.3f} ms/hop", flush=True)
