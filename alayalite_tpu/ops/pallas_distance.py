"""Pallas TPU kernels: fused distance tiles.

The reference's hot distance kernels are hand-written AVX512 loops
(/root/reference/include/simd/distance_l2.ipp, distance_ip.ipp,
*_sq8/_sq4 variants). The TPU equivalents are MXU tile programs; XLA already
fuses plain f32 matmul+epilogue well, so the Pallas wins are the paths XLA
does NOT fuse tightly:

  - ``pairwise_l2_pallas``: the L2 epilogue (|q|²+|x|²−2q·xᵀ, clamp) fused
    into the matmul tile — no [Q, N] f32 intermediate roundtrips to HBM.
    Norms are recomputed in-VMEM from the tiles (cheaper than streaming
    rank-1 side inputs through Mosaic's tiling constraints).
  - ``sq8_pairwise_pallas``: u8 codes stream from HBM (¼ the bytes of f32),
    decode fused into the tile via the factored identity
    q·x̂ = (q∘s)·(c−128) + q·(m+128s), one bf16 matmul against raw codes.

Both kernels run the same code in interpret mode on CPU for tests; compiled
on TPU they obey Mosaic tiling (tq, tn multiples of 128).

BENCH-ONLY: the serving/build paths do NOT call these kernels. Measured on
v5e (scripts/pallas_bench.py, DESIGN.md "Environment note"), XLA's own
matmul+approx_max_k fusion never materializes the [Q, N] distance matrix and
beats these tiles, which must write their output; the fused u8 kernel that
DID win in-loop lives in ``ops/pallas_block.py``. These are kept as the
apples-to-apples Pallas baselines for scripts/pallas_bench.py and
tests/test_pallas.py; do not wire them into the engine without re-measuring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _l2_tile_kernel(q_ref, x_ref, out_ref):
    """One [TQ, TN] distance tile: dot on the MXU + fused epilogue."""
    q = q_ref[:]
    x = x_ref[:]
    dot = jax.lax.dot_general(
        q, x,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)          # [TQ, 1]
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)          # [TN, 1]
    d = q_sq + x_sq.reshape(1, -1) - 2.0 * dot
    out_ref[:] = jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("tq", "tn", "interpret"))
def pairwise_l2_pallas(
    q: jax.Array,        # [Q, D] f32 (Q % tq == 0)
    x: jax.Array,        # [N, D] f32 (N % tn == 0)
    tq: int = 256,
    tn: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """[Q, N] squared-L2 distances, epilogue fused into the tile."""
    Q, D = q.shape
    N = x.shape[0]
    grid = (_cdiv(Q, tq), _cdiv(N, tn))
    return pl.pallas_call(
        _l2_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * N * D + 3 * Q * N,
            bytes_accessed=(Q * D + N * D + Q * N) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, x)


def _sq8_tile_kernel(q_ref, codes_ref, dmin_ref, scale_ref, out_ref):
    """SQ8 tile with decode fused: bf16 matmul of (q∘scale) against centered
    u8 codes; all per-row terms computed in-VMEM (rank-2 blocks only —
    Mosaic's tiling rules make rank-1 side inputs awkward).

    q_ref     [TQ, D] f32 raw queries
    codes_ref [TN, D] u8  quantization codes (¼ the f32 bytes off HBM)
    dmin_ref  [1, D]  f32 per-dim minimum
    scale_ref [1, D]  f32 per-dim step
    out: d = |q|² − 2·q·x̂ + |x̂|²,  q·x̂ = (q∘s)·(c−128) + q·(m+128s)
    """
    q = q_ref[:]
    dmin = dmin_ref[:]
    scale = scale_ref[:]
    # u8 -> bf16 is exact for 0..255; centering in float avoids an int16
    # intermediate that crashes the Mosaic compiler
    # Mosaic lacks direct u8->float casts; hop through int32
    cf = (codes_ref[:].astype(jnp.int32).astype(jnp.float32)
          - 128.0).astype(jnp.bfloat16)
    qs = (q * scale).astype(jnp.bfloat16)
    dot = jax.lax.dot_general(
        qs, cf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    shift = dmin + 128.0 * scale                            # [1, D]
    qconst = jnp.sum(q * q - 2.0 * q * shift, axis=1,
                     keepdims=True)                         # [TQ, 1]
    xhat = cf.astype(jnp.float32) * scale + shift           # [TN, D]
    xsq = jnp.sum(xhat * xhat, axis=1, keepdims=True)       # [TN, 1]
    d = qconst - 2.0 * dot + xsq.reshape(1, -1)
    out_ref[:] = jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("tq", "tn", "interpret"))
def sq8_pairwise_pallas(
    q: jax.Array,        # [Q, D] f32 raw queries
    codes: jax.Array,    # [N, D] u8
    dmin: jax.Array,     # [D]
    scale: jax.Array,    # [D]
    xhat_sq: jax.Array,  # [N]
    tq: int = 256,
    tn: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """[Q, N] asymmetric L2² against SQ8 codes with fused decode."""
    Q, D = q.shape
    N = codes.shape[0]
    del xhat_sq  # recomputed in-kernel from the decoded tile
    grid = (_cdiv(Q, tq), _cdiv(N, tn))
    return pl.pallas_call(
        _sq8_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * N * D + 3 * Q * N,
            bytes_accessed=Q * D * 4 + N * D + Q * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, codes, dmin.reshape(1, D), scale.reshape(1, D))
