"""Pallas TPU kernels: fused distance tiles.

The reference's hot distance kernels are hand-written AVX512 loops
(/root/reference/include/simd/distance_l2.ipp, distance_ip.ipp,
*_sq8/_sq4 variants). The TPU equivalents are MXU tile programs; XLA already
fuses plain f32 matmul+epilogue well, so the Pallas wins are the paths XLA
does NOT fuse tightly:

  - ``pairwise_l2_pallas``: the L2 epilogue (|q|²+|x|²−2q·xᵀ, clamp) fused
    into the matmul tile — no [Q, N] f32 intermediate roundtrips to HBM.
  - ``sq8_pairwise_pallas``: u8 codes stream from HBM (¼ the bytes of f32),
    decode (c·s+m) fused into the tile via the factored identity
    q·x̂ = (q∘s)·c + q·m, i.e. one bf16 matmul against the raw codes plus a
    per-query constant — the SQ8 asymmetric-distance kernel, MXU edition.

Both kernels run the same code in interpret mode on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _l2_tile_kernel(q_ref, x_ref, qsq_ref, xsq_ref, out_ref):
    """One [TQ, TN] distance tile: dot on the MXU + fused epilogue."""
    dot = jax.lax.dot_general(
        q_ref[:], x_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = qsq_ref[:].reshape(-1, 1) + xsq_ref[:].reshape(1, -1) - 2.0 * dot
    out_ref[:] = jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("tq", "tn", "interpret"))
def pairwise_l2_pallas(
    q: jax.Array,        # [Q, D] f32 (Q % tq == 0)
    x: jax.Array,        # [N, D] f32 (N % tn == 0)
    q_sq: jax.Array,     # [Q]
    x_sq: jax.Array,     # [N]
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
            pl.BlockSpec((tq,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda i, j: (j,), memory_space=pltpu.VMEM),
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
    )(q, x, q_sq, x_sq)


def _sq8_tile_kernel(qs_ref, codes_ref, qconst_ref, xsq_ref, out_ref):
    """SQ8 tile: bf16 matmul of (q∘scale) against raw u8 codes, decode fused.

    qs_ref    [TQ, D]  bf16 — query ∘ per-dim scale
    codes_ref [TN, D]  u8   — quantization codes (stream ¼ the f32 bytes)
    qconst_ref[TQ]     f32  — |q|² + q·dmin-fold: |q|² − 2·(q·m) is folded
                              by the caller into one per-query constant
    xsq_ref   [TN]     f32  — |x̂|² (precomputed at encode)
    out: d = qconst − 2·(q∘s)·c + |x̂|²
    """
    cf = (codes_ref[:].astype(jnp.int16) - 128).astype(jnp.bfloat16)
    dot = jax.lax.dot_general(
        qs_ref[:], cf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = (qconst_ref[:].reshape(-1, 1) - 2.0 * dot
         + xsq_ref[:].reshape(1, -1))
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
    qs = (q * scale[None, :]).astype(jnp.bfloat16)
    shift = dmin[None, :] + 128.0 * scale[None, :]  # codes centered at 128
    qconst = (jnp.sum(q * q, axis=-1)
              - 2.0 * jnp.sum(q * shift, axis=-1))   # [Q]
    grid = (_cdiv(Q, tq), _cdiv(N, tn))
    return pl.pallas_call(
        _sq8_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq,), lambda i, j: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda i, j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * N * D + 3 * Q * N,
            bytes_accessed=Q * D * 2 + N * D + Q * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qs, codes, qconst, xhat_sq)
