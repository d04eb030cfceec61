"""Fast Walsh–Hadamard transform.

Parity slot for the reference's FHT kernels
(/root/reference/include/simd/fht.hpp:25-53 + fht.ipp — 3.9k LoC of AVX
unrolls for dims 2^6..2^11, used by the RaBitQ FhtKac rotator). On TPU the
butterfly runs as log2(D) vectorized passes; note that for D ≤ 2048 a dense
orthonormal-matrix rotation is a single MXU matmul and is usually faster, so
the RaBitQ space defaults to that (spaces/rabitq.py) — this op exists for
O(D log D) rotation at very large D and for the FhtKac rotator variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("normalize",))
def fwht(x: jax.Array, normalize: bool = True) -> jax.Array:
    """Walsh–Hadamard transform along the last axis (power-of-two length).

    ``normalize=True`` scales by 1/sqrt(D), making the transform orthonormal
    (H·H = I), matching the rotator use."""
    d = x.shape[-1]
    if d & (d - 1):
        raise ValueError(f"fwht length must be a power of two, got {d}")
    orig_shape = x.shape
    x = x.reshape(-1, d).astype(jnp.float32)
    h = 1
    while h < d:
        x = x.reshape(-1, d // (2 * h), 2, h)
        a = x[:, :, 0, :]
        b = x[:, :, 1, :]
        x = jnp.stack([a + b, a - b], axis=2)
        h *= 2
    x = x.reshape(*orig_shape)
    if normalize:
        x = x / jnp.sqrt(jnp.float32(d))
    return x


def fht_kac_rotate(x: jax.Array, signs: jax.Array, rounds: int = 4) -> jax.Array:
    """FhtKac-style rotation: ``rounds`` of random sign flips + FWHT
    (reference: utils/rabitq_utils/rotator.hpp:127-166). ``signs`` is
    [rounds, D] of ±1."""
    for r in range(rounds):
        x = fwht(x * signs[r])
    return x
