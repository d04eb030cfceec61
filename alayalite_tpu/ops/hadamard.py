"""Fast Walsh–Hadamard transform — the package's single FWHT implementation.

Parity slot for the reference's FHT kernels
(/root/reference/include/simd/fht.hpp:25-53 + fht.ipp — 3.9k LoC of AVX
unrolls for dims 2^6..2^11, used by the RaBitQ FhtKac rotator). On TPU the
butterfly runs as log2(D) vectorized passes; for D ≤ 2048 a dense
orthonormal-matrix rotation is a single MXU matmul and is usually faster, so
``spaces/rabitq.py`` materializes the FhtKac transform as a matrix via
``fwht_np`` here (one butterfly implementation serves both the in-jit ``fwht``
and the host-side rotator materialization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _butterfly(x, xp):
    """In-register FWHT butterfly over the last axis; ``xp`` is numpy or
    jax.numpy. Input must already be [..., D] with power-of-two D."""
    d = x.shape[-1]
    lead = x.shape[:-1]
    x = x.reshape(-1, d)
    h = 1
    while h < d:
        x = x.reshape(-1, d // (2 * h), 2, h)
        a = x[:, :, 0, :]
        b = x[:, :, 1, :]
        x = xp.stack([a + b, a - b], axis=2)
        h *= 2
    return x.reshape(*lead, d)


def _check_pow2(d: int) -> None:
    if d & (d - 1):
        raise ValueError(f"fwht length must be a power of two, got {d}")


@functools.partial(jax.jit, static_argnames=("normalize",))
def fwht(x: jax.Array, normalize: bool = True) -> jax.Array:
    """Walsh–Hadamard transform along the last axis (power-of-two length).

    ``normalize=True`` scales by 1/sqrt(D), making the transform orthonormal
    (H·H = I), matching the rotator use."""
    _check_pow2(x.shape[-1])
    x = _butterfly(x.astype(jnp.float32), jnp)
    if normalize:
        x = x / jnp.sqrt(jnp.float32(x.shape[-1]))
    return x


def fwht_np(x: np.ndarray, normalize: bool = True) -> np.ndarray:
    """Host-side FWHT (same butterfly), preserving dtype — used to
    materialize the FhtKac rotation matrix at space-construction time
    without touching the JAX backend."""
    _check_pow2(x.shape[-1])
    y = _butterfly(np.asarray(x), np)
    if normalize:
        y = y / np.sqrt(x.shape[-1]).astype(y.dtype)
    return y


def fht_kac_rotate(x: jax.Array, signs: jax.Array, rounds: int = 4) -> jax.Array:
    """FhtKac-style rotation: ``rounds`` of random sign flips + FWHT
    (reference: utils/rabitq_utils/rotator.hpp:127-166). ``signs`` is
    [rounds, D] of ±1."""
    for r in range(rounds):
        x = fwht(x * signs[r])
    return x
