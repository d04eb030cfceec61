"""Pallas distance-tile kernels vs jnp reference (interpret mode on CPU,
compiled on TPU) — the analog of the reference's tests/simd kernel tier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alayalite_tpu.ops.pallas_distance import (pairwise_l2_pallas,
                                               sq8_pairwise_pallas)

INTERP = jax.devices()[0].platform != "tpu"


def test_pairwise_l2_matches(rng):
    q = rng.normal(size=(16, 128)).astype(np.float32)
    x = rng.normal(size=(32, 128)).astype(np.float32)
    got = np.asarray(pairwise_l2_pallas(
        jnp.asarray(q), jnp.asarray(x),
        jnp.asarray((q * q).sum(1)), jnp.asarray((x * x).sum(1)),
        tq=8, tn=16, interpret=INTERP))
    want = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sq8_pairwise_matches(rng):
    from alayalite_tpu.spaces.sq import SQSpace

    dim = 64
    v = rng.normal(size=(48, dim)).astype(np.float32) * 2
    q = rng.normal(size=(16, dim)).astype(np.float32)
    sp = SQSpace.create(48, dim, bits=8).fit(v)
    got = np.asarray(sq8_pairwise_pallas(
        jnp.asarray(q), sp.codes[:48], sp.dmin, sp.scale, sp.xhat_sq[:48],
        tq=8, tn=16, interpret=INTERP))
    dec = np.asarray(sp.decode(jnp.arange(48)))
    want = ((q[:, None, :] - dec[None, :, :]) ** 2).sum(-1)
    # bf16 matmul: tolerance scaled to magnitudes
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-1)
