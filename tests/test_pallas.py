"""Pallas distance-tile kernels vs jnp reference (interpret mode on CPU,
compiled on TPU — run with ALAYA_TEST_TPU=1) — the analog of the reference's
tests/simd kernel tier. Shapes respect Mosaic tiling (multiples of 128)."""

import jax
import jax.numpy as jnp
import numpy as np

from alayalite_tpu.ops.pallas_distance import (pairwise_l2_pallas,
                                               sq8_pairwise_pallas)

INTERP = jax.devices()[0].platform != "tpu"


def test_pairwise_l2_matches(rng):
    q = rng.normal(size=(256, 128)).astype(np.float32)
    x = rng.normal(size=(512, 128)).astype(np.float32)
    got = np.asarray(pairwise_l2_pallas(
        jnp.asarray(q), jnp.asarray(x), tq=128, tn=256, interpret=INTERP))
    want = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    tol = 2e-4 if INTERP else 3e-3  # compiled dot runs at MXU default precision
    np.testing.assert_allclose(got, want, rtol=tol, atol=1.0 * (not INTERP) + 2e-3)


def test_sq8_pairwise_matches(rng):
    from alayalite_tpu.spaces.sq import SQSpace

    dim = 128
    v = rng.normal(size=(512, dim)).astype(np.float32) * 2
    q = rng.normal(size=(256, dim)).astype(np.float32)
    sp = SQSpace.create(512, dim, bits=8).fit(v)
    got = np.asarray(sq8_pairwise_pallas(
        jnp.asarray(q), sp.codes[:512], sp.dmin, sp.scale, sp.xhat_sq[:512],
        tq=128, tn=256, interpret=INTERP))
    dec = np.asarray(sp.decode(jnp.arange(512)))
    want = ((q[:, None, :] - dec[None, :, :]) ** 2).sum(-1)
    # bf16 matmul: tolerance scaled to magnitudes
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=2.0)
