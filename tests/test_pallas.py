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


def test_block_diagdot_interpret_matches_xla():
    """Fused decode+dot kernel == XLA einsum fallback (same bf16 math)."""
    import os

    import jax.numpy as jnp

    from alayalite_tpu.ops.pallas_block import block_diagdot

    rng = np.random.default_rng(3)
    codes = jnp.asarray(rng.integers(0, 256, size=(32, 16, 128)),
                        dtype=jnp.uint8)
    qs = jnp.asarray(rng.normal(size=(32, 128)), dtype=jnp.float32)
    old = os.environ.get("ALAYA_PALLAS")
    try:
        os.environ["ALAYA_PALLAS"] = "1"   # interpret-mode kernel on CPU
        a = np.asarray(block_diagdot(codes, qs))
        os.environ["ALAYA_PALLAS"] = "0"   # XLA fallback
        b = np.asarray(block_diagdot(codes, qs))
    finally:
        if old is None:
            os.environ.pop("ALAYA_PALLAS", None)
        else:
            os.environ["ALAYA_PALLAS"] = old
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2.0)


def test_bqg_estimate_many_matches_estimate_for():
    """estimate_many == vmapped estimate_for (the hop body's two paths)."""
    import jax
    import jax.numpy as jnp

    from alayalite_tpu.spaces.bqg import BQGSpace

    rng = np.random.default_rng(4)
    data = rng.normal(size=(200, 32)).astype(np.float32)
    sp = BQGSpace.create(200, 32, degree=8).fit(data)
    nbrs = rng.integers(0, 200, size=(200, 8)).astype(np.int32)
    sp = sp.update_neighbors(nbrs)
    q = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    ctx = sp.query_ctx(q)
    u = jnp.asarray(rng.integers(0, 200, size=(16, 4)).astype(np.int32))
    est_m, ids_m = sp.estimate_many(ctx, u)
    est_v, ids_v = jax.vmap(sp.estimate_for, in_axes=(None, 1),
                            out_axes=1)(ctx, u)
    np.testing.assert_array_equal(np.asarray(ids_m),
                                  np.asarray(ids_v).reshape(16, -1))
    np.testing.assert_allclose(np.asarray(est_m),
                               np.asarray(est_v).reshape(16, -1),
                               rtol=1e-5, atol=1e-3)
