"""SQ8/SQ4 quantizer + space correctness — analog of the reference's
tests/space/{sq8,sq4}_test.cpp tiers."""

import jax.numpy as jnp
import numpy as np
import pytest

from alayalite_tpu.spaces.sq import SQSpace


def _np_quantize(v, bits):
    lv = (1 << bits) - 1
    dmin = v.min(0)
    scale = np.maximum((v.max(0) - dmin) / lv, 1e-30)
    c = np.clip(np.round((v - dmin) / scale), 0, lv)
    return c * scale + dmin


@pytest.mark.parametrize("bits,dim", [(8, 32), (8, 33), (4, 32), (4, 33)])
def test_roundtrip_error_bound(rng, bits, dim):
    v = rng.normal(size=(100, dim)).astype(np.float32) * 3
    sp = SQSpace.create(128, dim, bits=bits).fit(v)
    dec = np.asarray(sp.decode(jnp.arange(100)))
    want = _np_quantize(v, bits)
    np.testing.assert_allclose(dec, want, rtol=1e-4, atol=1e-4)
    # max error is half a quantization step per dim
    step = (v.max(0) - v.min(0)) / ((1 << bits) - 1)
    assert (np.abs(dec - v) <= step / 2 + 1e-5).all()


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("metric", ["l2", "ip"])
def test_gather_dists_matches_decoded(rng, bits, metric):
    dim = 24
    v = rng.normal(size=(200, dim)).astype(np.float32)
    q = rng.normal(size=(5, dim)).astype(np.float32)
    sp = SQSpace.create(256, dim, bits=bits, metric=metric).fit(v)
    ids = rng.integers(0, 200, size=(5, 7)).astype(np.int32)
    got = np.asarray(sp.gather_dists(jnp.asarray(q), jnp.asarray(ids)))
    dec = np.asarray(sp.decode(jnp.arange(200)))
    for b in range(5):
        for k in range(7):
            x = dec[ids[b, k]]
            want = (((q[b] - x) ** 2).sum() if metric == "l2"
                    else -(q[b] @ x))
            assert got[b, k] == pytest.approx(want, rel=3e-2, abs=3e-2)


def test_insert_uses_fitted_params(rng):
    dim = 16
    v = rng.normal(size=(50, dim)).astype(np.float32)
    sp = SQSpace.create(64, dim, bits=8).fit(v)
    extra = rng.normal(size=(3, dim)).astype(np.float32)
    sp2, ids = sp.insert(jnp.asarray(extra))
    assert (np.asarray(ids) == [50, 51, 52]).all()
    dec = np.asarray(sp2.decode(jnp.asarray(ids)))
    step = (v.max(0) - v.min(0)) / 255
    # inserted vectors inside the fitted range decode within a step
    inside = (extra >= v.min(0)) & (extra <= v.max(0))
    assert (np.abs(dec - extra)[inside] <= step.max() + 1e-5).all()


def test_save_load_roundtrip(rng):
    v = rng.normal(size=(30, 12)).astype(np.float32)
    sp = SQSpace.create(32, 12, bits=4).fit(v)
    sp2 = SQSpace.load_arrays(sp.save_arrays())
    np.testing.assert_array_equal(np.asarray(sp.codes), np.asarray(sp2.codes))
    np.testing.assert_allclose(np.asarray(sp.xhat_sq), np.asarray(sp2.xhat_sq))
    assert int(sp2.num) == 30
