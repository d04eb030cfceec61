"""FWHT correctness — analog of the reference's tests/simd/fht_test.cpp."""

import jax.numpy as jnp
import numpy as np
import pytest

from alayalite_tpu.ops.hadamard import fht_kac_rotate, fwht


def _np_hadamard(d):
    h = np.array([[1.0]])
    while h.shape[0] < d:
        h = np.block([[h, h], [h, -h]])
    return h


@pytest.mark.parametrize("d", [2, 8, 64, 256])
def test_fwht_matches_matrix(rng, d):
    x = rng.normal(size=(5, d)).astype(np.float32)
    got = np.asarray(fwht(jnp.asarray(x), normalize=False))
    want = x @ _np_hadamard(d).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fwht_orthonormal_involution(rng):
    x = rng.normal(size=(3, 128)).astype(np.float32)
    y = fwht(fwht(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-5, atol=1e-5)


def test_fwht_rejects_non_power_of_two(rng):
    with pytest.raises(ValueError):
        fwht(jnp.zeros((2, 100)))


def test_fht_kac_preserves_norm(rng):
    x = rng.normal(size=(4, 64)).astype(np.float32)
    signs = jnp.asarray(rng.choice([-1.0, 1.0], size=(4, 64)).astype(np.float32))
    y = np.asarray(fht_kac_rotate(jnp.asarray(x), signs))
    np.testing.assert_allclose(np.linalg.norm(y, axis=1),
                               np.linalg.norm(x, axis=1), rtol=1e-4)
