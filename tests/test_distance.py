"""Kernel correctness vs numpy reference — the analog of the reference's
tests/simd/{l2_sqr_test,ip_test}.cpp tiers."""

import numpy as np
import pytest

from alayalite_tpu.ops.distance import exact_topk, pairwise, sqnorms
from alayalite_tpu.ops.topk import merge_topk


def np_pairwise(q, x, metric):
    if metric == "l2":
        return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    if metric == "ip":
        return -(q @ x.T)
    if metric == "cos":
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        return -(qn @ xn.T)
    raise ValueError(metric)


@pytest.mark.parametrize("metric", ["l2", "ip", "cos"])
@pytest.mark.parametrize("dim", [3, 64, 128, 200])
def test_pairwise_matches_numpy(rng, metric, dim):
    q = rng.normal(size=(7, dim)).astype(np.float32)
    x = rng.normal(size=(33, dim)).astype(np.float32)
    got = np.asarray(pairwise(q, x, metric=metric))
    want = np_pairwise(q, x, metric)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sqnorms(rng):
    x = rng.normal(size=(10, 17)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(sqnorms(x)), (x ** 2).sum(1), rtol=1e-5)


@pytest.mark.parametrize("metric", ["l2", "ip", "cos"])
def test_exact_topk_matches_numpy(rng, metric):
    q = rng.normal(size=(5, 48)).astype(np.float32)
    x = rng.normal(size=(731, 48)).astype(np.float32)
    d, i = exact_topk(q, x, 10, metric=metric, tile_n=256)
    full = np_pairwise(q, x, metric)
    want_i = np.argsort(full, axis=1, kind="stable")[:, :10]
    want_d = np.take_along_axis(full, want_i, axis=1)
    np.testing.assert_allclose(d, want_d, rtol=2e-4, atol=2e-4)
    # ids may differ under ties; compare via distances
    got_d = np.take_along_axis(full, i, axis=1)
    np.testing.assert_allclose(got_d, want_d, rtol=2e-4, atol=2e-4)


def test_exact_topk_valid_mask(rng):
    q = rng.normal(size=(3, 16)).astype(np.float32)
    x = rng.normal(size=(100, 16)).astype(np.float32)
    valid = np.ones(100, dtype=bool)
    valid[::2] = False  # delete even ids
    _, i = exact_topk(q, x, 5, metric="l2", valid=valid)
    assert (i % 2 == 1).all()


def test_exact_topk_fewer_than_k(rng):
    q = rng.normal(size=(2, 8)).astype(np.float32)
    x = rng.normal(size=(3, 8)).astype(np.float32)
    d, i = exact_topk(q, x, 5, metric="l2")
    assert (i[:, 3:] == -1).all()
    assert np.isinf(d[:, 3:]).all()
    assert (i[:, :3] >= 0).all()


def test_merge_topk(rng):
    d1 = np.array([[1.0, 3.0]], dtype=np.float32)
    i1 = np.array([[10, 30]], dtype=np.int32)
    d2 = np.array([[2.0, 0.5]], dtype=np.float32)
    i2 = np.array([[20, 5]], dtype=np.int32)
    d, i = merge_topk(d1, i1, d2, i2, 3)
    np.testing.assert_allclose(np.asarray(d), [[0.5, 1.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(i), [[5, 10, 20]])
