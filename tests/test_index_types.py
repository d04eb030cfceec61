"""Index-type matrix: fit + search recall floors per builder/quantization —
the analog of the reference's python/tests/test_index_types.py."""

import numpy as np
import pytest

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_recall

N, DIM, NQ, K = 1200, 16, 32, 10


@pytest.fixture(scope="module")
def ds():
    return random_dataset(n=N, dim=DIM, n_queries=NQ, seed=21, topk=K)


def _fit_and_recall(ds, **kwargs):
    idx = Index("t", IndexParams(capacity=N, **kwargs))
    idx.fit(ds.data)
    ids = idx.batch_search(ds.queries, K, ef_search=80)
    return idx, calc_recall(ids, ds.gt)


def test_flat_exact(ds):
    idx, rec = _fit_and_recall(ds, index_type="flat")
    assert rec == 1.0


@pytest.mark.parametrize("index_type", ["hnsw", "nsg", "fusion"])
def test_graph_types(ds, index_type):
    idx, rec = _fit_and_recall(ds, index_type=index_type, max_nbrs=16,
                               ef_construction=64)
    assert rec >= 0.85, f"{index_type} recall {rec}"


@pytest.mark.parametrize("quant", ["sq8", "sq4"])
def test_quantized_search(ds, quant):
    idx, rec = _fit_and_recall(ds, index_type="hnsw", max_nbrs=16,
                               ef_construction=64, quantization_type=quant)
    floor = 0.85 if quant == "sq8" else 0.7
    assert rec >= floor, f"{quant} recall {rec}"


@pytest.mark.parametrize("metric", ["ip", "cos"])
def test_metrics(metric):
    ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=5, topk=K,
                        metric=metric)
    idx, rec = _fit_and_recall(ds, index_type="hnsw", max_nbrs=16,
                               ef_construction=64, metric=metric)
    assert rec >= 0.8, f"{metric} recall {rec}"


def test_single_search_and_get_data(ds):
    idx = Index("t", IndexParams(index_type="flat", capacity=N))
    idx.fit(ds.data)
    ids = idx.search(ds.queries[0], 5, ef_search=10)
    assert ids.shape == (5,)
    v = idx.get_data_by_id(int(ids[0]))
    np.testing.assert_allclose(v, ds.data[int(ids[0])], rtol=1e-6)


def test_device_resident_queries(ds):
    """jax.Array queries flow through with zero host copies (on-chip
    embed→search pipelines)."""
    import jax.numpy as jnp

    idx = Index("t", IndexParams(index_type="hnsw", capacity=N, max_nbrs=16,
                                 ef_construction=64))
    idx.fit(ds.data)
    host_ids = idx.batch_search(ds.queries, K, ef_search=80)
    dev_ids = idx.batch_search(jnp.asarray(ds.queries), K, ef_search=80)
    np.testing.assert_array_equal(host_ids, dev_ids)

    fl = Index("f", IndexParams(index_type="flat", capacity=N))
    fl.fit(ds.data)
    a = fl.batch_search(ds.queries, K, ef_search=K)
    b = fl.batch_search(jnp.asarray(ds.queries), K, ef_search=K)
    np.testing.assert_array_equal(a, b)
