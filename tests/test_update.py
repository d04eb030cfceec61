"""Online insert/remove semantics — analog of the reference's
python/tests/test_update.py and tests/executor/update_test.cpp."""

import numpy as np
import pytest

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

N, DIM = 900, 16


def test_insert_then_search_finds_new_vectors():
    ds = random_dataset(n=N, dim=DIM, n_queries=8, seed=3)
    idx = Index("t", IndexParams(index_type="hnsw", capacity=N + 64,
                                 max_nbrs=16, ef_construction=64))
    idx.fit(ds.data)
    rng = np.random.default_rng(0)
    new = ds.data[:16] + 0.01 * rng.normal(size=(16, DIM)).astype(np.float32)
    new_ids = idx.insert(new)
    assert (new_ids >= N).all()
    # the new vectors are their own nearest neighbors
    ids = idx.batch_search(new, 5, ef_search=64)
    hit = np.mean([new_ids[i] in ids[i] for i in range(len(new_ids))])
    assert hit >= 0.9, f"hit {hit}"


def test_insert_capacity_error():
    ds = random_dataset(n=64, dim=8, n_queries=1, seed=1)
    idx = Index("t", IndexParams(index_type="flat", capacity=64))
    idx.fit(ds.data)
    with pytest.raises(RuntimeError, match="full"):
        idx.insert(np.ones(8, dtype=np.float32))


def test_remove_excludes_from_results():
    ds = random_dataset(n=N, dim=DIM, n_queries=16, seed=7)
    idx = Index("t", IndexParams(index_type="hnsw", capacity=N,
                                 max_nbrs=16, ef_construction=64))
    idx.fit(ds.data)
    removed = list(range(0, N, 3))
    idx.remove(np.asarray(removed))
    ids = idx.batch_search(ds.queries, 10, ef_search=80)
    assert not np.isin(ids[ids >= 0], removed).any()
    # recall vs ground truth that honors the deleted set (find_exact_gt analog)
    gt = calc_gt(ds.data, ds.queries, 10, deleted=removed)
    rec = calc_recall(ids, gt)
    assert rec >= 0.8, f"recall after delete {rec}"


def test_fusion_insert_after_fit():
    """Fusion graphs have 2*max_nbrs-wide rows; insert must pad its r-wide
    search results to the row width (regression: broadcast ValueError)."""
    ds = random_dataset(n=300, dim=DIM, n_queries=4, seed=11)
    idx = Index("f", IndexParams(index_type="fusion", capacity=360,
                                 max_nbrs=12, ef_construction=48))
    idx.fit(ds.data)
    rng = np.random.default_rng(1)
    new = ds.data[:8] + 0.01 * rng.normal(size=(8, DIM)).astype(np.float32)
    new_ids = idx.insert(new)
    assert (new_ids >= 300).all()
    ids = idx.batch_search(new, 5, ef_search=48)
    hit = np.mean([new_ids[i] in ids[i] for i in range(len(new_ids))])
    assert hit >= 0.9, f"hit {hit}"


def test_bulk_insert_is_vectorized():
    """Bulk insert (128 vectors at once) completes and the index stays
    searchable — exercises the group-by reverse-candidate path."""
    ds = random_dataset(n=N, dim=DIM, n_queries=8, seed=13)
    idx = Index("b", IndexParams(index_type="hnsw", capacity=N + 128,
                                 max_nbrs=16, ef_construction=64))
    idx.fit(ds.data[:N - 128])
    new_ids = idx.insert(ds.data[N - 128:])
    assert len(new_ids) == 128 and (new_ids >= 0).all()
    ids = idx.batch_search(ds.data[N - 128:][:16], 5, ef_search=64)
    hit = np.mean([new_ids[i] in ids[i] for i in range(16)])
    assert hit >= 0.9, f"hit {hit}"
