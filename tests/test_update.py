"""Online insert/remove semantics — analog of the reference's
python/tests/test_update.py and tests/executor/update_test.cpp."""

import numpy as np
import pytest

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

pytestmark = pytest.mark.slow  # >100 s on a 1-core host

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


@pytest.mark.parametrize("quant", ["bsq8", "rabitq"])
def test_block_quantized_insert(quant):
    """Online insert into block-quantized (QG) indices: new vectors become
    searchable, touched nodes' packed blocks requantize (reference:
    graph_update_job.hpp:66-137 + rabitq_space.hpp:138-161)."""
    ds = random_dataset(n=600, dim=DIM, n_queries=4, seed=17)
    idx = Index("q", IndexParams(index_type="hnsw", capacity=700,
                                 max_nbrs=16 if quant == "bsq8" else 32,
                                 ef_construction=64, quantization_type=quant))
    idx.fit(ds.data)
    rng = np.random.default_rng(2)
    new = ds.data[:24] + 0.01 * rng.normal(size=(24, DIM)).astype(np.float32)
    new_ids = idx.insert(new)
    assert (new_ids >= 600).all()
    ids = idx.batch_search(new, 5, ef_search=64)
    hit = np.mean([new_ids[i] in ids[i] for i in range(len(new_ids))])
    assert hit >= 0.9, f"hit {hit}"
    # old vectors still found after the touched-block requantization
    ids_old = idx.batch_search(ds.queries, 10, ef_search=64)
    from alayalite_tpu.utils.evaluate import calc_gt as _gt, calc_recall as _rc
    gt = _gt(np.concatenate([ds.data, new]), ds.queries, 10)
    assert _rc(np.asarray(ids_old), gt) >= 0.8


def test_pad_bucket_pads_with_identical_pairs():
    """Scatter order for duplicate indices is undefined in XLA, so pad
    entries must repeat a real (id, row) PAIR — padding ids[0] with -1 rows
    nondeterministically wiped the first inserted node's neighbor row
    (round-2 advisor, engine.py:384)."""
    from alayalite_tpu.index.engine import _pad_bucket

    ids = np.arange(10, dtype=np.int32)
    rows = np.arange(10 * 4, dtype=np.int32).reshape(10, 4)
    pid, prow, t = _pad_bucket(ids, rows)
    assert t == 10 and pid.shape[0] % 256 == 0
    assert (pid[10:] == ids[0]).all()
    assert (prow[10:] == rows[0]).all()  # identical pair -> idempotent write


def test_block_insert_keeps_first_nodes_edges():
    """End-to-end: after a non-bucket-multiple block-insert batch, the FIRST
    inserted node's packed neighbor row must keep its real edges."""
    ds = random_dataset(n=400, dim=DIM, n_queries=2, seed=23)
    idx = Index("pw", IndexParams(index_type="hnsw", capacity=500,
                                  max_nbrs=16, ef_construction=64,
                                  quantization_type="bsq8"))
    idx.fit(ds.data)
    new_ids = idx.insert(ds.data[:12] + 0.01)
    eng = idx._engine
    first_row = np.asarray(eng.search_space.nbr_ids[int(new_ids[0])])
    assert (first_row >= 0).any(), "first inserted node's edges were wiped"
    assert (np.asarray(eng.graph.nbrs)[int(new_ids[0])] >= 0).any()


def test_block_insert_then_remove():
    """Insert + tombstone remove on a bsq8 index keeps results clean."""
    ds = random_dataset(n=400, dim=DIM, n_queries=8, seed=19)
    idx = Index("qr", IndexParams(index_type="hnsw", capacity=500,
                                  max_nbrs=16, ef_construction=64,
                                  quantization_type="bsq8"))
    idx.fit(ds.data)
    new_ids = idx.insert(ds.data[:8] + 0.005)
    idx.remove(new_ids[:4])
    ids = idx.batch_search(ds.queries, 10, ef_search=64)
    assert not np.isin(ids[ids >= 0], new_ids[:4]).any()


def test_unquantized_insert_keeps_space_identity():
    """For unquantized indexes, search_space must stay the SAME pytree as
    space across insert/remove: the identity check used to run after the
    rebind, which doubled every insert and permanently forked searches
    onto the quantized-traversal + rerank branch (engine.py fix)."""
    for itype in ("hnsw", "flat"):
        ds = random_dataset(n=300, dim=DIM, n_queries=4, seed=31)
        idx = Index("idn_" + itype,
                    IndexParams(index_type=itype, capacity=400,
                                max_nbrs=16, ef_construction=64))
        idx.fit(ds.data)
        eng = idx._engine
        assert eng.search_space is eng.space
        new = idx.insert(ds.data[:6] + 0.01)
        assert eng.search_space is eng.space, itype
        idx.remove(new[:2])
        assert eng.search_space is eng.space, itype
        got = idx.batch_search(ds.data[2:6] + 0.01, 4, ef_search=64)
        assert all(new[2 + i] in got[i] for i in range(4)), itype
