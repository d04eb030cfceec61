"""10k-scale integration tests with a recall floor — the reference's
integration tier (tests/executor/search_test.cpp:111-181 runs 10k siftsmall
and asserts recall); here the same shape on clustered synthetic data so the
suite stays network-free.
"""

import numpy as np
import pytest

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

pytestmark = pytest.mark.slow  # >100 s on a 1-core host

N, DIM, NQ, TOPK = 10_000, 48, 128, 10


@pytest.fixture(scope="module")
def ds():
    d = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=17, clusters=64)
    gt = calc_gt(d.data, d.queries, TOPK)
    return d, gt


def test_hnsw_10k_recall_floor(ds):
    d, gt = ds
    idx = Index("i10k", IndexParams(index_type="hnsw", capacity=N,
                                    max_nbrs=24, ef_construction=128))
    idx.fit(d.data)
    ids = idx.batch_search(d.queries, TOPK, ef_search=64)
    rec = calc_recall(ids, gt)
    assert rec >= 0.92, f"hnsw 10k recall {rec}"


def test_gist960_shaped_build_and_search():
    """GIST-960 shape at CI size (round-2 verdict #1: nothing at D=960 had
    ever been built or searched): 2k x 960-d clustered, bsq8 build + search
    recall floor. The full-scale counterpart runs in scripts/scale1m.py
    with ALAYA_SCALE_DIM=960 (BASELINE.md north star)."""
    n, dim = 2000, 960
    d = random_dataset(n=n, dim=dim, n_queries=32, seed=23, clusters=32)
    gt = calc_gt(d.data, d.queries, TOPK)
    idx = Index("g960", IndexParams(index_type="hnsw", capacity=n,
                                    max_nbrs=16, ef_construction=64,
                                    quantization_type="bsq8"))
    idx.fit(d.data)
    ids = idx.batch_search(d.queries, TOPK, ef_search=64)
    rec = calc_recall(ids, gt)
    assert rec >= 0.88, f"bsq8 960-d recall {rec}"
    # flat fast path at 960-d too (bf16 coarse + rerank)
    fl = Index("g960f", IndexParams(index_type="flat", capacity=n,
                                    flat_mode="fast"))
    fl.fit(d.data)
    ids_f = fl.batch_search(d.queries, TOPK, ef_search=TOPK)
    assert calc_recall(ids_f, gt) >= 0.99


def test_gist960_pools_default_rescues_recall():
    """High-dim candidate pools must stay ON by default: kNN-only candidate
    sets collapse under distance concentration at D=960 (measured: recall
    0.59 at this exact config with ALAYA_HNSW_POOLS=0; 0.22 at 1M x 960).
    The slim pools config (ef=64, 2048-chunk — the HBM-budget variant for
    dims >= 512, hnsw.py) must carry the graph to a high floor."""
    n, dim = 2000, 960
    d = random_dataset(n=n, dim=dim, n_queries=64, seed=29, clusters=24)
    gt = calc_gt(d.data, d.queries, TOPK)
    idx = Index("g960p", IndexParams(index_type="hnsw", capacity=n,
                                     quantization_type="sq8"))
    idx.fit(d.data)
    ids = idx.batch_search(d.queries, TOPK, ef_search=32)
    rec = calc_recall(ids, gt)
    assert rec >= 0.95, f"sq8 960-d pooled-build recall {rec}"


def test_bsq8_10k_recall_floor(ds):
    d, gt = ds
    idx = Index("b10k", IndexParams(index_type="hnsw", capacity=N,
                                    max_nbrs=24, ef_construction=128,
                                    quantization_type="bsq8"))
    idx.fit(d.data)
    ids = idx.batch_search(d.queries, TOPK, ef_search=64)
    rec = calc_recall(ids, gt)
    assert rec >= 0.90, f"bsq8 10k recall {rec}"
    # no duplicate ids within any result row (merge-dedup invariant)
    for row in ids:
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live)
