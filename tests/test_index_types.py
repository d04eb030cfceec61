"""Index-type matrix: fit + search recall floors per builder/quantization —
the analog of the reference's python/tests/test_index_types.py."""

import numpy as np
import pytest

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_recall

pytestmark = pytest.mark.slow  # >100 s on a 1-core host

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


@pytest.mark.parametrize("metric", ["ip", "cos"])
def test_block_quantized_metrics(metric):
    """IP/COS through the flagship block (bsq8) path: the SQ8 estimator
    carries IP with the dot coefficient 1 and |x̂|² dropped (reference
    serves every space through distance_ip.hpp:50-170)."""
    ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=5, topk=K,
                        metric=metric)
    idx, rec = _fit_and_recall(ds, index_type="hnsw", max_nbrs=16,
                               ef_construction=64, metric=metric,
                               quantization_type="bsq8")
    assert rec >= 0.8, f"bsq8 {metric} recall {rec}"


def test_bsq8_ip_estimate_matches_exact_decode():
    """The IP block estimate must equal −q·x̂ of the decoded codes (the
    estimator is exact given x̂, up to bf16 rounding)."""
    from alayalite_tpu.spaces.bqg import BQGSpace

    rng = np.random.default_rng(7)
    data = rng.normal(size=(64, 24)).astype(np.float32)
    sp = BQGSpace.create(64, 24, metric="ip", degree=8).fit(data)
    rows = rng.integers(0, 64, size=(64, 8)).astype(np.int32)
    sp = sp.set_neighbor_rows(np.arange(64, dtype=np.int32), rows)
    q = rng.normal(size=(4, 24)).astype(np.float32)
    ctx = sp.query_ctx(sp.prep_query(q))
    u = np.array([0, 5, 9, 33], dtype=np.int32)
    est, ids = sp.estimate_for(ctx, u)
    # decode x̂ from the stored grid and compare
    dmin, scale = np.asarray(sp.dmin), np.asarray(sp.scale)
    codes = np.asarray(sp.nbr_codes)[u][:, :, :24].astype(np.float32)
    xhat = codes * scale + dmin
    want = -np.einsum("brd,bd->br", xhat, q)
    np.testing.assert_allclose(np.asarray(est), want, rtol=0.02, atol=0.05)


def test_id_type_honored_or_loud(ds):
    """64-bit id types return 64-bit ids; capacity beyond the int32 device
    id range fails loudly instead of overflowing (reference instantiates
    u64 ids for that — dispatch.hpp:25-175; on TPU that scale must shard)."""
    idx = Index("i64", IndexParams(index_type="flat", capacity=N + 8,
                                   id_type="uint64"))
    idx.fit(ds.data)
    ids, _ = idx.batch_search_with_distance(ds.queries[:4], 5, ef_search=5)
    assert np.asarray(ids).dtype == np.int64
    new = idx.insert(np.zeros(DIM, np.float32))
    assert np.asarray(new).dtype == np.int64
    with pytest.raises(ValueError, match="int32"):
        IndexParams(capacity=2**31)
    # the true ceiling is the packed id*2+flag sort lane (ops/topk.py):
    # ids >= 2**30 would wrap negative inside the merge units
    with pytest.raises(ValueError, match="packed"):
        IndexParams(capacity=2**30)


def test_rabitq_ip_rejected_loudly():
    """RaBitQ's 1-bit estimator is an L2 construction; IP points to bsq8."""
    from alayalite_tpu.spaces.rabitq import RaBitQSpace

    with pytest.raises(ValueError, match="bsq8"):
        RaBitQSpace.create(100, 16, metric="ip")


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


def test_uint8_data_type_native_storage():
    """u8 vector data (SIFT's native dtype) is stored as u8 and searched
    losslessly — genuine support for the reference's u8 dispatch
    (python/include/dispatch.hpp:25-175), not a silent f32 coercion."""
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=(400, 24)).astype(np.uint8)
    queries = data[:16].astype(np.float32)

    p = IndexParams(index_type="flat", capacity=500, data_type="uint8")
    assert p.storage_dtype == "uint8"
    idx = Index("u8", p)
    idx.fit(data.astype(np.float32))
    assert str(idx._engine.space.data.dtype) == "uint8"
    ids = idx.batch_search(queries, 1, ef_search=1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(16))

    # u8 values are exactly representable: matches the f32 index
    f = Index("f32", IndexParams(index_type="flat", capacity=500))
    f.fit(data.astype(np.float32))
    np.testing.assert_array_equal(
        idx.batch_search(queries, 5, ef_search=5),
        f.batch_search(queries, 5, ef_search=5))

    # insert keeps native dtype; cos+integer is rejected loudly
    new_id = int(np.atleast_1d(idx.insert(np.full(24, 7, np.float32)))[0])
    assert new_id == 400
    assert str(idx._engine.space.data.dtype) == "uint8"
    with pytest.raises(ValueError, match="cos"):
        IndexParams(data_type="int8", metric="cos")


def test_graph_connectivity_all_types():
    """Every built graph reaches (almost) every node from its entry points
    (reference tests/index/graph_test.cpp: in/out edge invariants +
    reachability; repair threshold 2e-4 from nsg._attach_unreached)."""
    import numpy as np

    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.datasets import random_dataset

    ds = random_dataset(n=1500, dim=16, n_queries=4, seed=21)
    for cfg in (dict(index_type="hnsw"), dict(index_type="nsg"),
                dict(index_type="hnsw", quantization_type="bsq8")):
        idx = Index("c", IndexParams(capacity=1500, max_nbrs=12,
                                     ef_construction=48, **cfg))
        idx.fit(ds.data)
        g = idx._engine.graph
        nbrs = np.asarray(g.nbrs)[:1500]
        eps = np.asarray(g.eps)
        # out-degree: every node has at least one edge
        assert (nbrs >= 0).any(axis=1).all(), cfg
        # no self-loops
        assert not (nbrs == np.arange(1500)[:, None]).any(), cfg
        # BFS reachability from entry points
        reached = np.zeros(1500, bool)
        frontier = eps[eps >= 0]
        reached[frontier] = True
        while frontier.size:
            nxt = np.unique(nbrs[frontier].ravel())
            nxt = nxt[nxt >= 0]
            nxt = nxt[~reached[nxt]]
            reached[nxt] = True
            frontier = nxt
        assert (~reached).sum() <= 2, (cfg, int((~reached).sum()))


def test_uint8_data_with_bsq8_graph():
    """SIFT's u8 data through the flagship block-quantized graph path."""
    import numpy as np

    from alayalite_tpu import Index, IndexParams

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(2000, 32)).astype(np.uint8)
    idx = Index("u8b", IndexParams(index_type="hnsw", capacity=2000,
                                   max_nbrs=16, ef_construction=64,
                                   data_type="uint8",
                                   quantization_type="bsq8"))
    idx.fit(data)
    ids = idx.batch_search(data[:32].astype(np.float32), 5, ef_search=48)
    assert float((ids[:, 0] == np.arange(32)).mean()) >= 0.95


def test_rabitq2_highdim_block_recall():
    """The GIST-960 block config in miniature: rabitq2 (2-bit neighbor
    codes) + prune_alpha on a high-dim clustered shape. Guards the 960-d
    frontier path (results/gist960_frontier.json): 2-bit estimates must
    stay accurate enough at high ambient dim to drive traversal, with the
    in-search exact rerank recovering the final ordering."""
    ds = random_dataset(n=3000, dim=192, n_queries=64, seed=9, topk=K,
                        clusters=24)
    idx = Index("rq2hd", IndexParams(index_type="hnsw", capacity=3000,
                                     ef_construction=96, prune_alpha=1.2,
                                     quantization_type="rabitq2"))
    idx.fit(ds.data)
    ids = idx.batch_search(ds.queries, K, ef_search=64)
    rec = calc_recall(ids, ds.gt)
    assert rec >= 0.9, f"rabitq2 high-dim recall {rec}"
