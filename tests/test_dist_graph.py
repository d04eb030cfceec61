"""serve_shards: ONE graph with the slab row-sharded over the mesh
(VERDICT r4 #3 / missing #2 — the reference's u64 big-index slot,
dispatch.hpp:25-175). Fit never materializes the full slab on one device;
the serving beam is the single-chip lockstep beam with a per-hop psum
distance merge, so recall parity vs single-device is structural."""

import numpy as np
import pytest

import jax

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

# the module fixture builds two graphs (~90 s on 1 core): slow lane, except
# the fixture-free param validation which stays in smoke
slow = pytest.mark.slow

N = 2003  # non-divisible by 8 on purpose


@pytest.fixture(scope="module")
def fitted():
    ds = random_dataset(n=N, dim=32, n_queries=64, seed=21)
    idx = Index("dist", IndexParams(index_type="hnsw", capacity=N,
                                    serve_shards=8, max_nbrs=16,
                                    ef_construction=64))
    idx.fit(ds.data)
    gt = np.argsort(((ds.queries[:, None, :] - ds.data[None, :, :]) ** 2)
                    .sum(-1), axis=1)[:, :10]
    return idx, ds, gt


def _recall(got, gt):
    return float(np.mean([len(set(got[i]) & set(gt[i])) / gt.shape[1]
                          for i in range(gt.shape[0])]))


@slow
def test_slab_is_sharded_not_replicated(fitted):
    idx, ds, gt = fitted
    eng = idx._engine
    shards = eng._data_sh.addressable_shards
    assert len({s.device for s in shards}) == 8
    rows = eng._data_sh.shape[0]
    assert rows >= N
    for s in shards:
        assert s.data.shape[0] == rows // 8  # per-device rows = Npad/8
    # adjacency is replicated (small int32), data is NOT
    assert eng._nbrs.is_fully_replicated
    assert not eng._data_sh.is_fully_replicated


@slow
def test_recall_parity_vs_single_device(fitted):
    idx, ds, gt = fitted
    got = idx.batch_search(ds.queries, 10, ef_search=96)
    r_dist = _recall(got, gt)
    single = Index("one", IndexParams(index_type="hnsw", capacity=N,
                                      max_nbrs=16, ef_construction=64))
    single.fit(ds.data)
    r_one = _recall(single.batch_search(ds.queries, 10, ef_search=96), gt)
    assert r_dist >= r_one - 0.02, (r_dist, r_one)
    assert r_dist >= 0.9, r_dist


@slow
def test_remove_tombstones_filter(fitted):
    idx, ds, gt = fitted
    victim = int(gt[0][0])
    idx.remove(victim)
    got = idx.batch_search(ds.queries[:8], 10, ef_search=96)
    assert victim not in got
    with pytest.raises(ValueError):
        idx.remove(10**7)
    with pytest.raises(RuntimeError):
        idx.insert(ds.data[0])  # static after fit, explicit error


@slow
def test_save_load_roundtrip(fitted, tmp_path):
    idx, ds, gt = fitted
    d = tmp_path / "dist"
    d.mkdir()
    idx.save(str(d))
    idx2 = Index.load(str(tmp_path), "dist")
    a = idx.batch_search(ds.queries, 10, ef_search=96)
    b = idx2.batch_search(ds.queries, 10, ef_search=96)
    np.testing.assert_array_equal(a, b)


@slow
def test_cos_metric():
    ds = random_dataset(n=1100, dim=32, n_queries=32, seed=4)
    idx = Index("dcos", IndexParams(index_type="nsg", capacity=1100,
                                    serve_shards=8, max_nbrs=16,
                                    ef_construction=64, metric="cos"))
    idx.fit(ds.data)
    got = idx.batch_search(ds.data[:32], 5, ef_search=64)
    assert np.mean(got[:, 0] == np.arange(32)) >= 0.95


def test_param_validation():
    with pytest.raises(ValueError):
        IndexParams(index_type="flat", serve_shards=8)
    with pytest.raises(ValueError):
        IndexParams(index_type="hnsw", serve_shards=8,
                    quantization_type="bsq8")
    with pytest.raises(ValueError):
        IndexParams(index_type="hnsw", serve_shards=8, db_shards=2)
    p = IndexParams(index_type="hnsw", serve_shards=8)
    assert IndexParams.from_dict(p.to_dict()).serve_shards == 8
