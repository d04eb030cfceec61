"""Mesh-sharded single-graph build: recall parity with the single-device
pipeline on an 8-virtual-device CPU mesh (VERDICT r3 #3 — the build
parallelism slot of SURVEY §2c; the reference's multi-threaded
HNSWBuilder, include/index/graph/hnsw/hnsw_builder.hpp:115-127)."""

import jax
import numpy as np
import pytest

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_recall

pytestmark = pytest.mark.slow  # >100 s on a 1-core host

N, DIM, NQ, K = 2048, 24, 64, 10


@pytest.fixture(scope="module")
def ds():
    return random_dataset(n=N, dim=DIM, n_queries=NQ, seed=33, topk=K)


needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


@needs_mesh
def test_sharded_build_recall_parity(ds):
    single = Index("one", IndexParams(index_type="hnsw", capacity=N,
                                      max_nbrs=16, ef_construction=64))
    single.fit(ds.data)
    rec1 = calc_recall(single.batch_search(ds.queries, K, ef_search=80),
                       ds.gt)

    sharded = Index("mesh", IndexParams(index_type="hnsw", capacity=N + 16,
                                        max_nbrs=16, ef_construction=64,
                                        build_shards=8))
    sharded.fit(ds.data)
    rec8 = calc_recall(sharded.batch_search(ds.queries, K, ef_search=80),
                       ds.gt)

    assert rec8 >= 0.85, f"sharded-build recall {rec8}"
    assert rec8 >= rec1 - 0.05, f"sharded {rec8} vs single {rec1}"

    # the sharded-build index is a normal engine: insert + search work
    fresh = ds.queries[:4] + 0.01
    got = sharded.insert(fresh)
    ids, _ = sharded.batch_search_with_distance(fresh, 1, ef_search=64)
    assert (ids[:, 0] == got).all()


@needs_mesh
@pytest.mark.parametrize("metric", ["cos", "ip"])
def test_sharded_build_metric_parity(metric):
    """VERDICT r4 weak #5: the r4 parity test was L2-only. cos/ip run the
    builder's ip ring path (cos = normalize-then-ip)."""
    rng = np.random.default_rng(44)
    data = rng.normal(size=(1536, 24)).astype(np.float32)
    if metric == "ip":
        # keep ip's top-k well-defined: strictly positive norms spread
        data *= rng.uniform(0.5, 1.5, size=(1536, 1)).astype(np.float32)
    queries = rng.normal(size=(48, 24)).astype(np.float32)
    if metric == "cos":
        dn = data / np.linalg.norm(data, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        gt = np.argsort(-(qn @ dn.T), axis=1)[:, :K]
    else:
        gt = np.argsort(-(queries @ data.T), axis=1)[:, :K]

    def fit(shards):
        idx = Index(f"m{metric}{shards}",
                    IndexParams(index_type="hnsw", capacity=1536,
                                max_nbrs=16, ef_construction=64,
                                metric=metric, build_shards=shards))
        idx.fit(data)
        return calc_recall(idx.batch_search(queries, K, ef_search=96), gt)

    rec8, rec1 = fit(8), fit(1)
    assert rec8 >= 0.85, f"{metric} sharded recall {rec8}"
    assert rec8 >= rec1 - 0.05, f"{metric}: sharded {rec8} vs single {rec1}"


@needs_mesh
def test_sharded_build_non_divisible_n():
    """n % shards != 0 and n % chunk != 0: pad rows must neither enter the
    graph nor the search results."""
    rng = np.random.default_rng(45)
    data = rng.normal(size=(2003, 16)).astype(np.float32)
    idx = Index("nd", IndexParams(index_type="nsg", capacity=2003,
                                  max_nbrs=12, ef_construction=48,
                                  build_shards=8))
    idx.fit(data)
    ids = idx.batch_search(data[:64], 5, ef_search=64)
    assert (ids < 2003).all()
    assert np.mean(ids[:, 0] == np.arange(64)) >= 0.95


@needs_mesh
def test_sharded_builder_adjacency_shape(ds):
    from alayalite_tpu.parallel.build_sharded import (ShardedGraphBuilder,
                                                      make_build_mesh)

    b = ShardedGraphBuilder(mesh=make_build_mesh(8), r=12, knn_k=12,
                            chunk=128)
    nbrs, ep = b.build(ds.data[:1000], 1000)
    assert nbrs.shape == (1000, 12)
    assert nbrs.dtype == np.int32
    assert 0 <= ep < 1000
    assert (nbrs < 1000).all() and (nbrs >= -1).all()
    # no self-loops, rows mostly filled
    self_loop = (nbrs == np.arange(1000)[:, None]).any()
    assert not self_loop
    assert (nbrs >= 0).sum(axis=1).mean() >= 4


def test_build_shards_param_validation():
    with pytest.raises(ValueError, match="build_shards"):
        IndexParams(index_type="flat", capacity=100, build_shards=2)
    with pytest.raises(ValueError, match="build_shards"):
        IndexParams(index_type="hnsw", capacity=100,
                    quantization_type="bsq8", build_shards=2)
    p = IndexParams(index_type="hnsw", capacity=100, build_shards=4)
    assert IndexParams.from_json(p.to_json()).build_shards == 4
