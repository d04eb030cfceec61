"""Mesh-sharded search over 8 virtual CPU devices — the distributed layer
(SURVEY.md §2c: the TPU-native substitute for the num_threads knob)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alayalite_tpu.index.knn import exact_knn
from alayalite_tpu.index.graph import Graph
from alayalite_tpu.ops.distance import exact_topk
from alayalite_tpu.parallel import (
    db_sharded_flat_search,
    dp_sharded_beam_search,
    make_mesh,
    shard_space_by_rows,
)
from alayalite_tpu.spaces.raw import RawSpace
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_recall

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def test_db_sharded_flat_matches_exact():
    ds = random_dataset(n=1024, dim=16, n_queries=64, seed=2, topk=10)
    space = RawSpace.create(1024, 16).fit(ds.data)
    mesh = make_mesh(8)
    sspace = shard_space_by_rows(mesh, space)
    d, i = db_sharded_flat_search(mesh, sspace, jnp.asarray(ds.queries), 10)
    want_d, want_i = exact_topk(ds.queries, ds.data, 10)
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-3, atol=1e-3)
    assert calc_recall(np.asarray(i), ds.gt) == 1.0


def test_dp_sharded_beam_search_recall():
    ds = random_dataset(n=1024, dim=16, n_queries=64, seed=4, topk=10)
    space = RawSpace.create(1024, 16).fit(ds.data)
    _, nbrs = exact_knn(ds.data, 16)
    # raw kNN graphs are cluster-disconnected; dense entry points stand in
    # for a real builder's connectivity repair (this test exercises the dp
    # sharding mechanics, not graph quality)
    g = Graph.from_numpy(nbrs, eps=np.arange(0, 1024, 8, dtype=np.int32))
    seeds = jnp.broadcast_to(
        jnp.asarray(np.asarray(g.eps))[None, :], (64, g.eps.shape[0]))
    mesh = make_mesh(8)
    _, ids = dp_sharded_beam_search(mesh, space, g.nbrs, seeds,
                                    jnp.asarray(ds.queries), k=10, ef=64,
                                    valid=space.valid)
    rec = calc_recall(np.asarray(ids), ds.gt)
    assert rec >= 0.85, f"recall {rec}"


def test_sharded_flat_index_class():
    from alayalite_tpu.parallel.sharded import ShardedFlatIndex

    ds = random_dataset(n=1000, dim=16, n_queries=32, seed=6, topk=10)
    idx = ShardedFlatIndex(make_mesh(8), bf16=False)
    idx.fit(ds.data)
    ids, dists = idx.batch_search_with_distance(ds.queries, 10)
    assert calc_recall(ids, ds.gt) == 1.0
    assert (np.diff(dists, axis=1) >= -1e-5).all()
