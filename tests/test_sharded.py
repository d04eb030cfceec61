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

pytestmark = [pytest.mark.slow,  # >100 s on a 1-core host
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 devices")]


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


def test_db_sharded_graph_index():
    """Row-partitioned graph search: per-shard subgraphs, fan-out beams,
    ICI top-k merge. Results must exactly match running each shard's beam
    on one device and merging on the host (the distributed machinery adds
    nothing but the collective)."""
    from alayalite_tpu.index.search import beam_search
    from alayalite_tpu.parallel.sharded import ShardedGraphIndex

    ds = random_dataset(n=1024, dim=16, n_queries=64, seed=8, topk=10)
    mesh = make_mesh(8, dp=1)
    idx = ShardedGraphIndex(mesh, max_nbrs=12, ef_construction=64)
    idx.fit(ds.data)
    ids, dists = idx.batch_search_with_distance(ds.queries, 10, ef_search=48)
    rec = calc_recall(ids, ds.gt)
    assert rec >= 0.9, f"recall {rec}"

    # single-device replay: per-shard beam + host merge == sharded result
    per = idx._per
    data = np.asarray(idx._leaves[0])
    sq = np.asarray(idx._leaves[1])
    valid = np.asarray(idx._leaves[2])
    nbrs = np.asarray(idx._nbrs)
    eps = np.asarray(idx._eps)
    all_d, all_i = [], []
    q = jnp.asarray(ds.queries)
    for s in range(8):
        sl = slice(s * per, (s + 1) * per)
        space = RawSpace(data=jnp.asarray(data[sl]),
                         sq_norms=jnp.asarray(sq[sl]),
                         valid=jnp.asarray(valid[sl]),
                         num=jnp.asarray(per, jnp.int32),
                         metric="l2", user_metric="l2")
        seeds = jnp.broadcast_to(jnp.asarray(eps[s])[None, :], (64, eps.shape[1]))
        d, i = beam_search(space, jnp.asarray(nbrs[sl]), seeds, q, k=10,
                           ef=48, valid=space.valid, n_expand=8)
        all_d.append(np.asarray(d))
        all_i.append(np.where(np.asarray(i) >= 0, np.asarray(i) + s * per, -1))
    dd = np.concatenate(all_d, axis=1)
    ii = np.concatenate(all_i, axis=1)
    sel = np.argsort(dd, axis=1, kind="stable")[:, :10]
    want_i = np.take_along_axis(ii, sel, axis=1)
    # compare as sets per row (merge tie order may differ)
    same = np.mean([set(ids[r][ids[r] >= 0]) == set(want_i[r][want_i[r] >= 0])
                    for r in range(64)])
    assert same >= 0.95, f"shard-replay match {same}"


def test_sharded_block_index_matches_per_shard_replay():
    """db-sharded bsq8: the distributed result equals a host-side replay of
    each shard's subindex search + global merge (exact semantics check for
    the flagship layout's scale-out path)."""
    import jax.numpy as jnp

    from alayalite_tpu.index.search import block_beam_search
    from alayalite_tpu.parallel.sharded import ShardedBlockIndex, make_mesh
    from alayalite_tpu.spaces.bqg import BQGSpace

    mesh = make_mesh(dp=1)
    ndb = mesh.shape["db"]
    rng = np.random.default_rng(5)
    n, dim, nq, k = 64 * ndb, 16, 8, 5
    data = rng.normal(size=(n, dim)).astype(np.float32)
    q = rng.normal(size=(nq, dim)).astype(np.float32)

    idx = ShardedBlockIndex(mesh=mesh, max_nbrs=8, ef_construction=32)
    idx.fit(data)
    ids, dists = idx.batch_search_with_distance(q, k, ef_search=16)

    # replay: rebuild each shard locally and merge
    per = idx._per
    alld, alli = [], []
    leaves = [np.asarray(x) for x in idx._leaves]
    for s in range(ndb):
        sl = slice(s * per, (s + 1) * per)
        sp = BQGSpace(
            data=jnp.asarray(leaves[0][sl]), sq_norms=jnp.asarray(leaves[1][sl]),
            dmin=jnp.asarray(leaves[2][s]), scale=jnp.asarray(leaves[3][s]),
            nbr_ids=jnp.asarray(leaves[4][sl]), nbr_codes=jnp.asarray(leaves[5][sl]),
            nbr_xsq=jnp.asarray(leaves[6][sl]), valid=jnp.asarray(leaves[7][sl]),
            num=jnp.asarray(per, jnp.int32), metric="l2", user_metric="l2")
        seeds = jnp.broadcast_to(jnp.asarray(leaves[8][s])[None, :], (nq, 8))
        d, i = block_beam_search(sp, seeds, sp.prep_query(jnp.asarray(q)),
                                 k=k, ef=16, valid=sp.valid, n_expand=8)
        alld.append(np.asarray(d))
        alli.append(np.where(np.asarray(i) >= 0, np.asarray(i) + s * per, -1))
    dd = np.concatenate(alld, axis=1)
    ii = np.concatenate(alli, axis=1)
    sel = np.argsort(dd, axis=1)[:, :k]
    want_i = np.take_along_axis(ii, sel, axis=1)
    want_d = np.take_along_axis(dd, sel, axis=1)
    np.testing.assert_array_equal(ids, want_i)
    np.testing.assert_allclose(dists, want_d, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- SDK layer

def test_sdk_sharded_bsq8_full_lifecycle(tmp_path):
    """The round-2 verdict's done criterion: build a db-sharded bsq8 index
    through Index, save, reload, search, insert, remove — all under the
    schema.json contract (reference: index.py:145-162, client.py:251-294)."""
    from alayalite_tpu import Index, IndexParams

    ds = random_dataset(n=1200, dim=32, n_queries=16, seed=41, topk=10)
    idx = Index("s", IndexParams(index_type="hnsw", capacity=1600,
                                 max_nbrs=16, ef_construction=48,
                                 quantization_type="bsq8", db_shards=2))
    idx.fit(ds.data)
    from alayalite_tpu.parallel.engine_sharded import ShardedEngine

    assert isinstance(idx._engine, ShardedEngine)
    assert idx._engine._mesh() is not None  # 8 devices -> real mesh path
    ids = idx.batch_search(ds.queries, 10, ef_search=80)
    rec = calc_recall(ids, ds.gt)
    assert rec >= 0.85, f"sharded bsq8 recall {rec}"

    d = tmp_path / "s"
    d.mkdir()
    idx.save(str(d))
    idx2 = Index.load(str(tmp_path), "s")
    ids2 = idx2.batch_search(ds.queries, 10, ef_search=80)
    np.testing.assert_array_equal(ids, ids2)

    new = ds.data[:8] + 0.01
    nids = np.atleast_1d(idx2.insert(new))
    assert (nids >= 1200).all()
    got = idx2.batch_search(new, 5, ef_search=64)
    hit = np.mean([nids[i] in got[i] for i in range(8)])
    assert hit >= 0.9, hit

    idx2.remove(nids[:4])
    got2 = idx2.batch_search(ds.queries, 10, ef_search=64)
    assert not np.isin(got2, nids[:4]).any()


def test_sdk_sharded_flat_ids_are_row_positions():
    """Sharded fit keeps reference id semantics: global id == row position;
    exact flat search over the mesh returns the brute-force ids."""
    from alayalite_tpu import Index, IndexParams

    ds = random_dataset(n=1000, dim=16, n_queries=32, seed=43, topk=10)
    idx = Index("f", IndexParams(index_type="flat", capacity=1200,
                                 db_shards=4))
    idx.fit(ds.data)
    ids = idx.batch_search(ds.queries, 10, ef_search=10)
    assert calc_recall(ids, ds.gt) == 1.0
    v = idx.get_data_by_id(int(ids[0, 0]))
    np.testing.assert_allclose(v, ds.data[int(ids[0, 0])], rtol=1e-6)


def test_sdk_sharded_fallback_matches_mesh():
    """With fewer devices than shards the engine host-merges sequential
    per-shard searches — results stay correct (exact flat: identical)."""
    from alayalite_tpu import Index, IndexParams

    ds = random_dataset(n=800, dim=16, n_queries=16, seed=47, topk=10)
    idx = Index("fb", IndexParams(index_type="flat", capacity=800,
                                  db_shards=2))
    idx.fit(ds.data)
    mesh_ids = idx.batch_search(ds.queries, 10, ef_search=10)
    idx._engine._mesh = lambda: None  # force the fallback
    fb_ids = idx.batch_search(ds.queries, 10, ef_search=10)
    assert calc_recall(fb_ids, ds.gt) == 1.0
    np.testing.assert_array_equal(mesh_ids, fb_ids)
