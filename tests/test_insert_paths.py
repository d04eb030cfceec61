"""Guards for the round-4 insert/persistence fast paths.

- RawSpace.insert_donated is the single-dispatch donated twin of
  RawSpace.insert (spaces/raw.py) — the engine routes every raw append
  through it whenever no other space aliases the slab. Equivalence here
  keeps the donation refactor honest (reference semantics:
  sequential_storage.hpp:77-84 bump insert).
- RaBitQSpace.load_arrays accepts both the current flat [C, 32*nbytes]
  neighbor-code layout and pre-round-4 3-D [C, 32, nbytes] files
  (spaces/rabitq.py::load_arrays); old saves must keep searching
  identically.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from alayalite_tpu.spaces.raw import RawSpace

pytestmark = pytest.mark.slow  # >100 s on a 1-core host


def _mk(metric: str):
    rng = np.random.default_rng(7)
    sp = RawSpace.create(24, 16, metric=metric)
    sp = sp.fit(rng.standard_normal((10, 16)).astype(np.float32))
    more = rng.standard_normal((9, 16)).astype(np.float32)
    return sp, more


@pytest.mark.parametrize("metric", ["l2", "cos"])
def test_insert_donated_matches_eager(metric):
    sp_a, more = _mk(metric)
    # eager first: insert_donated donates sp_a's buffers, so it must be
    # the last use of the starting pytree
    a2, ids_a = sp_a.insert(jnp.asarray(more))
    b2, ids_b = sp_a.insert_donated(jnp.asarray(more))
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
    np.testing.assert_allclose(np.asarray(a2.data), np.asarray(b2.data),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a2.sq_norms),
                               np.asarray(b2.sq_norms), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a2.valid), np.asarray(b2.valid))
    assert int(a2.num) == int(b2.num)


def test_insert_donated_capacity_overflow():
    sp, _ = _mk("l2")
    big = np.random.default_rng(1).standard_normal((20, 16)) \
        .astype(np.float32)
    eager, ids_e = sp.insert(jnp.asarray(big))
    donated, ids_d = sp.insert_donated(jnp.asarray(big))
    np.testing.assert_array_equal(np.asarray(ids_e), np.asarray(ids_d))
    assert int(donated.num) == 24
    assert np.asarray(ids_d)[-1] == -1  # past-capacity rows dropped with -1


def _shadow_fixture(monkeypatch, flag):
    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.datasets import random_dataset

    monkeypatch.setenv("ALAYA_INSERT_SHADOW", flag)
    ds = random_dataset(n=2000, dim=32, n_queries=64, seed=9)
    idx = Index("s" + flag, IndexParams(index_type="hnsw", capacity=4096,
                                        max_nbrs=16, ef_construction=64))
    idx.fit(ds.data)
    rng = np.random.default_rng(5)
    all_ids = []
    for _ in range(3):
        batch = (ds.data[rng.integers(0, 2000, size=256)]
                 + 0.05 * rng.normal(size=(256, 32))).astype(np.float32)
        all_ids.append((idx.insert(batch), batch))
    return idx, ds, all_ids


@pytest.mark.parametrize("flag", ["1", "0"])
def test_insert_shadow_quality_matches_f32_path(monkeypatch, flag):
    """VERDICT r4 #1: the bsq8 insert-shadow search must keep the raw
    path's quality guards — every inserted vector findable (self-hit) and
    post-churn recall intact. flag='0' runs the f32 control through the
    same harness so a shadow regression shows as a delta, not an absolute
    threshold surprise."""
    idx, ds, all_ids = _shadow_fixture(monkeypatch, flag)
    eng = idx._engine
    assert (eng._ins_shadow is not None) == (flag == "1")
    # every inserted batch is findable through the REAL graph
    for new_ids, batch in all_ids:
        got = idx.batch_search(batch[:64], 10, ef_search=96)
        hit = np.mean([new_ids[i] in got[i] for i in range(64)])
        assert hit >= 0.95, hit
    # recall intact after churn — GT over the FULL stored set (base +
    # inserted perturbed copies; bump slots make concat order == ids)
    full = np.concatenate([ds.data] + [b for _, b in all_ids])
    gt = np.argsort(((ds.queries[:, None, :] - full[None, :, :]) ** 2)
                    .sum(-1), axis=1)[:, :10]
    got = idx.batch_search(ds.queries, 10, ef_search=96)
    recall = np.mean([len(set(got[i]) & set(gt[i])) / 10
                      for i in range(len(gt))])
    assert recall >= 0.90, recall


def test_insert_shadow_invalidates_on_remove(monkeypatch):
    idx, ds, all_ids = _shadow_fixture(monkeypatch, "1")
    eng = idx._engine
    assert eng._ins_shadow is not None
    idx.remove(int(all_ids[0][0][0]))
    assert eng._ins_shadow is None  # stale valid mask dropped
    nid = idx.insert(ds.data[:4] + 0.01)  # repacks lazily, still works
    assert (nid >= 0).all()
    assert eng._ins_shadow is not None


def test_rabitq_legacy_3d_layout_loads():
    from alayalite_tpu.index.engine import IndexEngine
    from alayalite_tpu.params import IndexParams
    from alayalite_tpu.spaces.rabitq import DEGREE, RaBitQSpace

    rng = np.random.default_rng(3)
    data = rng.standard_normal((512, 32)).astype(np.float32)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    eng = IndexEngine(IndexParams(index_type="hnsw", capacity=512,
                                  quantization_type="rabitq",
                                  ef_construction=60))
    eng.fit(data)
    ids_ref = eng.batch_search(q, 5, ef=40)

    d = eng.search_space.save_arrays()
    flat = np.asarray(d["nbr_bits"])
    assert flat.ndim == 2  # current layout is flat [C, 32*nbytes]
    d_legacy = dict(d)
    d_legacy["nbr_bits"] = flat.reshape(flat.shape[0], DEGREE, -1)
    sp = RaBitQSpace.load_arrays(d_legacy)
    np.testing.assert_array_equal(np.asarray(sp.nbr_bits), flat)

    eng.search_space = sp
    ids_legacy = eng.batch_search(q, 5, ef=40)
    np.testing.assert_array_equal(np.asarray(ids_ref),
                                  np.asarray(ids_legacy))
