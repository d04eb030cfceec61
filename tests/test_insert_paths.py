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
