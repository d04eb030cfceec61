"""Beyond-int32 collections through the SDK sharded engine.

The reference instantiates u64 id templates so a single index can exceed
2^31-2 rows (/root/reference/python/include/dispatch.hpp:25-175). Here the
same capability is sharded: a declared capacity past the packed int32 guard
composes shards whose LOCAL ids stay in int32 range while global ids are
int64 end-to-end. Per-shard slabs are demand-sized, so declaring a 2.4e9
ceiling costs memory proportional to the rows that exist — which is what
makes this hermetically testable."""

import os

import numpy as np
import pytest

from alayalite_tpu.index_api import Index
from alayalite_tpu.params import IndexParams

CAP = 2_400_000_000  # > 2**31 - 2; per-shard 6e8 < 2**30 - 1


def test_guard_rejects_unsharded_and_narrow_ids():
    with pytest.raises(ValueError, match="shard the database"):
        IndexParams(index_type="flat", capacity=CAP)
    with pytest.raises(ValueError, match="64-bit id_type"):
        IndexParams(index_type="flat", capacity=CAP, db_shards=4)


def test_sharded_index_beyond_int32_ids_end_to_end(tmp_path):
    params = IndexParams(index_type="flat", capacity=CAP, db_shards=4,
                         id_type="int64")
    idx = Index("big", params)
    rng = np.random.default_rng(7)
    data = rng.normal(size=(512, 16)).astype(np.float32)
    idx.fit(data)

    # demand-sized slabs: the 2.4e9 declared ceiling allocated only what
    # the 512 fitted rows (plus insert headroom) need
    eng = idx._engine
    assert eng.capacity >= CAP
    assert sum(sh.space.capacity for sh in eng.shards) <= 4 * 4096

    ids, _ = idx.batch_search_with_distance(data[:8], 3, ef_search=32)
    assert ids.dtype == np.int64
    assert (ids[:, 0] == np.arange(8)).all()  # fit ids are row positions

    # the global id counter is monotone int64 (gids survive churn and only
    # grow); fast-forward it past 2^31 — the state after ~2^31 inserts —
    # and verify ids beyond int32 flow through insert/search/get/remove
    eng._next_gid = 2**31 + 3
    fresh = rng.normal(size=(5, 16)).astype(np.float32) + 50.0
    got = np.asarray(idx.insert(fresh))
    assert got.dtype == np.int64 and got.min() > 2**31

    ids2, _ = idx.batch_search_with_distance(fresh, 1, ef_search=32)
    assert (ids2[:, 0] == got).all()
    np.testing.assert_allclose(idx.get_data_by_id(int(got[0])), fresh[0],
                               rtol=1e-6)

    # save/load round-trips the huge ids and the virtual capacity
    d = os.path.join(tmp_path, "big")
    os.makedirs(d, exist_ok=True)
    idx.save(d)
    idx2 = Index.load(str(tmp_path), "big")
    assert idx2._engine.capacity >= CAP
    ids3 = idx2.batch_search(fresh, 1, ef_search=32)
    assert ids3.dtype == np.int64 and (ids3[:, 0] == got).all()

    # remove by a >2^31 id tombstones the right row
    idx2._engine.remove(got[0])
    ids4 = idx2.batch_search(fresh[:1], 1, ef_search=32)
    assert ids4[0, 0] != got[0]
