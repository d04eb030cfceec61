"""Multi-host (DCN) loading layer: ranged vecs reads, global sharded
assembly, and per-shard file-fed fit (SURVEY §7 step 8; the reference has
no multi-host layer — this is the TPU design's distributed-loading slot).

Runs single-process on the 8-virtual-device CPU mesh: the same
``jax.make_array_from_process_local_data`` call is the multi-process path
on a pod (process_count divides the row blocks there).
"""

import numpy as np
import pytest

from alayalite_tpu.params import IndexParams
from alayalite_tpu.parallel import make_mesh
from alayalite_tpu.parallel.engine_sharded import ShardedEngine
from alayalite_tpu.parallel.multihost import (
    fit_shards_from_file,
    load_vecs_global,
    load_vecs_rows,
    probe_vecs,
    process_row_range,
)
from alayalite_tpu.utils.io import load_fvecs, save_fvecs


@pytest.fixture(scope="module")
def fvecs_file(tmp_path_factory):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(403, 24)).astype(np.float32)
    path = tmp_path_factory.mktemp("mh") / "base.fvecs"
    save_fvecs(path, mat)
    return str(path), mat


def test_probe_and_ranged_reads(fvecs_file):
    path, mat = fvecs_file
    assert probe_vecs(path) == (403, 24)
    full = load_fvecs(path)
    np.testing.assert_array_equal(full, mat)
    # arbitrary interior / edge / clamped ranges
    for lo, hi in [(0, 403), (0, 1), (100, 250), (400, 500), (403, 410)]:
        got = load_vecs_rows(path, lo, hi)
        np.testing.assert_array_equal(got, mat[lo:hi])


def test_process_row_range_matches_array_split():
    for n, k in [(403, 7), (8, 8), (100, 3)]:
        splits = np.array_split(np.arange(n), k)
        for i, s in enumerate(splits):
            lo, hi = process_row_range(n, k, i)
            assert (lo, hi) == (int(s[0]), int(s[-1]) + 1)


def test_load_vecs_global_sharded(fvecs_file):
    path, mat = fvecs_file
    mesh = make_mesh(n_devices=8, dp=1)
    arr, n = load_vecs_global(path, mesh, axis="db")
    assert n == 403
    assert arr.shape == (408, 24)  # padded to a multiple of 8
    np.testing.assert_array_equal(np.asarray(arr)[:n], mat)
    assert np.all(np.asarray(arr)[n:] == 0)
    # genuinely row-sharded over the db axis: 8 single-row-block shards
    assert len(arr.sharding.addressable_devices) == 8
    assert arr.addressable_shards[0].data.shape == (51, 24)


def test_fit_shards_from_file_matches_array_fit(fvecs_file, tmp_path):
    path, mat = fvecs_file
    params = IndexParams(index_type="flat", capacity=500, db_shards=4)
    eng_file = ShardedEngine(params)
    fit_shards_from_file(eng_file, path)
    eng_arr = ShardedEngine(params)
    eng_arr.fit(mat)
    q = mat[:16] + 0.01
    ids_f, d_f = eng_file.batch_search_with_distance(q, 5, ef=32)
    ids_a, d_a = eng_arr.batch_search_with_distance(q, 5, ef=32)
    np.testing.assert_array_equal(ids_f, ids_a)
    np.testing.assert_allclose(d_f, d_a, rtol=1e-5)
    assert eng_file.num == 403
