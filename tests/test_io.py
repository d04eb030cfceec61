"""Vector file IO + md5 — analog of python/tests/{test_vec_loader,test_md5}.py."""

import numpy as np
import pytest

from alayalite_tpu.utils.io import (load_fvecs, load_ivecs, md5, save_fvecs,
                                    save_ivecs)


def test_fvecs_roundtrip(tmp_path, rng):
    mat = rng.normal(size=(100, 17)).astype(np.float32)
    p = str(tmp_path / "a.fvecs")
    save_fvecs(p, mat)
    np.testing.assert_array_equal(load_fvecs(p), mat)


def test_ivecs_roundtrip(tmp_path, rng):
    mat = rng.integers(0, 1000, size=(50, 10)).astype(np.int32)
    p = str(tmp_path / "a.ivecs")
    save_ivecs(p, mat)
    np.testing.assert_array_equal(load_ivecs(p), mat)


def test_empty_file(tmp_path):
    p = str(tmp_path / "empty.fvecs")
    open(p, "wb").close()
    assert load_fvecs(p).size == 0


def test_md5(tmp_path):
    p = str(tmp_path / "x.bin")
    with open(p, "wb") as f:
        f.write(b"hello world")
    assert md5(p) == "5eb63bbbe01eeed093cb22bb8f5acdc3"


def test_real_dataset_discovery_texmex(tmp_path, rng):
    """load_real_dataset finds <dir>/<name>/<name>_{base,query}.fvecs +
    groundtruth.ivecs (the reference's texmex layout, dataset_utils.hpp)."""
    from alayalite_tpu.utils.datasets import (available_real_datasets,
                                              load_real_dataset)

    d = tmp_path / "sift"
    d.mkdir()
    base = rng.normal(size=(200, 16)).astype(np.float32)
    queries = rng.normal(size=(9, 16)).astype(np.float32)
    gt = rng.integers(0, 200, size=(9, 10)).astype(np.int32)
    save_fvecs(str(d / "sift_base.fvecs"), base)
    save_fvecs(str(d / "sift_query.fvecs"), queries)
    save_ivecs(str(d / "sift_groundtruth.ivecs"), gt)

    assert available_real_datasets(str(tmp_path)) == ["sift"]
    ds = load_real_dataset("sift", root=str(tmp_path))
    np.testing.assert_allclose(ds.data, base)
    np.testing.assert_allclose(ds.queries, queries)
    np.testing.assert_array_equal(ds.gt, gt)
    assert load_real_dataset("gist", root=str(tmp_path)) is None


def test_real_dataset_discovery_hdf5(tmp_path, rng):
    """ann-benchmarks layout: <name>.hdf5 with train/test/neighbors."""
    h5py = pytest.importorskip("h5py")
    from alayalite_tpu.utils.datasets import load_real_dataset

    with h5py.File(tmp_path / "fashion-mnist-784-euclidean.hdf5", "w") as f:
        f["train"] = rng.normal(size=(150, 8)).astype(np.float32)
        f["test"] = rng.normal(size=(7, 8)).astype(np.float32)
        f["neighbors"] = rng.integers(0, 150, size=(7, 5))
    ds = load_real_dataset("fashion-mnist-784-euclidean", root=str(tmp_path))
    assert ds.data.shape == (150, 8)
    assert ds.queries.shape == (7, 8)
    assert ds.gt.shape == (7, 5)


def test_real_dataset_gt_computed_when_missing(tmp_path, rng):
    from alayalite_tpu.utils.datasets import load_real_dataset
    from alayalite_tpu.utils.evaluate import calc_gt

    d = tmp_path / "siftsmall"
    d.mkdir()
    base = rng.normal(size=(120, 12)).astype(np.float32)
    queries = base[:5] + 0.01
    save_fvecs(str(d / "siftsmall_base.fvecs"), base)
    save_fvecs(str(d / "siftsmall_query.fvecs"), queries)
    ds = load_real_dataset("siftsmall", root=str(tmp_path), topk=3)
    np.testing.assert_array_equal(ds.gt, calc_gt(base, queries, 3))
