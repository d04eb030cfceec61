"""Vector file IO + md5 — analog of python/tests/{test_vec_loader,test_md5}.py."""

import numpy as np

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
