"""Client registry semantics — analog of python/tests/test_client.py."""

import numpy as np
import pytest

from alayalite_tpu import Client, Collection, Index


def test_create_and_get():
    c = Client()
    idx = c.create_index("i1", index_type="flat", capacity=100)
    col = c.create_collection("c1")
    assert isinstance(idx, Index) and isinstance(col, Collection)
    assert c.get_index("i1") is idx
    assert c.get_collection("c1") is col
    assert c.list_indices() == ["i1"]
    assert c.list_collections() == ["c1"]


def test_name_conflicts():
    c = Client()
    c.create_index("x")
    with pytest.raises(RuntimeError):
        c.create_index("x")
    with pytest.raises(RuntimeError):
        c.create_collection("x")


def test_get_or_create():
    c = Client()
    a = c.get_or_create_index("i")
    assert c.get_or_create_index("i") is a
    b = c.get_or_create_collection("c")
    assert c.get_or_create_collection("c") is b


def test_delete_and_reset():
    c = Client()
    c.create_index("i")
    c.create_collection("c")
    c.delete_index("i")
    with pytest.raises(RuntimeError):
        c.delete_index("i")
    c.delete_collection("c")
    with pytest.raises(RuntimeError):
        c.delete_collection("missing")
    c.create_index("j")
    c.reset()
    assert c.list_indices() == []


def test_save_requires_url():
    c = Client()
    c.create_index("i")
    with pytest.raises(RuntimeError, match="url"):
        c.save_index("i")


def test_client_with_url_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(200, 8)).astype(np.float32)
    c = Client(url=str(tmp_path))
    idx = c.create_index("idx", index_type="flat", capacity=256)
    idx.fit(data)
    c.save_index("idx")

    col = c.create_collection("col")
    items = [(f"u{i}", f"doc {i}", data[i], {"k": i % 2}) for i in range(50)]
    col.insert(items)
    c.save_collection("col")

    c2 = Client(url=str(tmp_path))
    assert sorted(c2.list_indices()) == ["idx"]
    assert sorted(c2.list_collections()) == ["col"]
    got = c2.get_index("idx").batch_search(data[:5], 1, ef_search=10)
    assert (got[:, 0] == np.arange(5)).all()
    res = c2.get_collection("col").batch_query(data[:2], 3, ef_search=10)
    assert res["id"][0][0] == "u0"
