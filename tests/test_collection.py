"""Collection CRUD / query semantics — analog of python/tests/test_collection.py."""

import numpy as np
import pytest

from alayalite_tpu import Collection, IndexParams


def _items(n, dim=8, seed=0, prefix="id"):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    return [(f"{prefix}{i}", f"document {i}", emb[i], {"even": i % 2 == 0})
            for i in range(n)], emb


def test_insert_and_batch_query():
    col = Collection("c", IndexParams(index_type="flat", capacity=256))
    items, emb = _items(64)
    col.insert(items)
    res = col.batch_query(emb[:4], 3, ef_search=10)
    assert res["id"][0][0] == "id0"
    assert res["document"][1][0] == "document 1"
    assert len(res["distance"][0]) == 3
    assert res["distance"][0][0] == pytest.approx(0.0, abs=1e-4)


def test_duplicate_insert_rejected():
    col = Collection("c", IndexParams(index_type="flat", capacity=64))
    items, _ = _items(8)
    col.insert(items)
    with pytest.raises(ValueError):
        col.insert(items[:1])


def test_filter_query_and_get_by_id():
    col = Collection("c", IndexParams(index_type="flat", capacity=64))
    items, _ = _items(10)
    col.insert(items)
    res = col.filter_query({"even": True})
    assert len(res["id"]) == 5
    res2 = col.filter_query({"even": True}, limit=2)
    assert len(res2["id"]) == 2
    got = col.get_by_id(["id3", "id4"])
    assert sorted(got["id"]) == ["id3", "id4"]


def test_upsert_replaces():
    col = Collection("c", IndexParams(index_type="flat", capacity=64))
    items, emb = _items(8)
    col.insert(items)
    newvec = np.full(8, 9.0, dtype=np.float32)
    col.upsert([("id0", "updated doc", newvec, {"even": False})])
    res = col.batch_query(newvec[None, :], 1, ef_search=10)
    assert res["id"][0][0] == "id0"
    assert res["document"][0][0] == "updated doc"


def test_delete_by_id_and_filter():
    col = Collection("c", IndexParams(index_type="flat", capacity=64))
    items, emb = _items(10)
    col.insert(items)
    col.delete_by_id(["id0"])
    res = col.batch_query(emb[:1], 1, ef_search=10)
    assert res["id"][0][0] != "id0"
    col.delete_by_filter({"even": True})
    assert len(col.filter_query({"even": True})["id"]) == 0


def test_reindex():
    col = Collection("c", IndexParams(index_type="flat", capacity=64))
    items, emb = _items(16)
    col.insert(items)
    col.delete_by_id([f"id{i}" for i in range(8)])
    col.reindex()
    res = col.batch_query(emb[8:10], 1, ef_search=10)
    assert res["id"][0][0] == "id8"
    assert res["id"][1][0] == "id9"


def test_set_metric_guard():
    col = Collection("c")
    col.set_metric("cos")
    items, _ = _items(4)
    col.insert(items)
    with pytest.raises(RuntimeError):
        col.set_metric("l2")


def test_join_results_alignment_with_missing_ids():
    """Distances must stay paired with their documents when an internal id
    is missing from the uuid map mid-list (regression: positional
    truncation paired distances with the wrong document)."""
    col = Collection("c", IndexParams(index_type="flat", capacity=64))
    emb = np.eye(4, 8, dtype=np.float32)
    col.insert([(f"u{i}", f"doc {i}", emb[i], {}) for i in range(4)])
    # fake a search result whose middle id (7) is unknown to the collection
    ids = np.array([[0, 7, 2]], dtype=np.int32)
    dists = np.array([[0.0, 0.5, 2.0]], dtype=np.float32)
    res = col._join_results(ids, dists)
    assert res["id"][0] == ["u0", "u2"]
    assert res["distance"][0] == [0.0, 2.0]  # 2.0 pairs with u2, not 0.5
