"""Collection — document store joined to a vector index.

Behavioral parity with /root/reference/python/src/alayalite/collection.py
(:33-297): a pandas DataFrame of (id, document, metadata) plus
outer-uuid ↔ inner-index-id maps over an Index; items are
``(id, document, embedding, metadata)`` tuples. ``reindex()`` rebuilds the
index from live rows and remaps ids; save/load pickles the frame + maps next
to the index blobs, tagged ``type: collection`` in schema.json.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import List, Optional

import numpy as np
import pandas as pd

from .index_api import Index
from .params import IndexParams


def _assert(cond: bool, msg: str) -> None:
    if not cond:
        raise ValueError(msg)


class Collection:
    def __init__(self, name: str, index_params: Optional[IndexParams] = None):
        self._name = name
        self._index_params = index_params if index_params is not None else IndexParams()
        self._index: Optional[Index] = None
        self._df = pd.DataFrame(columns=["id", "document", "metadata"])
        self._outer_inner = {}
        self._inner_outer = {}

    @property
    def name(self) -> str:
        return self._name

    # ---- queries ----
    def batch_query(self, vectors, limit: int, ef_search: int = 100,
                    num_threads: int = 1) -> dict:
        _assert(self._index is not None, "Index is not initialized yet")
        v = np.asarray(vectors, dtype=np.float32)
        _assert(v.size > 0, "vectors must not be empty")
        _assert(v.shape[-1] == self._index.get_dim(),
                "Vector dimension must match the index dimension.")
        _assert(ef_search >= limit, "ef_search must be >= limit")
        ids, dists = self._index.batch_search_with_distance(
            np.atleast_2d(v), limit, ef_search, num_threads)
        return self._join_results(ids, dists)

    def _join_results(self, ids, dists) -> dict:
        """Join internal-id results to documents (shared by the direct and
        micro-batched serving paths)."""
        ret = {"id": [], "document": [], "metadata": [], "distance": []}
        by_id = self._df.set_index("id")
        for row_ids, row_d in zip(ids, dists):
            # filter ids and distances with the SAME mask so a dropped id
            # mid-list can't shift distances onto the wrong document
            pairs = [(self._inner_outer[i], float(d))
                     for i, d in zip(row_ids, row_d)
                     if i in self._inner_outer]
            if not pairs:
                for k in ret:
                    ret[k].append([])
                continue
            uuids = [u for u, _ in pairs]
            sub = by_id.loc[uuids].reset_index()
            ret["id"].append(sub["id"].tolist())
            ret["document"].append(sub["document"].tolist())
            ret["metadata"].append(sub["metadata"].tolist())
            ret["distance"].append([d for _, d in pairs])
        return ret

    def filter_query(self, metadata_filter: dict,
                     limit: Optional[int] = None) -> dict:
        mask = self._df["metadata"].apply(
            lambda m: all(m.get(k) == v for k, v in metadata_filter.items()))
        sub = self._df[mask]
        if limit is not None:
            sub = sub.head(limit)
        return sub.to_dict(orient="list")

    def get_by_id(self, ids: List[str]) -> dict:
        sub = self._df[self._df["id"].isin(ids)]
        return sub.to_dict(orient="list")

    # ---- mutation ----
    def insert(self, items: List[tuple]) -> None:
        """items: [(id, document, embedding, metadata), ...]."""
        if not items:
            return
        dup = [it[0] for it in items if it[0] in self._outer_inner]
        _assert(not dup, f"ids already exist: {dup[:5]}")
        if self._index is None:
            emb = np.asarray([it[2] for it in items], dtype=np.float32)
            self._index = Index(self._name, self._index_params)
            self._index.fit(emb)
            inner_ids = list(range(len(items)))
        else:
            emb = np.asarray([it[2] for it in items], dtype=np.float32)
            inner = self._index.insert(emb)
            inner_ids = [int(inner)] if np.isscalar(inner) else [int(x) for x in np.atleast_1d(inner)]
        rows = []
        for (item_id, document, _e, metadata), inner_id in zip(items, inner_ids):
            rows.append({"id": item_id, "document": document,
                         "metadata": metadata})
            self._outer_inner[item_id] = inner_id
            self._inner_outer[inner_id] = item_id
        self._df = pd.concat([self._df, pd.DataFrame(rows)],
                             ignore_index=True)

    def upsert(self, items: List[tuple]) -> None:
        to_update = [it for it in items if it[0] in self._outer_inner]
        to_insert = [it for it in items if it[0] not in self._outer_inner]
        for item_id, document, embedding, metadata in to_update:
            inner = self._outer_inner.pop(item_id)
            self._inner_outer.pop(inner, None)
            self._index.remove(inner)
            self._df = self._df[self._df["id"] != item_id]
            to_insert.append((item_id, document, embedding, metadata))
        if to_insert:
            self.insert(to_insert)

    def delete_by_id(self, ids: List[str]) -> None:
        for item_id in ids:
            inner = self._outer_inner.pop(item_id, None)
            if inner is None:
                continue
            self._inner_outer.pop(inner, None)
            if self._index is not None:
                self._index.remove(inner)
        self._df = self._df[~self._df["id"].isin(ids)].reset_index(drop=True)

    def delete_by_filter(self, metadata_filter: dict) -> None:
        mask = self._df["metadata"].apply(
            lambda m: all(m.get(k) == v for k, v in metadata_filter.items()))
        self.delete_by_id(self._df[mask]["id"].tolist())

    def reindex(self) -> None:
        """Rebuild the index over live rows, remapping inner ids
        (reference: collection.py:203-235)."""
        if self._index is None or len(self._df) == 0:
            return
        # ONE device gather for all live rows — per-row get_data_by_id
        # costs a ~35 ms dispatch each through a TPU tunnel (minutes at
        # 10k rows)
        import jax.numpy as jnp

        inner = np.array([self._outer_inner[item_id]
                          for item_id in self._df["id"]], dtype=np.int32)
        space = self._index._engine.space
        embeddings = np.asarray(
            space.data[jnp.asarray(inner)].astype(jnp.float32))
        self._index = Index(self._name, self._index_params)
        self._index.fit(embeddings)
        self._outer_inner = {item_id: i for i, item_id in enumerate(self._df["id"])}
        self._inner_outer = {i: item_id for item_id, i in self._outer_inner.items()}

    # ---- config ----
    def set_metric(self, metric: str) -> None:
        if self._index is not None:
            raise RuntimeError("Cannot change metric after index is created")
        from .params import MetricType

        self._index_params.metric = MetricType.parse(metric)

    def get_index_params(self) -> IndexParams:
        return self._index_params

    # ---- persistence ----
    def save(self, url) -> dict:
        os.makedirs(url, exist_ok=True)
        with open(os.path.join(url, "collection.pkl"), "wb") as f:
            pickle.dump({
                "dataframe": self._df,
                "outer_inner_map": self._outer_inner,
                "inner_outer_map": self._inner_outer,
            }, f)
        _assert(self._index is not None, "Index is not initialized yet")
        schema = self._index.save(url)
        schema["type"] = "collection"
        with open(os.path.join(url, "schema.json"), "w") as f:
            json.dump(schema, f, indent=4)
        return schema

    @classmethod
    def load(cls, url, name: str) -> "Collection":
        directory = os.path.join(url, name)
        if not os.path.exists(directory):
            raise RuntimeError(f"Collection {name} does not exist")
        with open(os.path.join(directory, "schema.json")) as f:
            schema = json.load(f)
        if schema.get("type") != "collection":
            raise RuntimeError(f"{name} is not a collection")
        inst = cls(name)
        with open(os.path.join(directory, "collection.pkl"), "rb") as f:
            data = pickle.load(f)
        inst._df = data["dataframe"]
        inst._outer_inner = data["outer_inner_map"]
        inst._inner_outer = data["inner_outer_map"]
        inst._index = Index.load(url, name)
        inst._index_params = inst._index.get_params()
        return inst
