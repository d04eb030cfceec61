"""ShardedEngine — the db-sharded index behind the SDK.

Folds the multi-chip classes (parallel/sharded.py) into the Client/Index
contract (round-2 verdict #3): ``IndexParams(db_shards=N)`` makes
Index/Client create, save, load, insert into, and remove from a
row-partitioned index with the same schema.json + npz persistence layout —
the reference threads its scaling knob (num_threads) through the same SDK
surface (python/src/alayalite/index.py:145-162, client.py:251-294).

Design: N single-device ``IndexEngine`` shards own mutation (insert /
remove / compaction reuse the whole single-chip machinery verbatim);
search fans out over a ("dp", "db") mesh with one ICI all_gather top-k
merge (db_sharded_flat_search / db_sharded_block_search). With fewer JAX
devices than shards, search falls back to sequential per-shard dispatch +
host merge — same results, so a sharded index is usable anywhere (CI, a
single chip, a pod).

Ids: the engine keeps an explicit global⇄(shard, local) mapping so global
ids are stable row positions at fit (0..n-1, reference semantics) and keep
growing across inserts regardless of which shard absorbed the row.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import List, Optional, Tuple, Union

import numpy as np

from ..params import IndexParams, IndexType, QuantizationType

log = logging.getLogger("alayalite_tpu")

_MAPFILE = "shard_map.npz"

# single-engine packed-id ceiling (params.py capacity guard): beyond this a
# sharded engine allocates per-shard slabs on demand instead of eagerly
_PACKED_ID_MAX = 2**30 - 1


class _GidMap:
    """global id → (shard, local). Dense arrays cover the contiguous-from-
    zero id range (grown by doubling while new ids stay within 2× the
    current window — the fit/insert regime); ids far beyond it (a counter
    that has outrun the live rows, e.g. past 2³¹ after heavy churn) spill
    to a dict so the map never costs memory proportional to the id
    *counter*, only to the rows that exist. This is the host-side analog of
    the reference's u64 id instantiation (dispatch.hpp:25-175): ids are
    arbitrary int64, storage scales with occupancy."""

    def __init__(self, n: int = 0):
        self.s = np.full(n, -1, np.int32)
        self.l = np.full(n, -1, np.int32)
        self.over: dict = {}

    def set_many(self, gids: np.ndarray, shard, locals_) -> None:
        gids = np.asarray(gids, dtype=np.int64)
        if gids.size == 0:
            return
        shard = np.broadcast_to(np.asarray(shard, np.int32), gids.shape)
        locals_ = np.broadcast_to(np.asarray(locals_, np.int32), gids.shape)
        hi = int(gids.max())
        if hi >= self.s.size:
            want = hi + 1
            if want <= max(2 * self.s.size, 1 << 20):
                new = max(want, 2 * self.s.size, 1 << 12)  # amortized O(1)
                grown_s = np.full(new, -1, np.int32)
                grown_l = np.full(new, -1, np.int32)
                grown_s[: self.s.size] = self.s
                grown_l[: self.l.size] = self.l
                self.s, self.l = grown_s, grown_l
        dense = gids < self.s.size
        self.s[gids[dense]] = shard[dense]
        self.l[gids[dense]] = locals_[dense]
        for g, sh, lc in zip(gids[~dense].tolist(),
                             shard[~dense].tolist(),
                             locals_[~dense].tolist()):
            self.over[g] = (sh, lc)

    def lookup(self, gids: np.ndarray):
        """→ (shard[int32], local[int32]), -1 where unknown."""
        gids = np.asarray(gids, dtype=np.int64)
        ss = np.full(gids.shape, -1, np.int32)
        ll = np.full(gids.shape, -1, np.int32)
        dense = (gids >= 0) & (gids < self.s.size)
        ss[dense] = self.s[gids[dense]]
        ll[dense] = self.l[gids[dense]]
        if self.over:
            far = np.nonzero(gids >= self.s.size)[0]
            for i in far.tolist():
                sh, lc = self.over.get(int(gids[i]), (-1, -1))
                ss[i], ll[i] = sh, lc
        return ss, ll

    def state(self) -> dict:
        og = np.fromiter(self.over.keys(), np.int64, len(self.over))
        ov = np.array([self.over[g] for g in og], np.int32).reshape(-1, 2)
        return {"g2s": self.s, "g2l": self.l,
                "over_gids": og, "over_vals": ov}

    @classmethod
    def from_state(cls, z) -> "_GidMap":
        m = cls(0)
        m.s = np.asarray(z["g2s"], np.int32)
        m.l = np.asarray(z["g2l"], np.int32)
        if "over_gids" in z:
            og = np.asarray(z["over_gids"], np.int64)
            ov = np.asarray(z["over_vals"], np.int32).reshape(-1, 2)
            m.over = {int(g): (int(s), int(l))
                      for g, (s, l) in zip(og, ov)}
        return m


class ShardedEngine:
    """Same duck-type surface as index.engine.IndexEngine."""

    def __init__(self, params: IndexParams):
        if params.db_shards < 2:
            raise ValueError("ShardedEngine requires db_shards >= 2")
        self.params = params
        self.ndb = int(params.db_shards)
        self.per_cap = -(-params.capacity // self.ndb)
        # beyond the single-engine packed-id range, capacity is VIRTUAL:
        # per-shard slabs are sized on demand at fit (2x headroom) instead
        # of eagerly — a 2^31+ collection declares its ceiling without
        # allocating it (the slabs, like the reference's SequentialStorage,
        # are fixed once built; inserts route to shards with room)
        self._lazy = self.per_cap > 0 and params.capacity > _PACKED_ID_MAX
        self.shards: List = [self._make_shard() for _ in range(self.ndb)]
        self._fitted = False
        self._l2g: List[np.ndarray] = [np.full(0, -1, np.int64)
                                       for _ in range(self.ndb)]
        self._gid_map = _GidMap(0)
        self._next_gid = 0
        self._leaves = None          # cached device-sharded search state
        self._leaves_version = None
        self._l2g_flat_cache = None

    def _make_shard(self, alloc_cap: Optional[int] = None):
        from ..index.engine import IndexEngine

        cap = alloc_cap if alloc_cap is not None else (
            min(self.per_cap, 4096) if self._lazy else self.per_cap)
        p = dataclasses.replace(self.params, capacity=cap, db_shards=1)
        return IndexEngine(p)

    # ------------------------------------------------------------------ fit
    def fit(self, vectors: np.ndarray, ef_construction: Optional[int] = None,
            num_threads: int = 1) -> None:
        v = np.asarray(vectors, dtype=np.float32)
        if v.ndim != 2:
            raise ValueError("fit expects a 2-D array [n, dim]")
        n = v.shape[0]
        if n > self.ndb * self.per_cap:
            self.per_cap = -(-n // self.ndb)
            self.shards = [self._make_shard() for _ in range(self.ndb)]
        if n < self.ndb:
            raise ValueError(
                f"fit of {n} vectors cannot fill db_shards={self.ndb} "
                "shards; lower db_shards or fit more vectors")
        # contiguous balanced chunks: global id == original row position
        # (reference semantics: fit assigns ids 0..n-1)
        chunks = np.array_split(v, self.ndb)
        if self._lazy:
            # demand-sized equal slabs (equal: the mesh path row-shards the
            # concatenation over "db"): fitted rows + 2x insert headroom
            alloc = min(self.per_cap,
                        max(2 * max(c.shape[0] for c in chunks), 4096))
            self.shards = [self._make_shard(alloc) for _ in range(self.ndb)]
        # refit always resets the id maps: a second fit with smaller n
        # must not leave stale gid-map rows from the first fit, or
        # remove(old_gid) would tombstone a live row of the new index
        self._gid_map = _GidMap(n)
        self._l2g = [np.full(0, -1, np.int64) for _ in range(self.ndb)]
        off = 0
        for s, rows in enumerate(chunks):
            self.shards[s].fit(rows, ef_construction=ef_construction)
            self._register_fit_chunk(s, rows.shape[0], off)
            off += rows.shape[0]
        self._next_gid = n
        self._fitted = True
        self._leaves = None
        self._l2g_flat_cache = None

    def _register_fit_chunk(self, s: int, n_rows: int, off: int) -> None:
        """Record shard s's fitted rows as global ids off..off+n_rows-1
        (shared with parallel.multihost.fit_shards_from_file)."""
        gids = off + np.arange(n_rows, dtype=np.int64)
        self._l2g[s] = np.full(self.shards[s].space.capacity, -1, np.int64)
        self._l2g[s][:n_rows] = gids
        self._gid_map.set_many(gids, s, np.arange(n_rows, dtype=np.int32))
        self._l2g_flat_cache = None

    # --------------------------------------------------------------- search
    def _require_fitted(self):
        if not self._fitted:
            raise RuntimeError("index is not fitted")

    @property
    def _id_dtype(self):
        return (np.int64 if self.params.id_type in ("uint64", "int64")
                else np.int32)

    def _mesh(self):
        """("dp"=1, "db"=ndb) mesh when enough devices exist, else None."""
        import jax

        devs = jax.devices()
        if len(devs) < self.ndb:
            return None
        from .sharded import make_mesh

        return make_mesh(n_devices=self.ndb, dp=1, devices=devs)

    def _version(self):
        # host-tracked only: every mutating path here (fit/insert/remove/
        # compact) already drops self._leaves, and per-shard _mutations
        # catches engine-internal rewires. int(sh.space.num) would be a
        # blocking device->host sync per shard per SEARCH (~35 ms each
        # through the TPU tunnel) for a check the invalidation covers.
        return tuple(getattr(sh, "_mutations", 0) for sh in self.shards)

    def _assemble_leaves(self, mesh):
        """Concatenate per-shard space arrays and place them row-sharded
        over the mesh's "db" axis (cached until a shard mutates)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self._leaves is not None and self._leaves_version == self._version():
            return self._leaves
        put = lambda arrs, spec: jax.device_put(  # noqa: E731
            jnp.concatenate([jnp.asarray(a) for a in arrs]),
            NamedSharding(mesh, spec))
        if self.params.index_type is IndexType.FLAT:
            from ..spaces.raw import RawSpace

            sp0 = self.shards[0].space
            space = RawSpace(
                data=put([sh.space.data for sh in self.shards],
                         P("db", None)),
                sq_norms=put([sh.space.sq_norms for sh in self.shards],
                             P("db")),
                valid=put([sh.space.valid for sh in self.shards], P("db")),
                num=jnp.asarray(sum(sh.space.capacity
                                    for sh in self.shards), jnp.int32),
                metric=sp0.metric, user_metric=sp0.user_metric,
                bf16=sp0.bf16)
            self._leaves = space
        else:  # block (bsq8)
            eps = []
            for sh in self.shards:
                e = np.zeros(8, np.int32)
                eg = np.asarray(sh.graph.eps)
                e[: min(len(eg), 8)] = np.clip(eg[:8], 0,
                                               sh.space.capacity - 1)
                eps.append(e[None])
            self._leaves = (
                put([sh.search_space.data for sh in self.shards],
                    P("db", None)),
                put([sh.search_space.sq_norms for sh in self.shards],
                    P("db")),
                put([np.asarray(sh.search_space.dmin)[None]
                     for sh in self.shards], P("db", None)),
                put([np.asarray(sh.search_space.scale)[None]
                     for sh in self.shards], P("db", None)),
                put([sh.search_space.nbr_ids for sh in self.shards],
                    P("db", None)),
                put([sh.search_space.nbr_codes for sh in self.shards],
                    P("db", None, None)),
                put([sh.search_space.nbr_xsq for sh in self.shards],
                    P("db", None)),
                put([sh.space.valid for sh in self.shards], P("db")),
                put([np.asarray(e) for e in eps], P("db", None)),
            )
        self._leaves_version = self._version()
        return self._leaves

    def _l2g_flat(self) -> np.ndarray:
        """Concatenated per-shard l2g tables, aligned with the row layout
        _assemble_leaves concatenates (cached; mutations invalidate)."""
        if self._l2g_flat_cache is None:
            self._l2g_flat_cache = (np.concatenate(self._l2g)
                                    if self._l2g else np.full(0, -1,
                                                              np.int64))
        return self._l2g_flat_cache

    def _remap(self, ids: np.ndarray) -> np.ndarray:
        """Device results use combined ids (row offset in the concatenated
        shard slabs); translate to stable global ids via the l2g table."""
        flat = self._l2g_flat()
        safe = np.clip(ids, 0, max(flat.size - 1, 0))
        return np.where(ids >= 0, flat[safe], -1)

    def batch_search_with_distance(
        self, queries: np.ndarray, topk: int, ef: int = 100,
        num_threads: int = 1,
    ) -> Tuple[np.ndarray, np.ndarray]:
        del num_threads
        self._require_fitted()
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        mesh = self._mesh()
        if mesh is None or not (
                self.params.index_type is IndexType.FLAT
                or self.params.quantization_type.is_block):
            # the mesh path assembles FLAT slabs or block (nbr_ids/codes)
            # layouts; plain hnsw/nsg search spaces have neither — serve
            # them per-shard + host merge (identical results)
            return self._search_fallback(q, topk, ef)
        import jax.numpy as jnp

        if self.params.index_type is IndexType.FLAT:
            from .sharded import db_sharded_flat_search

            space = self._assemble_leaves(mesh)
            d, i = db_sharded_flat_search(
                mesh, space, space.prep_query(jnp.asarray(q)), topk,
                bf16=self.params.flat_mode == "fast")
        else:
            from .sharded import db_sharded_block_search

            leaves = self._assemble_leaves(mesh)
            d, i = db_sharded_block_search(
                mesh, leaves, self.params.metric.value, jnp.asarray(q),
                k=topk, ef=max(int(ef), topk),
                n_expand=self.params.beam_expand)
        ids = self._remap(np.asarray(i))
        d = np.where(ids >= 0, np.asarray(d), np.inf)
        if (self.params.index_type is not IndexType.FLAT
                and self.params.metric.value == "cos"):
            # block spaces score squared L2 of normalized vectors
            # (2 − 2cos); match the engine's −cos convention (the
            # per-shard fallback inherits it from IndexEngine)
            d = np.where(np.isfinite(d), d / 2.0 - 1.0, d)
        return ids.astype(self._id_dtype, copy=False), d

    def _search_fallback(self, q, topk: int, ef: int):
        """Sequential per-shard search + host top-k merge (identical
        results to the mesh path; used when devices < db_shards)."""
        all_d, all_i = [], []
        for s, sh in enumerate(self.shards):
            ids, d = sh.batch_search_with_distance(q, topk, ef=ef)
            ids = np.asarray(ids, dtype=np.int64)
            tbl = self._l2g[s]
            gl = np.where(ids >= 0,
                          tbl[np.clip(ids, 0, tbl.size - 1)], -1)
            all_i.append(gl)
            all_d.append(np.where(gl >= 0, np.asarray(d), np.inf))
        dd = np.concatenate(all_d, axis=1)
        ii = np.concatenate(all_i, axis=1)
        sel = np.argsort(dd, axis=1, kind="stable")[:, :topk]
        out_d = np.take_along_axis(dd, sel, axis=1)
        out_i = np.take_along_axis(ii, sel, axis=1)
        out_i = np.where(np.isfinite(out_d), out_i, -1)
        return out_i.astype(self._id_dtype, copy=False), out_d

    def batch_search(self, queries, topk: int, ef: int = 100,
                     num_threads: int = 1) -> np.ndarray:
        ids, _ = self.batch_search_with_distance(queries, topk, ef,
                                                 num_threads)
        return ids

    def search(self, query, topk: int, ef: int = 100) -> np.ndarray:
        return self.batch_search(np.atleast_2d(query), topk, ef)[0]

    def search_with_distance(self, query, topk: int, ef: int = 100):
        ids, d = self.batch_search_with_distance(np.atleast_2d(query),
                                                 topk, ef)
        return ids[0], d[0]

    # --------------------------------------------------------------- update
    def insert(self, vectors, ef: int = 100) -> np.ndarray:
        """Route each batch slice to the emptiest shards; per-shard inserts
        reuse the single-chip GraphUpdateJob machinery wholesale."""
        self._require_fitted()
        v = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        out = np.full(v.shape[0], -1, np.int64)
        remaining = np.arange(v.shape[0])
        order = np.argsort(
            [-(sh.space.capacity - int(sh.space.num))
             for sh in self.shards], kind="stable")
        for s in order:
            if remaining.size == 0:
                break
            sh = self.shards[s]
            free = sh.space.capacity - int(sh.space.num)
            if free <= 0:
                continue
            take = remaining[:free]
            local = np.asarray(sh.insert(v[take], ef=ef), dtype=np.int64)
            ok = local >= 0
            gids = self._next_gid + np.arange(int(ok.sum()), dtype=np.int64)
            self._next_gid += int(ok.sum())
            self._l2g[s][local[ok]] = gids
            self._gid_map.set_many(gids, s, local[ok].astype(np.int32))
            out[take[ok]] = gids
            remaining = remaining[free:]
        self._leaves = None
        self._l2g_flat_cache = None
        return out.astype(self._id_dtype, copy=False)

    def remove(self, ids) -> None:
        self._require_fitted()
        gids = np.atleast_1d(np.asarray(ids, dtype=np.int64))
        ss, ll = self._gid_map.lookup(gids)
        for s in range(self.ndb):
            loc = ll[ss == s]
            if loc.size:
                self.shards[s].remove(loc.astype(np.int32))
        self._leaves = None

    def compact(self) -> None:
        """Rewire every shard around its accumulated tombstones."""
        self._require_fitted()
        for sh in self.shards:
            sh.compact()
        self._leaves = None

    def get_data_by_id(self, id_: int) -> np.ndarray:
        self._require_fitted()
        ss, ll = self._gid_map.lookup(np.asarray([int(id_)]))
        s, l = int(ss[0]), int(ll[0])
        if s < 0:
            raise ValueError(f"unknown id {id_}")
        return self.shards[s].get_data_by_id(l)

    @property
    def num(self) -> int:
        return sum(int(sh.space.num) for sh in self.shards) if self._fitted else 0

    @property
    def capacity(self) -> int:
        return self.ndb * self.per_cap

    @property
    def space(self):
        """Shard-0 space (dim/dtype introspection by the SDK façade)."""
        return self.shards[0].space

    # ---------------------------------------------------------- persistence
    def save(self, directory: Union[str, os.PathLike]) -> None:
        """Per-shard subdirectories (each a complete single-device index
        with its own schema.json) + the id-mapping blob. The top-level
        schema.json (with db_shards) is written by Index.save — the same
        split as the reference's Client/Index contract."""
        self._require_fitted()
        os.makedirs(directory, exist_ok=True)
        for s, sh in enumerate(self.shards):
            sub = os.path.join(directory, f"shard_{s:02d}")
            os.makedirs(sub, exist_ok=True)
            with open(os.path.join(sub, "schema.json"), "w") as f:
                f.write(sh.params.to_json())
            sh.save(sub)
        state = {f"l2g_{s}": self._l2g[s] for s in range(self.ndb)}
        state.update(self._gid_map.state())
        np.savez(os.path.join(directory, _MAPFILE),
                 next_gid=np.int64(self._next_gid), **state)

    @classmethod
    def load(cls, directory: Union[str, os.PathLike]) -> "ShardedEngine":
        from ..index.engine import IndexEngine

        with open(os.path.join(directory, "schema.json")) as f:
            params = IndexParams.from_dict(json.load(f))
        eng = cls(params)
        eng.shards = [
            IndexEngine.load(os.path.join(directory, f"shard_{s:02d}"))
            for s in range(eng.ndb)]
        if not eng._lazy:
            eng.per_cap = eng.shards[0].space.capacity
        with np.load(os.path.join(directory, _MAPFILE)) as z:
            if "l2g" in z:  # pre-round-4 layout: one [ndb, per_cap] table
                old = np.asarray(z["l2g"], np.int64)
                eng._l2g = [old[s] for s in range(eng.ndb)]
                eng._gid_map = _GidMap(0)
                eng._gid_map.s = np.asarray(z["g2s"], np.int32)
                eng._gid_map.l = np.asarray(z["g2l"], np.int32)
            else:
                eng._l2g = [np.asarray(z[f"l2g_{s}"], np.int64)
                            for s in range(eng.ndb)]
                eng._gid_map = _GidMap.from_state(z)
            eng._next_gid = int(z["next_gid"])
        eng._fitted = True
        return eng
