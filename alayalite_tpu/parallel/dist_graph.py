"""ONE graph larger than one chip's HBM: data-sharded serving.

The reference scales a single index with host RAM via u64 storage
templates (python/include/dispatch.hpp:25-175) — one process, one graph,
memory is the only limit. The TPU answer composed here:

  - the raw slab is row-sharded over a ("db",) mesh at FIT time (host →
    per-device slices; the full slab never exists on any one device),
  - the base adjacency is built by the mesh-sharded single-graph builder
    (parallel/build_sharded.py, ring-rotating data shards),
  - connectivity repair runs with a DISTRIBUTED nearest-reached scan
    (the only full-slab pass the repair loop needs),
  - serving runs the SAME lockstep beam as a single-chip graph
    (index/search.py::beam_search) inside shard_map over a space shim
    whose gather_dists computes each shard's owned candidates and merges
    with one cheap psum per hop ([B, M*R] f32 — a few MB over ICI).

Because the adjacency (int32, ~N*R*4 bytes — 128 MB at 1M x 32) is
replicated while the fat payload (vectors — 3.8 GB at 1M x 960 f32) is
sharded, capacity scales ~linearly with the mesh until the adjacency
itself dominates. Traversal is IDENTICAL to the single-device beam
(same graph, same pool semantics, exact distances), so recall parity is
by construction, not by tuning.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import IndexParams

log = logging.getLogger("alayalite_tpu")

FINF = float("inf")


@flax.struct.dataclass
class DistSlab:
    """Space shim for beam_search over a row-sharded slab: every shard
    scores the candidates it owns; one psum("db") merges. Exactly-one-owner
    means the float sum is exact (everyone else contributes 0.0)."""

    data: jax.Array        # [rows, D] this shard's slice
    sq_norms: jax.Array    # [rows]
    offset: jax.Array      # scalar i32: global row id of local row 0
    n_total: jax.Array     # scalar i32: global live rows
    metric: str = flax.struct.field(pytree_node=False, default="l2")
    axis: str = flax.struct.field(pytree_node=False, default="db")

    @property
    def capacity(self) -> int:
        return self.data.shape[0]  # only used for clip bounds

    def gather_dists(self, q: jax.Array, ids: jax.Array) -> jax.Array:
        rows = self.data.shape[0]
        local = ids - self.offset
        own = (local >= 0) & (local < rows)
        # unowned ids gather row 0 (one hot line) — per-shard HBM gather
        # traffic concentrates on the ~1/P owned subset
        safe = jnp.where(own, local, 0)
        vecs = self.data[safe]
        dot = jnp.einsum("bkd,bd->bk", vecs, q,
                         preferred_element_type=jnp.float32)
        if self.metric == "ip":
            d = -dot
        else:
            q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
            d = jnp.maximum(q_sq + self.sq_norms[safe] - 2.0 * dot, 0.0)
        d = jax.lax.psum(jnp.where(own, d, 0.0), self.axis)
        in_range = (ids >= 0) & (ids < self.n_total)
        return jnp.where(in_range, d, FINF)


_SEARCH_CACHE: dict = {}


def _make_dist_search(mesh: Mesh, k: int, ef: int, metric: str,
                      n_expand: int, max_iters: int, with_seed: bool):
    from ..index.search import beam_search, scan_seeds

    has_dp = "dp" in mesh.axis_names
    qspec = P("dp", None) if has_dp else P(None)
    in_specs = [qspec, P("db", None), P("db"), P(None), P(None, None),
                P(None)]
    if with_seed:
        in_specs.append((P(None), P(None), P(None)))

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=(qspec, qspec), check_vma=False)
    def _search(q, data, sq, valid, nbrs, eps, *seed_arrays):
        rows = data.shape[0]
        offset = jax.lax.axis_index("db").astype(jnp.int32) * rows
        space = DistSlab(data=data, sq_norms=sq,
                         offset=offset,
                         n_total=jnp.sum(valid.astype(jnp.int32)),
                         metric=metric)
        if seed_arrays:
            seeds = scan_seeds(q, *seed_arrays[0])
        else:
            seeds = jnp.broadcast_to(eps[None, :],
                                     (q.shape[0], eps.shape[0]))
        return beam_search(space, nbrs, seeds, q, k=k, ef=ef,
                           valid=valid, n_expand=n_expand,
                           max_iters=max_iters)

    return _search


def dist_graph_search(mesh: Mesh, data_sh, sq_sh, valid_rep, nbrs_rep,
                      eps_rep, queries: jax.Array, k: int, ef: int,
                      metric: str = "l2", n_expand: int = 8,
                      max_iters: int = 0, seed_sample=None):
    """Lockstep beam over ONE global graph with the slab row-sharded.

    data/sq row-sharded over "db"; nbrs/valid/eps replicated; queries
    sharded over "dp" when the mesh has that axis, replicated otherwise.
    Returns (dists [B, k], ids [B, k] GLOBAL ids) — no remap needed.
    """
    key = (id(mesh), tuple(mesh.shape.items()), k, ef, metric, n_expand,
           max_iters, seed_sample is not None)
    if key not in _SEARCH_CACHE:
        _SEARCH_CACHE[key] = _make_dist_search(
            mesh, k, ef, metric, n_expand, max_iters,
            seed_sample is not None)
    args = [queries, data_sh, sq_sh, valid_rep, nbrs_rep, eps_rep]
    if seed_sample is not None:
        args.append(tuple(seed_sample))
    return _SEARCH_CACHE[key](*args)


def _nearest_reached_factory(mesh, data_sh, sq_sh, host_data, metric: str):
    """nearest_fn for nsg._attach_unreached: nearest REACHED node of each
    representative, computed as a distributed flat scan over the sharded
    slab (argmin + all_gather merge) — the repair loop's only full-slab
    pass, so the full slab never lands on one device."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, None), P("db", None), P("db"), P(None)),
        out_specs=P(None, None), check_vma=False)
    def _scan(q, data, sq, reach):
        rows = data.shape[0]
        off = jax.lax.axis_index("db").astype(jnp.int32) * rows
        dot = jnp.einsum("qd,nd->qn", q, data,
                         preferred_element_type=jnp.float32)
        if metric == "ip":
            d = -dot
        else:
            d = sq[None, :] - 2.0 * dot  # rank-equal to true L2
        ok = jax.lax.dynamic_slice_in_dim(reach, off, rows)
        d = jnp.where(ok[None, :], d, FINF)
        j = jnp.argmin(d, axis=1)
        best = jnp.take_along_axis(d, j[:, None], axis=1)
        gid = jnp.where(jnp.isfinite(best),
                        (j.astype(jnp.int32) + off)[:, None], -1)
        db = jax.lax.all_gather(best, "db", axis=1).reshape(q.shape[0], -1)
        gi = jax.lax.all_gather(gid, "db", axis=1).reshape(q.shape[0], -1)
        jj = jnp.argmin(db, axis=1)[:, None]
        return jnp.take_along_axis(gi, jj, axis=1)

    def nearest(rep_ids: np.ndarray, reached: np.ndarray) -> np.ndarray:
        qs_dev = jnp.asarray(np.ascontiguousarray(host_data[rep_ids]))
        npad = data_sh.shape[0]
        reach_rep = jnp.asarray(np.pad(reached, (0, npad - reached.size)))
        src = _scan(qs_dev, data_sh, sq_sh, reach_rep)
        return np.asarray(src)[:, 0]

    return nearest


class DistGraphEngine:
    """Engine-protocol wrapper for the serve-sharded single graph
    (params.serve_shards > 1). Static after fit: search/remove/save/load
    supported; online insert requires serve_shards == 1 (the donated
    bump-append is a single-device program — growth of a sharded slab is
    a refit, matching the reference's static u64 big-index usage)."""

    def __init__(self, params: IndexParams):
        self.params = params
        self._fitted = False
        self._removed: list = []
        p = int(params.serve_shards)
        devs = jax.devices()
        if len(devs) < p:
            raise RuntimeError(
                f"serve_shards={p} needs that many JAX devices; "
                f"{len(devs)} available")
        self.mesh = Mesh(np.array(devs[:p]), ("db",))

    # ------------------------------------------------------------- fit
    def fit(self, vectors: np.ndarray, ef_construction: Optional[int] = None,
            num_threads: int = 1) -> None:
        del num_threads
        from ..index.nsg import _attach_unreached
        from ..index.search import seed_sample_arrays
        from .build_sharded import ShardedGraphBuilder

        v = np.asarray(vectors, dtype=np.float32)
        if v.ndim != 2:
            raise ValueError("fit expects a 2-D array [n, dim]")
        if ef_construction:
            self.params.ef_construction = int(ef_construction)
        n, dim = v.shape
        t0 = time.time()
        metric = self.params.metric.value
        if metric == "cos":
            nrm = np.linalg.norm(v, axis=1, keepdims=True)
            v = v / np.maximum(nrm, 1e-30)
        self._host_data = v
        r = self.params.max_nbrs
        builder = ShardedGraphBuilder(
            mesh=self.mesh, r=r, knn_k=32,
            alpha=float(getattr(self.params, "prune_alpha", 1.0)),
            ef=max(2 * r, 64), metric="ip" if metric in ("ip", "cos")
            else "l2")
        nbrs, ep = builder.build(v, n)
        log.info("dist fit: sharded build done %.1fs", time.time() - t0)

        # shard the slab BEFORE repair (repair's nearest-reached scan runs
        # against the sharded copy; the full slab never lands on a device)
        self._upload(v, n, dim, metric)
        nearest = _nearest_reached_factory(
            self.mesh, self._data_sh, self._sq_sh, v, self._metric)
        nbrs = _attach_unreached(_HostSlabForRepair(v, self._metric), nbrs,
                                 ep, nearest_fn=nearest)
        self._nbrs = jax.device_put(
            np.asarray(nbrs, np.int32),
            NamedSharding(self.mesh, P(None, None)))
        rng = np.random.default_rng(0xD157 ^ n)
        extra = rng.integers(0, n, size=7).astype(np.int32)
        self._eps = jax.device_put(
            np.concatenate([[ep], extra]).astype(np.int32),
            NamedSharding(self.mesh, P(None)))
        # per-query seed scan sample (replicated — it is tiny)
        s = min(int(getattr(self.params, "seed_sample", 4096)),
                (n // 128) * 128)
        self._seed_sample = None
        if s >= 128:
            ids = jnp.asarray(np.sort(rng.choice(n, size=s, replace=False))
                              .astype(np.int32))
            sample = seed_sample_arrays(jnp.asarray(v), ids, metric)
            rep = NamedSharding(self.mesh, P())
            self._seed_sample = tuple(
                jax.device_put(np.asarray(x), rep) for x in sample)
        self._n = n
        self._fitted = True
        log.info("dist fit: n=%d dim=%d shards=%d in %.1fs", n, dim,
                 self.mesh.shape["db"], time.time() - t0)

    def _upload(self, v: np.ndarray, n: int, dim: int, metric: str) -> None:
        p = self.mesh.shape["db"]
        npad = -(-n // (128 * p)) * (128 * p)
        self._metric = "ip" if metric in ("ip", "cos") else "l2"
        self._user_metric = metric
        dpad = np.zeros((npad, dim), np.float32)
        dpad[:n] = v[:n]
        sh = NamedSharding(self.mesh, P("db", None))
        self._data_sh = jax.device_put(dpad, sh)
        self._sq_sh = jax.device_put(
            (dpad * dpad).sum(1).astype(np.float32),
            NamedSharding(self.mesh, P("db")))
        valid = np.zeros(npad, bool)
        valid[:n] = True
        self._valid = jax.device_put(valid, NamedSharding(self.mesh, P(None)))
        self._npad = npad

    # ---------------------------------------------------------- search
    def _require_fitted(self):
        if not self._fitted:
            raise RuntimeError("index is not fitted")

    @property
    def _id_dtype(self):
        return (np.int64 if self.params.id_type in ("uint64", "int64")
                else np.int32)

    def batch_search_with_distance(self, queries, topk: int, ef: int = 100,
                                   num_threads: int = 1):
        del num_threads
        self._require_fitted()
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if q.shape[1] != self._host_data.shape[1]:
            raise ValueError(
                f"query dim {q.shape[1]} != index dim "
                f"{self._host_data.shape[1]}")
        nq = q.shape[0]
        b = max(64, -(-nq // 64) * 64)
        if b != nq:
            q = np.pad(q, ((0, b - nq), (0, 0)))
        if self._user_metric == "cos":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                               1e-30)
        ef = max(int(ef), int(topk))
        d, i = dist_graph_search(
            self.mesh, self._data_sh, self._sq_sh, self._valid, self._nbrs,
            self._eps, jnp.asarray(q), k=topk, ef=ef, metric=self._metric,
            n_expand=int(getattr(self.params, "beam_expand", 8)),
            max_iters=int(getattr(self.params, "search_iters", 0)),
            seed_sample=self._seed_sample)
        return (np.asarray(i)[:nq].astype(self._id_dtype, copy=False),
                np.asarray(d)[:nq])

    def batch_search(self, queries, topk: int, ef: int = 100,
                     num_threads: int = 1) -> np.ndarray:
        ids, _ = self.batch_search_with_distance(queries, topk, ef)
        return ids

    def search(self, query, topk: int, ef: int = 100) -> np.ndarray:
        return self.batch_search(np.atleast_2d(query), topk, ef)[0]

    def search_with_distance(self, query, topk: int, ef: int = 100):
        ids, d = self.batch_search_with_distance(np.atleast_2d(query),
                                                 topk, ef)
        return ids[0], d[0]

    # ---------------------------------------------------------- update
    def insert(self, vectors, ef: int = 100) -> np.ndarray:
        raise RuntimeError(
            "serve_shards > 1 serves a static fitted index; online insert "
            "needs serve_shards=1 (refit to grow a sharded slab)")

    def remove(self, ids) -> None:
        """Tombstone on the replicated valid mask (searches keep routing
        through removed nodes, results filter them — engine.remove
        semantics)."""
        self._require_fitted()
        raw = np.atleast_1d(np.asarray(ids))
        if raw.size and (raw.min() < 0 or raw.max() >= self._npad):
            raise ValueError(
                f"remove: id out of range [0, {self._npad}) "
                f"(got min={raw.min()}, max={raw.max()})")
        v = np.array(self._valid)  # np.asarray of a jax array is read-only
        v[raw] = False
        self._valid = jax.device_put(v, NamedSharding(self.mesh, P(None)))
        self._removed.extend(int(x) for x in raw)

    def compact(self) -> None:
        self._removed = []  # tombstones already filtered at result time

    def get_data_by_id(self, id_: int) -> np.ndarray:
        self._require_fitted()
        return np.asarray(self._host_data[int(id_)])

    @property
    def num(self) -> int:
        return int(np.asarray(self._valid).sum()) if self._fitted else 0

    @property
    def capacity(self) -> int:
        return int(self.params.capacity)

    @property
    def space(self):
        """Shape metadata for the SDK (index_api reads .dim after load)."""
        if not self._fitted:
            return None
        import types

        return types.SimpleNamespace(dim=self._host_data.shape[1],
                                     num=self.num)

    # ----------------------------------------------------- persistence
    def save(self, directory) -> None:
        self._require_fitted()
        os.makedirs(directory, exist_ok=True)
        np.savez(os.path.join(directory, "dist_graph.npz"),
                 data=self._host_data, nbrs=np.asarray(self._nbrs),
                 eps=np.asarray(self._eps), valid=np.asarray(self._valid),
                 n=self._n)

    @classmethod
    def load(cls, directory) -> "DistGraphEngine":
        import json

        with open(os.path.join(directory, "schema.json")) as f:
            params = IndexParams.from_dict(json.load(f))
        eng = cls(params)
        z = np.load(os.path.join(directory, "dist_graph.npz"))
        v = np.asarray(z["data"], np.float32)
        n = int(z["n"])
        eng._host_data = v
        metric = params.metric.value
        eng._upload(v, n, v.shape[1], metric)
        eng._valid = jax.device_put(
            np.asarray(z["valid"], bool),
            NamedSharding(eng.mesh, P(None)))
        eng._nbrs = jax.device_put(np.asarray(z["nbrs"], np.int32),
                                   NamedSharding(eng.mesh, P(None, None)))
        eng._eps = jax.device_put(np.asarray(z["eps"], np.int32),
                                  NamedSharding(eng.mesh, P(None)))
        from ..index.search import seed_sample_arrays

        rng = np.random.default_rng(0xD157 ^ n)
        rng.integers(0, n, size=7)  # keep the draw stream aligned with fit
        s = min(int(getattr(params, "seed_sample", 4096)), (n // 128) * 128)
        eng._seed_sample = None
        if s >= 128:
            ids = jnp.asarray(np.sort(rng.choice(n, size=s, replace=False))
                              .astype(np.int32))
            sample = seed_sample_arrays(jnp.asarray(v), ids, metric)
            rep = NamedSharding(eng.mesh, P())
            eng._seed_sample = tuple(
                jax.device_put(np.asarray(x), rep) for x in sample)
        eng._n = n
        eng._fitted = True
        return eng


class _HostSlabForRepair:
    """Minimal space stand-in for nsg._attach_unreached when a custom
    nearest_fn supplies the distance scans: only metric metadata is read."""

    def __init__(self, v: np.ndarray, metric: str):
        self.metric = metric
        self._v = v

    @property
    def data(self):  # pragma: no cover — only hit if nearest_fn is absent
        return jnp.asarray(self._v)
