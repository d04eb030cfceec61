"""Multi-chip scaling: database sharding + query data-parallelism over a mesh.

The reference scales with worker threads on one host (Scheduler/Worker,
include/executor/scheduler.hpp:39-222; `num_threads` through the API,
python/src/alayalite/index.py:145-162). The TPU-native substitute (SURVEY.md
§2c) is a `jax.sharding.Mesh` with two axes:

  "dp" — shard the *query batch*: pure data parallelism, zero communication.
  "db" — shard the *database rows*: every chip scans its slice, then per-shard
         top-k results are merged with one `all_gather` over ICI (the
         "context-parallel" of a vector DB).

Everything is expressed with `shard_map` + XLA collectives; no NCCL/MPI
analog exists or is needed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.distance import normalize_rows, pairwise, sqnorms

FINF = float("inf")  # plain python: jnp constants at module level would init the backend at import


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              devices=None) -> Mesh:
    """2-D ("dp", "db") mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        dp = 2 if n % 2 == 0 and n > 2 else 1
    db = n // dp
    arr = np.array(devices[: dp * db]).reshape(dp, db)
    return Mesh(arr, ("dp", "db"))


def shard_space_by_rows(mesh: Mesh, space):
    """Place a space pytree with rows split over the "db" axis."""
    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            spec = P("db", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, space)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def _local_flat_topk(q, data, x_sq, valid, k: int, metric: str, bf16: bool):
    """Exact top-k of q against a local database slice (single program).
    k may exceed the slice (small shards): results pad with inf/-1 so the
    cross-shard merge shapes stay [Q, k]."""
    d = pairwise(q, data, metric=metric, x_sq=x_sq,
                 compute_dtype=jnp.bfloat16 if bf16 else None)
    d = jnp.where(valid[None, :], d, FINF)
    kk = min(k, data.shape[0])
    nd, ni = jax.lax.top_k(-d, kk)
    if kk < k:
        nd = jnp.pad(nd, ((0, 0), (0, k - kk)), constant_values=-FINF)
        ni = jnp.pad(ni, ((0, 0), (0, k - kk)), constant_values=-1)
    return -nd, ni


def db_sharded_flat_search(mesh: Mesh, space, queries: jax.Array, k: int,
                           bf16: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a row-sharded database.

    queries are sharded over "dp", the database over "db"; each chip scans its
    slice and one `all_gather` over "db" merges the per-shard winners.
    Returns replicated-over-db, dp-sharded (dists [Q,k], global ids [Q,k]).
    """
    metric = space.metric

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dp", None), P("db", None), P("db"), P("db")),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    def _search(q, data, x_sq, valid):
        shard_rows = data.shape[0]
        d, i = _local_flat_topk(q, data, x_sq, valid, k, metric, bf16)
        i = i + jax.lax.axis_index("db") * shard_rows
        dd = jax.lax.all_gather(d, "db", axis=1)      # [Q, ndb, k]
        ii = jax.lax.all_gather(i, "db", axis=1)
        dd = dd.reshape(q.shape[0], -1)
        ii = ii.reshape(q.shape[0], -1)
        nd, sel = jax.lax.top_k(-dd, k)
        out_i = jnp.take_along_axis(ii, sel, axis=1)
        # mask padding-slot hits (inf distance) to -1 like the graph and
        # block variants — capacity padding otherwise leaks phantom ids
        return -nd, jnp.where(jnp.isfinite(-nd), out_i, -1)

    return _search(queries, space.data, space.sq_norms, space.valid)


def dp_sharded_beam_search(mesh: Mesh, space, nbrs, seeds, queries,
                           k: int, ef: int, valid=None):
    """Graph beam search with the query batch sharded over the full mesh.

    The graph + space are replicated (they fit per-chip for graph indices;
    row-sharded graph traversal is the "db" axis' job for flat search). This
    is the TPU analog of one-coroutine-per-query inter-query parallelism.
    """
    from ..index.search import beam_search

    qsh = NamedSharding(mesh, P(("dp", "db"), None))
    queries = jax.device_put(queries, qsh)
    seeds = jax.device_put(seeds, qsh)
    space = replicate(mesh, space)
    nbrs = jax.device_put(nbrs, NamedSharding(mesh, P()))
    if valid is not None:
        valid = jax.device_put(valid, NamedSharding(mesh, P()))
    return beam_search(space, nbrs, seeds, queries, k=k, ef=ef, valid=valid)


def db_sharded_graph_search(mesh: Mesh, space_leaves, metric: str,
                            nbrs: jax.Array, eps: jax.Array,
                            queries: jax.Array, k: int, ef: int,
                            n_expand: int = 8):
    """Graph beam search over a row-partitioned database.

    Every "db" shard holds its own subgraph (local adjacency over its own
    rows) and runs the full lockstep beam for ALL queries on its slice in
    parallel; one `all_gather` over ICI merges the per-shard top-k — the
    graph analog of db_sharded_flat_search. Queries shard over "dp".

    space_leaves: (data [C,D], sq_norms [C], valid [C]) row-sharded over
    "db"; nbrs [C,R] row-sharded with *local* neighbor ids; eps [ndb, E]
    per-shard entry points (local ids).
    """
    from ..index.search import beam_search
    from ..spaces.raw import RawSpace

    data, sq, valid = space_leaves

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dp", None), P("db", None), P("db"), P("db"),
                  P("db", None), P("db", None)),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    def _search(q, data, sq, valid, nbrs, eps):
        shard_rows = data.shape[0]
        space = RawSpace(data=data, sq_norms=sq, valid=valid,
                         num=jnp.asarray(shard_rows, jnp.int32),
                         metric=metric, user_metric=metric)
        seeds = jnp.broadcast_to(eps.reshape(1, -1), (q.shape[0], eps.size))
        d, i = beam_search(space, nbrs, seeds, q, k=k, ef=ef,
                           valid=valid, n_expand=n_expand)
        i = jnp.where(i >= 0, i + jax.lax.axis_index("db") * shard_rows, -1)
        dd = jax.lax.all_gather(d, "db", axis=1).reshape(q.shape[0], -1)
        ii = jax.lax.all_gather(i, "db", axis=1).reshape(q.shape[0], -1)
        nd, sel = jax.lax.top_k(-dd, k)
        out_i = jnp.take_along_axis(ii, sel, axis=1)
        return -nd, jnp.where(jnp.isfinite(-nd), out_i, -1)

    return _search(queries, data, sq, valid, nbrs, eps)


class ShardedGraphIndex:
    """Multi-chip graph index: rows partitioned over the mesh's "db" axis,
    one independent subgraph per shard, fan-out search + ICI top-k merge.

    This is the scale-out decomposition the reference has no analog for
    (SURVEY.md §2c "multi-core scaling knob", done for the *graph* path):
    per-shard subindexes mean no cross-shard edges and therefore no halo
    exchange inside the beam loop — each shard's beam is the plain
    single-chip program on its slice, and the only collective is the final
    ef-pool merge. Capacity and build time scale linearly with the mesh;
    recall matches a single graph at equal per-shard ef (each query scans
    ndb smaller graphs, strictly wider coverage).
    """

    def __init__(self, mesh: Optional[Mesh] = None, metric: str = "l2",
                 max_nbrs: int = 16, ef_construction: int = 100,
                 builder: str = "nsg"):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.metric = metric.lower()
        self.max_nbrs = max_nbrs
        self.ef_construction = ef_construction
        self.builder = builder
        self._leaves = None

    def fit(self, vectors: np.ndarray) -> None:
        from ..index.hnsw import HNSWBuilder
        from ..index.nsg import NSGBuilder
        from ..spaces.raw import RawSpace

        v = np.asarray(vectors, dtype=np.float32)
        n, dim = v.shape
        ndb = self.mesh.shape["db"]
        if n < ndb:
            raise ValueError(f"fit of {n} vectors cannot fill {ndb} shards")
        per = -(-n // ndb)
        # array_split (not fixed stride): n=9 over 8 shards must give every
        # shard >= 1 row — a fixed per=2 stride left trailing shards EMPTY
        # and fed 0 rows into the graph builder
        chunks = np.array_split(v, ndb)
        datas, sqs, valids, nbrs_l, eps_l = [], [], [], [], []
        n_eps = 8
        for s in range(ndb):
            rows = chunks[s]
            space = RawSpace.create(per, dim, metric=self.metric).fit(rows)
            if self.builder == "hnsw":
                b = HNSWBuilder(r=self.max_nbrs, l=self.ef_construction,
                                seed=s)
            else:
                b = NSGBuilder(r=self.max_nbrs,
                               l=max(self.ef_construction // 2, 64), seed=s)
            g = b.build_graph(space, rows.shape[0])
            datas.append(np.asarray(space.data, dtype=np.float32))
            sqs.append(np.asarray(space.sq_norms))
            valids.append(np.asarray(space.valid))
            nbrs_l.append(np.asarray(g.nbrs[:, : self.max_nbrs]))
            e = np.full(n_eps, 0, dtype=np.int32)
            eg = np.asarray(g.eps)
            e[: min(len(eg), n_eps)] = eg[:n_eps]
            eps_l.append(e)
        put = lambda x, spec: jax.device_put(  # noqa: E731
            np.asarray(x), NamedSharding(self.mesh, spec))
        self._leaves = (
            put(np.concatenate(datas), P("db", None)),
            put(np.concatenate(sqs), P("db")),
            put(np.concatenate(valids), P("db")),
        )
        self._nbrs = put(np.concatenate(nbrs_l), P("db", None))
        self._eps = put(np.stack(eps_l), P("db", None))
        self._per = per
        self._n = n

    def batch_search_with_distance(self, queries: np.ndarray, topk: int,
                                   ef_search: int = 100):
        if self._leaves is None:
            raise RuntimeError("index is not fitted")
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        if self.metric == "cos":
            q = normalize_rows(q)
        d, i = db_sharded_graph_search(
            self.mesh, self._leaves, "ip" if self.metric in ("ip", "cos")
            else "l2", self._nbrs, self._eps, q, k=topk,
            ef=max(ef_search, topk))
        return np.asarray(i), np.asarray(d)

    def batch_search(self, queries: np.ndarray, topk: int,
                     ef_search: int = 100) -> np.ndarray:
        ids, _ = self.batch_search_with_distance(queries, topk, ef_search)
        return ids


class ShardedFlatIndex:
    """User-facing multi-chip flat index: database rows sharded over the
    mesh's "db" axis, exact (or bf16+rerank) search with an ICI all_gather
    top-k merge. The multi-chip substitute for the reference's num_threads
    scaling — capacity and bandwidth scale with the mesh.
    """

    def __init__(self, mesh: Optional[Mesh] = None, metric: str = "l2",
                 bf16: bool = True):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.metric = metric.lower()
        self.bf16 = bf16
        self.space = None

    def fit(self, vectors: np.ndarray) -> None:
        from ..spaces.raw import RawSpace

        v = np.asarray(vectors, dtype=np.float32)
        n, dim = v.shape
        ndb = self.mesh.shape["db"]
        cap = -(-n // ndb) * ndb  # row-shardable capacity
        space = RawSpace.create(cap, dim, metric=self.metric).fit(v)
        self.space = shard_space_by_rows(self.mesh, space)
        self._n = n

    def batch_search(self, queries: np.ndarray, topk: int,
                     ef_search: int = 0) -> np.ndarray:
        ids, _ = self.batch_search_with_distance(queries, topk, ef_search)
        return ids

    def batch_search_with_distance(self, queries: np.ndarray, topk: int,
                                   ef_search: int = 0):
        del ef_search  # exact search has no beam knob; kept for API parity
        q = self.space.prep_query(jnp.asarray(np.atleast_2d(
            np.asarray(queries, dtype=np.float32))))
        d, i = db_sharded_flat_search(self.mesh, self.space, q, topk,
                                      bf16=self.bf16)
        return np.asarray(i), np.asarray(d)


def db_sharded_block_search(mesh: Mesh, leaves, metric: str,
                            queries: jax.Array, k: int, ef: int,
                            n_expand: int = 8):
    """Block (bsq8) graph search over a row-partitioned database — the
    flagship index type, scaled past one chip's HBM.

    Each "db" shard holds an independent QG subindex (packed neighbor
    blocks over its own rows); every shard runs the full block beam for all
    queries on its slice, exact-reranks locally (f32 distances, so they
    merge comparably across shards), and ONE all_gather over ICI merges
    the per-shard top-k. Queries shard over "dp".

    leaves: BQGSpace arrays row-sharded over "db" — (data [C,D],
    sq_norms [C], dmin [ndb,D], scale [ndb,D], nbr_ids [C,R],
    nbr_codes [C,R,Dp], nbr_xsq [C,R], valid [C]) — plus eps [ndb,E]
    per-shard entry points (local ids).
    """
    from ..index.search import block_beam_search
    from ..spaces.bqg import BQGSpace

    data, sq, dmin, scale, nids, ncodes, nxsq, valid, eps = leaves

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("dp", None), P("db", None), P("db"), P("db", None),
                  P("db", None), P("db", None), P("db", None, None),
                  P("db", None), P("db"), P("db", None)),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    def _search(q, data, sq, dmin, scale, nids, ncodes, nxsq, valid, eps):
        from ..index.search import scan_seeds

        shard_rows = data.shape[0]
        space = BQGSpace(
            data=data, sq_norms=sq, dmin=dmin[0], scale=scale[0],
            nbr_ids=nids, nbr_codes=ncodes, nbr_xsq=nxsq, valid=valid,
            num=jnp.asarray(shard_rows, jnp.int32),
            metric="ip" if metric == "ip" else "l2", user_metric=metric)
        qj = space.prep_query(q)
        seeds = jnp.broadcast_to(eps.reshape(1, -1), (q.shape[0], eps.size))
        # per-shard seed scan over a strided local sample: QG graphs are
        # built locality-first (scan-seeded pools), so entry points near
        # the query matter — shared eps alone under-reach them
        step = max(1, shard_rows // 1024)
        sids = jnp.arange(0, shard_rows, step, dtype=jnp.int32)
        from ..index.search import seed_sample_arrays

        scan = scan_seeds(qj, *seed_sample_arrays(data, sids, metric),
                          nseed=min(8, sids.shape[0]))
        seeds = jnp.concatenate([scan, seeds], axis=1)
        d, i = block_beam_search(space, seeds, qj, k=k, ef=ef,
                                 valid=valid, n_expand=n_expand)
        i = jnp.where(i >= 0, i + jax.lax.axis_index("db") * shard_rows, -1)
        dd = jax.lax.all_gather(d, "db", axis=1).reshape(q.shape[0], -1)
        ii = jax.lax.all_gather(i, "db", axis=1).reshape(q.shape[0], -1)
        nd, sel = jax.lax.top_k(-dd, k)
        out_i = jnp.take_along_axis(ii, sel, axis=1)
        return -nd, jnp.where(jnp.isfinite(-nd), out_i, -1)

    return _search(queries, data, sq, dmin, scale, nids, ncodes, nxsq,
                   valid, eps)


class ShardedBlockIndex:
    """Multi-chip bsq8 (block-quantized graph) index: the flagship
    single-chip layout (spaces/bqg.py + index/qg.py), row-partitioned over
    the mesh's "db" axis with one independent QG subindex per shard.

    Same decomposition as ShardedGraphIndex (no cross-shard edges, so the
    beam loop has no halo exchange; the only collective is the final top-k
    merge), applied to the packed-block layout whose per-node payload is
    what actually fills HBM at scale (~4 KB/node at D=128, R=32).
    """

    def __init__(self, mesh: Optional[Mesh] = None, metric: str = "l2",
                 max_nbrs: int = 32, ef_construction: int = 128):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.metric = metric.lower()
        self.max_nbrs = max_nbrs
        self.ef_construction = ef_construction
        self._leaves = None

    def fit(self, vectors: np.ndarray) -> None:
        from ..index.qg import QGBuilder
        from ..spaces.bqg import BQGSpace
        from ..spaces.raw import RawSpace

        v = np.asarray(vectors, dtype=np.float32)
        n, dim = v.shape
        ndb = self.mesh.shape["db"]
        if n < ndb:
            raise ValueError(f"fit of {n} vectors cannot fill {ndb} shards")
        per = -(-n // ndb)
        # array_split: every shard gets >= 1 row (see ShardedGraphIndex.fit)
        chunks = np.array_split(v, ndb)
        cols = {name: [] for name in ("data", "sq", "dmin", "scale", "nids",
                                      "ncodes", "nxsq", "valid", "eps")}
        n_eps = 8
        for s in range(ndb):
            rows = chunks[s]
            raw = RawSpace.create(per, dim, metric=self.metric).fit(rows)
            bqg = BQGSpace.create(per, dim, metric=self.metric,
                                  degree=self.max_nbrs).fit(rows)
            g, bqg = QGBuilder(r=self.max_nbrs,
                               ef=max(self.ef_construction, 64),
                               seed=s).build_graph(raw, bqg, rows.shape[0])
            cols["data"].append(np.asarray(bqg.data, dtype=np.float32))
            cols["sq"].append(np.asarray(bqg.sq_norms))
            cols["dmin"].append(np.asarray(bqg.dmin)[None])
            cols["scale"].append(np.asarray(bqg.scale)[None])
            cols["nids"].append(np.asarray(bqg.nbr_ids))
            cols["ncodes"].append(np.asarray(bqg.nbr_codes))
            cols["nxsq"].append(np.asarray(bqg.nbr_xsq))
            cols["valid"].append(np.asarray(bqg.valid))
            e = np.zeros(n_eps, dtype=np.int32)
            eg = np.asarray(g.eps)
            e[: min(len(eg), n_eps)] = np.clip(eg[:n_eps], 0, per - 1)
            cols["eps"].append(e[None])
        put = lambda x, spec: jax.device_put(  # noqa: E731
            np.concatenate(x), NamedSharding(self.mesh, spec))
        self._leaves = (
            put(cols["data"], P("db", None)),
            put(cols["sq"], P("db")),
            put(cols["dmin"], P("db", None)),
            put(cols["scale"], P("db", None)),
            put(cols["nids"], P("db", None)),
            put(cols["ncodes"], P("db", None, None)),
            put(cols["nxsq"], P("db", None)),
            put(cols["valid"], P("db")),
            put(cols["eps"], P("db", None)),
        )
        self._per = per
        self._n = n

    def batch_search_with_distance(self, queries: np.ndarray, topk: int,
                                   ef_search: int = 100):
        if self._leaves is None:
            raise RuntimeError("index is not fitted")
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, dtype=np.float32)))
        d, i = db_sharded_block_search(self.mesh, self._leaves, self.metric,
                                       q, k=topk, ef=max(ef_search, topk))
        return np.asarray(i), np.asarray(d)

    def batch_search(self, queries: np.ndarray, topk: int,
                     ef_search: int = 100) -> np.ndarray:
        ids, _ = self.batch_search_with_distance(queries, topk, ef_search)
        return ids
