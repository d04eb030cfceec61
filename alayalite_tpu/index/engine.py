"""IndexEngine — the type-dispatched index object behind the Python SDK.

TPU-native re-design of the reference's PyIndex / PyIndexInterface
(/root/reference/python/include/index.hpp:61-589): owns the build space, the
optional quantized search space, the graph, and drives fit / search /
batch_search / insert / remove / save / load. Where the reference fans a
C++ template cross-product out through pybind dispatch macros
(python/include/dispatch.hpp:25-175), here one engine composes pytree spaces
and jitted search programs — dtype/metric/quantization are data, not types.

Search semantics match the reference:
  - graph indices: lockstep beam search at width ``ef``; when the search
    space is quantized the ef-pool is reranked with exact distances in the
    build space (index.hpp:450-488).
  - flat index: two-stage MXU scan (bf16 coarse + exact f32 rerank) in one
    dispatch; "exact" mode keeps single-pass f32. No reference analog —
    on TPU brute force is competitive to multi-million N.
  - insert: beam-search top-``max_nbrs`` become the new node's edges and the
    touched nodes re-prune, the batched GraphUpdateJob (graph_update_job.hpp:
    36-138).
  - remove: tombstone; searches keep routing *through* removed nodes but
    filter them from results — same reachability effect as the reference's
    2-hop detour (graph_search_job.hpp:373-417) without mutating edges.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import exact_topk
from ..params import IndexParams, IndexType, QuantizationType
from .graph import Graph

log = logging.getLogger("alayalite_tpu")

_BATCH_BUCKETS = (64, 256, 1024, 4096, 16384)


def _bucket(b: int) -> int:
    for s in _BATCH_BUCKETS:
        if b <= s:
            return s
    return -(-b // 4096) * 4096


def _make_builder(params: IndexParams, seed: int = 0):
    from .fusion import FusionGraphBuilder
    from .hnsw import HNSWBuilder
    from .nsg import NSGBuilder

    r = params.max_nbrs
    l = params.ef_construction
    a = float(getattr(params, "prune_alpha", 1.0))
    if params.index_type is IndexType.HNSW:
        return HNSWBuilder(r=r, l=l, seed=seed, alpha=a)
    if params.index_type is IndexType.NSG:
        return NSGBuilder(r=r, l=max(l // 2, 64), seed=seed, alpha=a)
    if params.index_type is IndexType.FUSION:
        return FusionGraphBuilder(r=r, l=l, seed=seed, alpha=a)
    raise ValueError(f"no graph builder for {params.index_type}")


def _make_space(params: IndexParams, capacity: int, dim: int):
    from ..spaces.raw import RawSpace

    return RawSpace.create(capacity, dim, metric=params.metric.value,
                           storage_dtype=params.storage_dtype)


def _quant_space_type(params: IndexParams):
    """Quantized-space CLASS for params (load path: avoids instantiating a
    throwaway space — RaBitQSpace.create runs an O(D^3) QR just to be
    replaced by the saved rotation)."""
    if params.quantization_type is QuantizationType.NONE:
        return None
    if params.quantization_type in (QuantizationType.SQ8,
                                    QuantizationType.SQ4):
        from ..spaces.sq import SQSpace

        return SQSpace
    if params.quantization_type in (QuantizationType.RABITQ,
                                    QuantizationType.RABITQ2):
        from ..spaces.rabitq import RaBitQSpace

        return RaBitQSpace
    from ..spaces.bqg import BQGSpace

    return BQGSpace


def _make_quant_space(params: IndexParams, capacity: int, dim: int,
                      storage=None):
    """``storage``: optional (data, sq_norms, valid, num) raw-slab arrays
    for the rabitq path to adopt instead of allocating its own f32 copy
    (ignored by the other quantizers, which store codes only)."""
    if params.quantization_type is QuantizationType.NONE:
        return None
    if params.quantization_type is QuantizationType.SQ8:
        from ..spaces.sq import SQSpace

        return SQSpace.create(capacity, dim, bits=8, metric=params.metric.value)
    if params.quantization_type is QuantizationType.SQ4:
        from ..spaces.sq import SQSpace

        return SQSpace.create(capacity, dim, bits=4, metric=params.metric.value)
    if params.quantization_type in (QuantizationType.RABITQ,
                                    QuantizationType.RABITQ2):
        from ..spaces.rabitq import RaBitQSpace

        bits = 2 if params.quantization_type is QuantizationType.RABITQ2 else 1
        return RaBitQSpace.create(capacity, dim, metric=params.metric.value,
                                  rotator=getattr(params, "rotator", "matrix"),
                                  bits=bits, storage=storage)
    if params.quantization_type is QuantizationType.BSQ8:
        from ..spaces.bqg import BQGSpace

        return BQGSpace.create(capacity, dim, metric=params.metric.value,
                               degree=params.max_nbrs)
    raise ValueError(f"unknown quantization {params.quantization_type}")


class IndexEngine:
    """Stateful host wrapper over functional device state (spaces + graph)."""

    def __init__(self, params: IndexParams):
        self.params = params
        self.space = None          # build space (RawSpace)
        self.search_space = None   # quantized space or == space
        self.graph: Optional[Graph] = None
        self._fitted = False
        self._rng = np.random.default_rng(0xA1A7A)  # overlay level draws
        self._removed: list = []   # tombstones since the last compaction
        self._ins_shadow = None    # interim bsq8 space for insert search

    # ------------------------------------------------------------------ fit
    def fit(self, vectors: np.ndarray, ef_construction: Optional[int] = None,
            num_threads: int = 1) -> None:
        """Build the index over ``vectors`` (reference: index.hpp:177-227).

        ``num_threads`` is accepted for API parity; batching replaces
        threading on TPU (SURVEY.md §2c).
        """
        del num_threads
        v = np.asarray(vectors, dtype=np.float32)
        if v.ndim != 2:
            raise ValueError("fit expects a 2-D array [n, dim]")
        n, dim = v.shape
        capacity = max(self.params.capacity, n)
        if ef_construction:
            self.params.ef_construction = int(ef_construction)
        t0 = time.time()
        self._ins_shadow = None
        self.space = _make_space(self.params, capacity, dim).fit(v)
        if (self.params.quantization_type in (QuantizationType.RABITQ,
                                              QuantizationType.RABITQ2)
                and self.space.data.dtype == jnp.float32):
            # adopt the raw f32 slab instead of allocating + uploading a
            # second copy (3.8 GB at 1M x 960): both spaces store the
            # identical normalize-then-store rows, and nothing on the
            # rabitq path donates data/sq_norms (only bits/f_add/f_rescale
            # buffers are donated, rabitq.py::_quantize_block_into). jnp
            # arrays are immutable, so aliasing is safe; post-fit inserts
            # naturally de-alias through .at[].set.
            self.search_space = _make_quant_space(
                self.params, capacity, dim,
                storage=(self.space.data, self.space.sq_norms,
                         self.space.valid, self.space.num))
        else:
            q = _make_quant_space(self.params, capacity, dim)
            self.search_space = q.fit(v) if q is not None else self.space

        if self.params.quantization_type.is_block:
            # block quantizations imply the QG-style graph: adjacency +
            # quantized neighbor blocks built together (index.hpp:188-195)
            from .qg import QGBuilder

            r = (32 if self.params.quantization_type is not
                 QuantizationType.BSQ8 else self.params.max_nbrs)
            builder = QGBuilder(r=r,
                                ef=max(self.params.ef_construction, 128),
                                alpha=float(getattr(self.params,
                                                    "prune_alpha", 1.0)))
            # build_graph donates search-space code buffers mid-pipeline
            # (interim block pack + final re-encode); unbind ours first so
            # a failed build can never leave the engine referencing
            # deleted device buffers
            search_space, self.search_space = self.search_space, None
            self.graph, self.search_space = builder.build_graph(
                self.space, search_space, n)
        elif self.params.index_type is IndexType.FLAT:
            self.graph = None
        elif int(getattr(self.params, "build_shards", 1)) > 1:
            # mesh-sharded build: one graph, rows sharded over a ("db",)
            # mesh — build-time HBM scales with devices
            from ..parallel.build_sharded import (build_graph_sharded,
                                                  make_build_mesh)

            shards = int(self.params.build_shards)
            if len(jax.devices()) < shards:
                raise RuntimeError(
                    f"build_shards={shards} needs that many JAX devices; "
                    f"{len(jax.devices())} available")
            mesh = make_build_mesh(shards)
            self.graph = build_graph_sharded(self.space, n,
                                             self.params.max_nbrs,
                                             self.params, mesh=mesh)
        else:
            builder = _make_builder(self.params)
            self.graph = builder.build_graph(self.space, n)
        self._fitted = True
        log.info("fit: n=%d dim=%d type=%s in %.2fs", n, dim,
                 self.params.index_type.value, time.time() - t0)

    # --------------------------------------------------------------- search
    def _require_fitted(self):
        if not self._fitted:
            raise RuntimeError("index is not fitted")

    @property
    def _id_dtype(self):
        """Result-id width per ``params.id_type``: 64-bit id types return
        int64 (signed keeps the -1 absent sentinel); device-internal ids
        stay int32 (see the capacity guard in params.py)."""
        return (np.int64 if self.params.id_type in ("uint64", "int64")
                else np.int32)

    def batch_search_with_distance(
        self, queries: np.ndarray, topk: int, ef: int = 100,
        num_threads: int = 1,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(ids [Q, topk] in the id_type width with -1 pad, dists f32)."""
        ids, d = self._batch_search_impl(queries, topk, ef, num_threads)
        return (np.asarray(ids).astype(self._id_dtype, copy=False),
                np.asarray(d))

    def _batch_search_impl(
        self, queries: np.ndarray, topk: int, ef: int = 100,
        num_threads: int = 1,
    ) -> Tuple[np.ndarray, np.ndarray]:
        del num_threads
        self._require_fitted()
        if isinstance(queries, jax.Array):
            # device-resident queries pass through with zero host copies
            # (e.g. an embedding model producing queries on the same chip)
            q = queries if queries.ndim == 2 else queries[None]
        else:
            q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        nq = q.shape[0]
        if self.params.index_type is IndexType.FLAT:
            fast = self.params.flat_mode == "fast"
            if fast:
                return self._flat_fast_search(q, topk)
            # prep_query normalizes for cos — without it the returned
            # distances are −q·x scaled by the raw query norm, diverging
            # from every other path's −cos convention
            d, i = exact_topk(self.space.prep_query(jnp.asarray(q)),
                              self.space.data.astype(jnp.float32),
                              topk, metric=self.space.metric,
                              valid=np.asarray(self.space.valid))
            return i, d

        # pad to a fixed query-slice multiple; all slicing happens inside
        # ONE jitted program (through a TPU tunnel every extra dispatch has
        # a ~35ms fixed floor)
        qchunk = min(4096, _bucket(nq))
        b = -(-nq // qchunk) * qchunk
        if b != nq:
            q = (jnp.pad(q, ((0, b - nq), (0, 0)))
                 if isinstance(q, jax.Array) else
                 np.pad(q, ((0, b - nq), (0, 0))))
        qj = self.search_space.prep_query(jnp.asarray(q))
        ef = max(int(ef), int(topk))
        m = self.params.beam_expand
        if self.params.quantization_type.is_block:
            from .search import block_search_device

            if self.space.dim >= 512:
                # high-dim block search: the in-search exact rerank gathers
                # [qchunk, ef, D] f32 — at 4096 x 128 x 960 that's a 2 GB
                # HLO temp on a chip already holding ~12 GB of blocks.
                # Smaller slices add lax.map iterations, not dispatches.
                qchunk = min(qchunk, 1024)

            if self.params.quantization_type is QuantizationType.RABITQ:
                # 1-bit estimates need ~4x the pool width for equal recall
                # (params.rabitq_ef_boost; the reference compensates the
                # same way with ef=400, test_rabitq_search.py:38-66)
                boost = float(getattr(self.params, "rabitq_ef_boost", 1.0))
                ef = max(ef, int(round(ef * boost)))
            seed_arrays = self._seed_scan_arrays()
            if (seed_arrays is None
                    and int(getattr(self.params, "seed_sample", 4096)) <= 0
                    and int(self.space.num) >= 512
                    and not getattr(self, "_warned_no_scan", False)):
                # QG builds use scan-seeded pools by default, which trade
                # medoid-navigability for locality (DESIGN.md): searching
                # such a graph from shared entry points alone degrades
                # recall. Warn once rather than silently underperform.
                self._warned_no_scan = True
                log.warning(
                    "seed_sample=0 disables the per-query seed scan on a "
                    "block index whose graph was built with scan-seeded "
                    "pools; expect degraded recall (raise seed_sample, or "
                    "rebuild with QGBuilder(pool_scan=0))")
            d, i = block_search_device(self.search_space, self.graph.eps, qj,
                                       k=topk, ef=ef, valid=self.space.valid,
                                       max_iters=getattr(self.params,
                                                         "search_iters", 0),
                                       n_expand=m, qchunk=qchunk,
                                       seed_sample=seed_arrays)
            d = np.asarray(d)[:nq]
            if self.space.user_metric == "cos":
                # block spaces compute squared L2 of normalized vectors
                # (2 − 2cos); convert to the −cos convention every other
                # path returns (reference: normalize-then-IP)
                d = np.where(np.isfinite(d), d / 2.0 - 1.0, d)
            return np.asarray(i)[:nq], d
        from .search import graph_search_device

        iters = int(getattr(self.params, "search_iters", 0))
        if self.search_space is self.space:
            d, i = graph_search_device(
                self.space, self.graph.nbrs, self.graph.eps,
                self.graph.overlay, qj, k=topk, ef=ef, max_iters=iters,
                valid=self.space.valid, n_expand=m, qchunk=qchunk)
        else:
            # quantized traversal: pool of ef ids, exact rerank in build space
            d_q, pool = graph_search_device(
                self.search_space, self.graph.nbrs, self.graph.eps,
                self.graph.overlay, qj, k=ef, ef=ef, max_iters=iters,
                valid=self.space.valid, n_expand=m, qchunk=qchunk,
                exact_rerank=False)
            d, i = _rerank_exact(self.space,
                                 self.space.prep_query(jnp.asarray(q)),
                                 pool, topk)
        return np.asarray(i)[:nq], np.asarray(d)[:nq]

    def batch_search(self, queries, topk: int, ef: int = 100,
                     num_threads: int = 1) -> np.ndarray:
        ids, _ = self.batch_search_with_distance(queries, topk, ef, num_threads)
        return ids

    def search(self, query, topk: int, ef: int = 100) -> np.ndarray:
        ids = self.batch_search(np.atleast_2d(query), topk, ef)
        return ids[0]

    def search_with_distance(self, query, topk: int, ef: int = 100):
        ids, d = self.batch_search_with_distance(np.atleast_2d(query), topk, ef)
        return ids[0], d[0]

    def _seed_scan_arrays(self):
        """Cached (ids, vecs bf16, sq_norms) sample for per-query seed
        selection (search.scan_seeds). Refreshed when the stored set
        changes; None below 256 points or when params.seed_sample == 0."""
        S = int(getattr(self.params, "seed_sample", 4096))
        n = int(self.space.num)
        if S <= 0 or n < 256:
            return None
        # n bucketed coarsely: the sample only needs to be representative,
        # and refreshing it per insert batch re-pays a 1M-valid download +
        # host choice + gather through the tunnel (~0.5 s — it dominated
        # the r5 insert search phase at 4096-batch). Above 256k rows a
        # 64k-insert staleness window is noise for a 4-16k sample.
        bucket = 1024 if n < 262_144 else 65_536
        version = (("exact", n) if n < 2048 else ("bucket", n // bucket),
                   getattr(self, "_mutations", 0))
        if (getattr(self, "_sscan", None) is None
                or self._sscan_version != version):
            live = np.flatnonzero(np.asarray(self.space.valid[:n]))
            S = min(S, (live.size // 128) * 128)
            if S < 128:
                return None
            rng = np.random.default_rng(0x5EED)
            ids = jnp.asarray(np.sort(rng.choice(live, size=S,
                                                 replace=False))
                              .astype(np.int32))
            from .search import seed_sample_arrays

            self._sscan = seed_sample_arrays(self.space.data, ids,
                                             self.space.user_metric)
            self._sscan_version = version
        return self._sscan

    def _flat_fast_search(self, q, topk: int):
        """One-dispatch flat fast path: cached padded slab + in-jit query
        slicing (each dispatch costs ~35ms through a TPU tunnel)."""
        from ..ops.distance import flat_search_device, sqnorms

        version = (int(self.space.num), getattr(self, "_mutations", 0))
        if (getattr(self, "_flat_cache", None) is None
                or self._flat_cache_version != version):
            x = self.space.data.astype(jnp.float32)
            npad = (-(-x.shape[0] // 65536) * 65536 if x.shape[0] > 65536
                    else -(-x.shape[0] // 128) * 128)
            if npad != x.shape[0]:
                x = jnp.pad(x, ((0, npad - x.shape[0]), (0, 0)))
            vfull = jnp.zeros((npad,), bool).at[
                : self.space.valid.shape[0]].set(self.space.valid)
            self._flat_cache = (x, sqnorms(x), vfull)
            self._flat_cache_version = version
        x, x_sq, vfull = self._flat_cache
        nq = q.shape[0]
        qchunk = min(4096, _bucket(nq))
        b = -(-nq // qchunk) * qchunk
        qj = self.space.prep_query(jnp.asarray(q))
        if b != nq:
            qj = jnp.pad(qj, ((0, b - nq), (0, 0)))
        tile = min(65536, x.shape[0])
        d, i = flat_search_device(qj, x, x_sq, vfull, k=topk,
                                  metric=self.space.metric, tile_n=tile,
                                  rerank=max(32, 4 * topk), qchunk=qchunk)
        return np.asarray(i)[:nq], np.asarray(d)[:nq]

    # --------------------------------------------------------------- update
    def insert(self, vectors, ef: int = 100) -> np.ndarray:
        """Batched online insert (graph_update_job.hpp:66-89). Returns new ids
        (-1 where capacity was exhausted — caller raises, index.py:117-123)."""
        return np.asarray(self._insert_impl(vectors, ef)).astype(
            self._id_dtype, copy=False)

    def _insert_impl(self, vectors, ef: int = 100) -> np.ndarray:
        self._require_fitted()
        if self.params.quantization_type.is_block:
            return self._insert_block(vectors, ef)
        v = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        nq = v.shape[0]
        r = self.params.max_nbrs

        if self.params.index_type is IndexType.FLAT:
            # capture identity BEFORE rebinding: checking after would see
            # old-vs-new pytrees, double the insert, and permanently fork
            # search_space off the quantization-free fast path
            same = self.search_space is self.space
            self.space, ids = self._raw_insert(jnp.asarray(v))
            if same:
                self.search_space = self.space
            else:
                self.search_space, _ = self.search_space.insert(jnp.asarray(v))
            return np.asarray(ids)

        trace = os.environ.get("ALAYA_TRACE_INSERT") == "1"
        tt = time.time()

        def tick(label):
            nonlocal tt
            if trace:
                log.info("insert[%s]: %.2fs", label, time.time() - tt)
            tt = time.time()

        # 1. find neighbors for the new nodes with the current graph.
        #    Raw indices route this through an interim bsq8 shadow when one
        #    is warranted (VERDICT r4 #1): the f32 traversal ran ~2.7k QPS
        #    at 1M while block traversal serves ~70k dev-QPS on the same
        #    chip — the ef-deep neighbor search dominated insert throughput
        #    (2.0k vec/s median, results/insert_throughput_1m.json r4).
        shadow = getattr(self, "_ins_shadow", None)
        if shadow is None and self._shadow_auto_on():
            shadow = self._ensure_ins_shadow()
        tick("shadowpack")
        if shadow is not None:
            ids_nb, _d = self._shadow_insert_search(shadow, v, r,
                                                    ef=max(ef, r))
        else:
            ids_nb, _d = self.batch_search_with_distance(v, r, ef=max(ef, r))
        tick("search")
        # 2. append vectors (identity captured before rebinding — see the
        #    FLAT branch note)
        same = self.search_space is self.space
        self.space, new_ids = self._raw_insert(jnp.asarray(v))
        if same:
            self.search_space = self.space
        else:
            self.search_space, _ = self.search_space.insert(jnp.asarray(v))
        new_ids_np = np.asarray(new_ids)
        tick("append")
        # 3. fused on-device connect (fused_insert.fused_raw_connect):
        #    new-row scatter + in-kernel bounded reverse + re-prune in ONE
        #    program — the adjacency never leaves the device, and since r5
        #    neither does the reverse table (the old host group-by +
        #    [T, 16] upload cost ~0.45 s/batch through the tunnel at
        #    1M x 4096 — more than half the connect window).
        from .fused_insert import fused_raw_connect

        row_r = int(self.graph.nbrs.shape[1])  # fusion rows are 2*max_nbrs
        ok = new_ids_np >= 0
        ids_nb32 = np.asarray(ids_nb, dtype=np.int32)
        b = _bucket(nq)
        nid = np.full(b, -1, np.int32)
        nid[:nq] = np.where(ok, new_ids_np, -1)
        nrow = np.full((b, r), -1, np.int32)
        nrow[:nq] = np.where(ok[:, None], ids_nb32, -1)
        tick("prep")
        self._insert_key = getattr(self, "_insert_key", 0) + 1
        import jax as _jax

        nbrs2, touched_dev = fused_raw_connect(
            self.space, self.graph.nbrs, jnp.asarray(nid),
            jnp.asarray(nrow), _jax.random.PRNGKey(self._insert_key),
            row_w=row_r, chunk=min(8192, b * row_r))
        self.graph = Graph(nbrs=nbrs2, eps=self.graph.eps,
                           overlay=self.graph.overlay)
        if trace:
            np.asarray(nbrs2[:1])  # sync so the connect phase is visible
        tick("connect")
        if shadow is not None:
            # keep the shadow exactly in sync: re-encode the rows the fused
            # connect just wrote (new nodes + touched reverse dsts — a
            # device array straight from the kernel, no host round-trip).
            # The raw append above DONATED the slab the shadow aliased, so
            # every storage field rebinds to the post-append space here.
            self._shadow_sync(shadow,
                              jnp.concatenate([jnp.asarray(nid),
                                               touched_dev]))
            tick("shadowupd")
        # 4. draw levels and link into the overlay hierarchy (hnswlib.hpp
        #    add_point layers>0; P(level>=l)=R^-l)
        from .overlay_update import extend_overlay

        self.graph = extend_overlay(self.graph, self.space, new_ids_np,
                                    self._rng, r)
        tick("overlay")
        return new_ids_np

    def _raw_insert(self, vj):
        """Append into the raw space via the single-dispatch donated program
        when no other object aliases its buffers (a rabitq search_space
        adopts the raw slab at fit; donating it then would invalidate the
        alias mid-use) — eager fallback otherwise. The eager path costs ~12
        tunnel dispatch floors (~0.4 s) per batch."""
        ss = self.search_space
        aliased = (ss is not None and ss is not self.space
                   and getattr(ss, "data", None) is self.space.data)
        if aliased:
            return self.space.insert(vj)
        return self.space.insert_donated(vj)

    # ----------------------------------------- quantized insert traversal
    def _shadow_auto_on(self) -> bool:
        """Use an interim bsq8 shadow for the insert neighbor search?
        Raw-graph indices only (quantized indices already traverse their
        own search space); gated by size — below ~10k rows the f32
        traversal is already sub-dispatch-floor and the pack would cost
        more than it saves. ALAYA_INSERT_SHADOW=0 kills, =1 forces."""
        env = os.environ.get("ALAYA_INSERT_SHADOW", "")
        if env == "0":
            return False
        if (self.params.quantization_type is not QuantizationType.NONE
                or self.graph is None
                or self.space.data.dtype != jnp.float32):
            return False
        return env == "1" or int(self.space.num) >= 10_000

    def _ensure_ins_shadow(self):
        """Interim bsq8 block space over the CURRENT graph, used only for
        the insert-time neighbor search (the reference's insert traverses
        whatever space the index serves with, graph_update_job.hpp:66-89;
        a raw index here serves f32 but INSERT wants block speed). Aliases
        the raw slab — no f32 copy; packs ~N blocks once (~9 s at 1M),
        then stays in sync via _shadow_sync."""
        sh = getattr(self, "_ins_shadow", None)
        if sh is not None:
            return sh
        from ..spaces.bqg import BQGSpace

        t0 = time.time()
        w = int(self.graph.nbrs.shape[1])
        n = int(self.space.num)
        log.info("insert shadow: packing %d blocks (w=%d) ...", n, w)
        sp = BQGSpace.create(self.space.capacity, self.space.dim,
                             metric=self.space.user_metric, degree=w)
        live = self.space.data[:n]
        dmin = jnp.min(live, axis=0)
        scale = jnp.maximum((jnp.max(live, axis=0) - dmin) / 255.0, 1e-30)
        sp = sp.replace(data=self.space.data, sq_norms=self.space.sq_norms,
                        dmin=dmin, scale=scale, valid=self.space.valid,
                        num=jnp.asarray(n, jnp.int32))
        sp = sp.update_neighbors(self.graph.nbrs)
        self._ins_shadow = sp
        if os.environ.get("ALAYA_TRACE_INSERT") == "1":
            np.asarray(sp.nbr_codes[:1])
            log.info("insert shadow: packed %d blocks (w=%d) in %.2fs",
                     n, w, time.time() - t0)
        return sp

    def _shadow_insert_search(self, shadow, v, r: int, ef: int):
        """Step-1 neighbor search through the block shadow: one dispatch,
        exact-reranked top-r ids (block_beam_search reranks the whole pool
        with exact raw distances, so candidate ORDER matches the f32
        path)."""
        from .search import block_search_device

        nq = v.shape[0]
        qchunk = min(4096, _bucket(nq))
        b = -(-nq // qchunk) * qchunk
        q = np.pad(v, ((0, b - nq), (0, 0))) if b != nq else v
        qj = shadow.prep_query(jnp.asarray(q))
        d, i = block_search_device(
            shadow, self.graph.eps, qj, k=r, ef=ef,
            valid=self.space.valid,
            max_iters=int(getattr(self.params, "search_iters", 0)),
            n_expand=self.params.beam_expand, qchunk=qchunk,
            seed_sample=self._seed_scan_arrays())
        return np.asarray(i)[:nq], np.asarray(d)[:nq]

    def _shadow_sync(self, shadow, ids) -> None:
        """Rebind the shadow to the post-append slab and re-encode the
        blocks of ``ids`` (-1 pads drop; host or device array) from the
        updated adjacency."""
        from ..spaces.bqg import shadow_blocks_update

        ids = jnp.asarray(ids, jnp.int32)
        n_ids = int(ids.shape[0])
        chunk = 8192 if n_ids > 8192 else -(-max(n_ids, 1) // 256) * 256
        tp = -(-n_ids // chunk) * chunk
        if tp != n_ids:
            ids = jnp.concatenate(
                [ids, jnp.full(tp - n_ids, -1, jnp.int32)])
        ni, nc, nx = shadow_blocks_update(
            shadow.nbr_ids, shadow.nbr_codes, shadow.nbr_xsq,
            self.space.data, shadow.dmin, shadow.scale, self.graph.nbrs,
            ids, chunk=chunk,
            store_sq=shadow.metric == "l2")
        self._ins_shadow = shadow.replace(
            data=self.space.data, sq_norms=self.space.sq_norms,
            valid=self.space.valid, num=self.space.num,
            nbr_ids=ni, nbr_codes=nc, nbr_xsq=nx)

    def _insert_block_fused(self, vectors, ef: int = 100) -> np.ndarray:
        """Single-dispatch bsq8 insert (index/fused_insert.py): the whole
        GraphUpdateJob::insert_and_update pipeline in one jitted program.
        The host path (_insert_block) paid ~20 tunnel round-trips per batch
        (~47 vec/s measured r2); this pays 2 (raw append + fused step)."""
        import jax

        from .fused_insert import fused_block_insert

        v = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        nq = v.shape[0]
        b = _bucket(nq)
        vpad = np.zeros((b, v.shape[1]), np.float32)
        vpad[:nq] = v
        r = self.search_space.degree
        self._insert_key = getattr(self, "_insert_key", 0) + 1
        space2, nbrs2, ids = fused_block_insert(
            self.search_space, self.graph.nbrs, self.graph.eps,
            jnp.asarray(vpad), jnp.asarray(nq, jnp.int32),
            jax.random.PRNGKey(self._insert_key),
            self._seed_scan_arrays(),
            r=r, w=16, ef=max(int(ef), r), iters=0,
            m=self.params.beam_expand)
        self.search_space = space2
        self.graph = Graph(nbrs=nbrs2, eps=self.graph.eps,
                           overlay=self.graph.overlay)
        # the raw build space mirrors the same bump slots
        self.space, _raw_ids = self._raw_insert(jnp.asarray(v))
        return np.asarray(ids)[:nq]

    def _insert_block(self, vectors, ef: int = 100) -> np.ndarray:
        """Online insert into a block-quantized (QG) index: beam-search the
        new nodes' edges, append raw vectors, set + requantize the new nodes'
        neighbor blocks, and re-select + requantize every touched node's
        block (candidates = current edges ∪ new nodes, top-r by distance —
        the reference's GraphUpdateJob::update semantics,
        graph_update_job.hpp:105-137, with RaBitQSpace::update_nei's
        per-node requantization, rabitq_space.hpp:138-161). bsq8 takes the
        fused single-dispatch path; rabitq keeps the host-orchestrated one
        (its per-node requantization is centroid-relative)."""
        if self.params.quantization_type is QuantizationType.BSQ8:
            return self._insert_block_fused(vectors, ef)
        v = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        r = self.search_space.degree
        ids_nb, _d = self.batch_search_with_distance(v, r, ef=max(ef, r))
        self.space, new_ids = self._raw_insert(jnp.asarray(v))
        self.search_space, _ = self.search_space.insert_raw(jnp.asarray(v))
        new_ids_np = np.asarray(new_ids)
        ok = new_ids_np >= 0
        if not ok.any():
            return new_ids_np
        new_rows = np.asarray(ids_nb[ok], dtype=np.int32)

        touched, rev = _reverse_candidates(new_ids_np[ok], new_rows)
        all_ids = new_ids_np[ok]
        all_rows = new_rows
        if touched.size:
            cur = np.asarray(self.search_space.nbr_ids[jnp.asarray(touched)])
            cand = np.concatenate([cur, rev], axis=1)
            cand = np.where(cand == touched[:, None], -1, cand)  # no self-loop
            from .nsg import _gather_dists_chunked

            tpad, cpad, t = _pad_bucket(touched, cand)
            cd = _gather_dists_chunked(self.space, tpad, cpad, 2048)
            rows_touched = np.asarray(
                _topr_dedup(jnp.asarray(cd), jnp.asarray(cpad), r))[:t]
            all_ids = np.concatenate([all_ids, touched])
            all_rows = np.concatenate([all_rows, rows_touched], axis=0)
        # one batched requantization covers new + touched blocks; T-bucket
        # padding keeps the encode program's shapes recurring
        pid, prow, t_all = _pad_bucket(np.asarray(all_ids, dtype=np.int32),
                                       np.asarray(all_rows, dtype=np.int32))
        self.search_space = self.search_space.set_neighbor_rows(pid, prow)
        ids_j = jnp.asarray(np.asarray(all_ids, dtype=np.int32))
        rows_j = self.search_space.nbr_ids[ids_j]
        self.graph = Graph(nbrs=self.graph.nbrs.at[ids_j].set(rows_j),
                           eps=self.graph.eps, overlay=self.graph.overlay)
        return new_ids_np

    def remove(self, ids) -> None:
        """Tombstone removal (graph_update_job.hpp:91-103). When tombstones
        exceed ``params.compaction_threshold`` of the stored vectors, a
        batched compaction rewires every affected node through the removed
        nodes' 2-hop neighborhoods (the reference's lazy update() pass)."""
        self._require_fitted()
        raw = np.atleast_1d(np.asarray(ids))
        if raw.size and (raw.min() < 0 or raw.max() >= self.space.capacity):
            # the spaces clip ids into range before scattering the
            # tombstone — an out-of-range id (e.g. a stale 64-bit id)
            # would silently remove whatever lives at the clip target
            raise ValueError(
                f"remove: id out of range [0, {self.space.capacity}) "
                f"(got min={raw.min()}, max={raw.max()})")
        self._mutations = getattr(self, "_mutations", 0) + 1
        self._ins_shadow = None  # stale valid mask; repack on next insert
        arr = jnp.atleast_1d(jnp.asarray(ids, dtype=jnp.int32))
        same = self.search_space is self.space
        self.space = self.space.remove(arr)
        if same:
            self.search_space = self.space
        else:
            self.search_space = self.search_space.remove(arr)
        if self.graph is None:
            return
        self._removed.extend(int(x) for x in np.atleast_1d(np.asarray(ids)))
        thr = float(getattr(self.params, "compaction_threshold", 0.2))
        if thr <= 0 or not self._removed:
            return
        live = int(np.asarray(self.space.valid[: int(self.space.num)]).sum())
        if len(self._removed) > thr * max(live, 1):
            self.compact()

    def compact(self) -> None:
        """Rewire edges around accumulated tombstones and drop them from the
        overlay. Ids are stable; removed slots stay tombstoned (the bump
        allocator never reuses them — same as the reference's remove)."""
        self._require_fitted()
        if self.graph is None or not self._removed:
            self._removed = []
            return
        removed = np.unique(np.asarray(self._removed, dtype=np.int32))
        from .overlay_update import strip_overlay

        # affected set computed on device: the [C, W] adjacency never
        # downloads (128 MB at 1M); the host sees one [C] byte mask
        nbrs_dev = self.graph.nbrs
        c = nbrs_dev.shape[0]
        mask = jnp.zeros((c,), bool).at[
            jnp.asarray(np.clip(removed, 0, c - 1))].set(True)
        hit = jnp.any((nbrs_dev >= 0)
                      & mask[jnp.clip(nbrs_dev, 0, c - 1)], axis=1) & ~mask
        affected = np.flatnonzero(np.asarray(hit)).astype(np.int32)
        t0 = time.time()
        if affected.size:
            self.update_nodes(affected, _removed=removed)
        self.graph = strip_overlay(self.graph, removed)
        eps = np.asarray(self.graph.eps)
        if np.isin(eps, removed).any():
            # replace dead entry points with live ones
            valid = np.asarray(self.space.valid)
            pool = np.flatnonzero(valid)
            if pool.size:
                fresh = self._rng.choice(pool, size=eps.shape[0])
                eps = np.where(np.isin(eps, removed), fresh, eps).astype(
                    np.int32)
                self.graph = Graph(nbrs=self.graph.nbrs,
                                   eps=jnp.asarray(eps),
                                   overlay=self.graph.overlay)
        log.info("compact: %d tombstones, %d nodes rewired in %.2fs",
                 removed.size, affected.size, time.time() - t0)
        self._removed = []

    def update_nodes(self, ids, _removed=None) -> None:
        """Per-node edge rebuild (GraphUpdateJob::update,
        graph_update_job.hpp:105-137): candidates = current edges ∪ removed
        neighbors' edges (2-hop detour), top-R by exact distance. For block
        indices the rebuilt rows are requantized in the same pass."""
        self._require_fitted()
        if self.graph is None:
            raise RuntimeError("flat index has no graph to update")
        self._ins_shadow = None  # rows rewritten below; repack on next insert
        ids = np.atleast_1d(np.asarray(ids, dtype=np.int32))
        if ids.size == 0:
            return
        # pad the affected set to a 2048-bucket with copies of ids[0]: the
        # top-R dedup and block requantization are jitted on [A, W] and a
        # data-dependent A is a fresh compile per compact. Duplicate ids
        # scatter identical rows (computed from identical candidates), so
        # write order is immaterial.
        a_pad = -(-ids.size // 2048) * 2048
        if a_pad > ids.size:
            ids = np.concatenate(
                [ids, np.full(a_pad - ids.size, ids[0], np.int32)])
        removed = (np.empty(0, np.int32) if _removed is None
                   else np.asarray(_removed, dtype=np.int32))
        # device-resident rebuild: candidates, distances, top-R selection,
        # requantization, and the adjacency scatter all stay on chip. The
        # previous host path round-tripped ~0.5 GB of candidate/distance
        # matrices per 100k compact through the tunnel (73 s measured warm);
        # now only the id list goes up.
        nbrs_dev = self.graph.nbrs
        c = nbrs_dev.shape[0]
        w = nbrs_dev.shape[1]
        mask = (jnp.zeros((c,), bool).at[
            jnp.asarray(np.clip(removed, 0, c - 1))].set(True)
            if removed.size else jnp.zeros((c,), bool))
        block = self.params.quantization_type.is_block
        r = self.search_space.degree if block else w
        new_nbrs = nbrs_dev
        for lo in range(0, ids.size, 8192):
            sub = ids[lo: lo + 8192]
            if sub.size < 8192 and ids.size > 8192:
                sub = np.concatenate(
                    [sub, np.full(8192 - sub.size, ids[0], np.int32)])
            ids_dev = jnp.asarray(sub)
            rows = _rewire_rows_dev(self.space, nbrs_dev, mask, ids_dev,
                                    r=r)
            if block:
                self.search_space = self.search_space.set_neighbor_rows(
                    ids_dev, rows)
                rows = self.search_space.nbr_ids[ids_dev]
            if rows.shape[1] < w:
                rows = jnp.pad(rows, ((0, 0), (0, w - rows.shape[1])),
                               constant_values=-1)
            new_nbrs = new_nbrs.at[ids_dev].set(rows[:, :w])
        self.graph = Graph(nbrs=new_nbrs, eps=self.graph.eps,
                           overlay=self.graph.overlay)

    def get_data_by_id(self, id_: int) -> np.ndarray:
        self._require_fitted()
        return np.asarray(self.space.data[int(id_)].astype(jnp.float32))

    @property
    def num(self) -> int:
        return int(self.space.num) if self.space is not None else 0

    @property
    def capacity(self) -> int:
        return self.space.capacity if self.space is not None else self.params.capacity

    # ---------------------------------------------------------- persistence
    def save(self, directory: Union[str, os.PathLike]) -> None:
        """schema.json + npz blobs — same layout contract as the reference's
        {index file, raw.data, quant.data} naming (schema.py:58-68)."""
        self._require_fitted()
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "schema.json"), "w") as f:
            f.write(self.params.to_json())
        np.savez(os.path.join(directory, self.params.data_filename() + ".npz"),
                 **self.space.save_arrays())
        if self.graph is not None:
            np.savez(os.path.join(directory, self.params.index_filename() + ".npz"),
                     **self.graph.save_arrays())
        qf = self.params.quant_filename()
        if qf is not None and self.search_space is not self.space:
            np.savez(os.path.join(directory, qf + ".npz"),
                     **self.search_space.save_arrays())

    @classmethod
    def load(cls, directory: Union[str, os.PathLike]) -> "IndexEngine":
        with open(os.path.join(directory, "schema.json")) as f:
            params = IndexParams.from_json(f.read())
        eng = cls(params)
        from ..spaces.raw import RawSpace

        with np.load(os.path.join(directory, params.data_filename() + ".npz"),
                     allow_pickle=False) as z:
            eng.space = RawSpace.load_arrays(dict(z.items()),
                                             storage_dtype=params.storage_dtype)
        gpath = os.path.join(directory, params.index_filename() + ".npz")
        if os.path.exists(gpath):
            with np.load(gpath, allow_pickle=False) as z:
                eng.graph = Graph.load_arrays(dict(z.items()))
        qf = params.quant_filename()
        eng.search_space = eng.space
        if qf is not None:
            qpath = os.path.join(directory, qf + ".npz")
            if os.path.exists(qpath):
                qtype = _quant_space_type(params)
                with np.load(qpath, allow_pickle=False) as z:
                    eng.search_space = qtype.load_arrays(dict(z.items()))
        eng._fitted = True
        return eng


def _pad_bucket(ids: np.ndarray, rows: np.ndarray, bucket: int = 256):
    """Pad (ids [T], rows [T, W]) to a T-bucket so jitted consumers see a
    small, recurring set of shapes instead of one fresh shape per insert
    batch (each fresh shape recompiles — ~30 s through a TPU tunnel).
    Pad entries repeat the (ids[0], rows[0]) PAIR: scatter order for
    duplicate indices is undefined in XLA, so every duplicate write must
    carry identical data — padding ids[0] with -1 rows wiped the first
    real row (round-2 advisor finding)."""
    t = ids.shape[0]
    b = bucket if t <= 8 * bucket else 8 * bucket
    tp = -(-t // b) * b
    if tp == t:
        return ids, rows, t
    pid = np.full(tp, ids[0], dtype=np.int32)
    pid[:t] = ids
    prow = np.broadcast_to(rows[0], (tp, rows.shape[1])).copy()
    prow[:t] = rows
    return pid, prow, t


def _reverse_candidates(src_ids: np.ndarray, dst_rows: np.ndarray):
    """Invert (source node → its edge list) into per-destination candidate
    lists: one stable sort, no python loop. Returns (touched [T] i32,
    rev [T, maxc] i32 -1-padded) where rev lists the sources pointing at
    each touched destination."""
    r = dst_rows.shape[1]
    src = np.repeat(np.asarray(src_ids, dtype=np.int32), r)
    dst = np.asarray(dst_rows, dtype=np.int32).reshape(-1)
    keep = dst >= 0
    src, dst = src[keep], dst[keep]
    if not dst.size:
        return (np.empty(0, np.int32), np.empty((0, 0), np.int32))
    order = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[order], src[order]
    touched, start, counts = np.unique(dst_s, return_index=True,
                                       return_counts=True)
    # width padded to a 16-bucket: the downstream gather/prune programs
    # are jitted per candidate width, and a fresh width per insert batch
    # meant a recompile per batch (~30 s through a TPU tunnel — measured
    # 16 vec/s steady-state insert before bucketing)
    maxc = -(-int(counts.max()) // 16) * 16
    rev = np.full((touched.size, maxc), -1, dtype=np.int32)
    pos = np.arange(dst_s.size) - np.repeat(start, counts)
    rev[np.repeat(np.arange(touched.size), counts), pos] = src_s
    return touched.astype(np.int32), rev


@functools.partial(jax.jit, static_argnames=("r",))
def _rewire_rows_dev(space, nbrs_dev, removed_mask, ids_dev, r: int):
    """Device-resident candidate rebuild for update(): candidates = live
    current edges ∪ removed neighbors' live edges (the 2-hop detour,
    graph_update_job.hpp:105-137), exact top-r with keep-best dedup.
    Reads the adjacency snapshot ``nbrs_dev``; only ids cross the host
    boundary."""
    a = ids_dev.shape[0]
    n = removed_mask.shape[0]
    cur = nbrs_dev[ids_dev]                                    # [A, W]
    safe = jnp.clip(cur, 0, n - 1)
    is_live = (cur >= 0) & ~removed_mask[safe]
    is_rem = (cur >= 0) & removed_mask[safe]
    direct = jnp.where(is_live, cur, -1)
    hop2 = nbrs_dev[jnp.where(is_rem, cur, 0)]                 # [A, W, W]
    ok2 = (is_rem[:, :, None] & (hop2 >= 0)
           & ~removed_mask[jnp.clip(hop2, 0, n - 1)])
    cand = jnp.concatenate(
        [direct, jnp.where(ok2, hop2, -1).reshape(a, -1)], axis=1)
    cand = jnp.where(cand == ids_dev[:, None], -1, cand)
    q = space.data[ids_dev].astype(jnp.float32)
    d = space.gather_dists(q, jnp.where(cand >= 0, cand, 0))
    d = jnp.where(cand >= 0, d, jnp.inf)
    return _topr_dedup(d, cand, r)


@functools.partial(jax.jit, static_argnames=("r",))
def _topr_dedup(cand_d: jax.Array, cand_i: jax.Array, r: int):
    """Top-r candidates by distance with duplicate ids dropped (keep-best) —
    the reference update()'s candidate re-selection
    (graph_update_job.hpp:105-137)."""
    from .prune import _sort_dedup

    _, ids = _sort_dedup(cand_d, cand_i)
    return ids[:, :r]


@functools.partial(jax.jit, static_argnames=("k",))
def _rerank_exact(space, q: jax.Array, pool: jax.Array, k: int):
    """Exact (HIGHEST-precision) final rerank of quantized-search
    candidates (reference: index.hpp:450-488). This is the user-facing
    re-score — RawSpace.gather_dists' fast-precision einsum is for
    traversal ordering only (raw.py's own contract) and misorders
    near-ties at ~0.4% relative error."""
    safe = jnp.where(pool >= 0, pool, 0)
    vecs = space.data[safe].astype(jnp.float32)
    dot = jnp.einsum("bkd,bd->bk", vecs, q,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    if space.metric == "ip":
        d = -dot
    else:
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        d = jnp.maximum(q_sq + space.sq_norms[safe] - 2.0 * dot, 0.0)
    d = jnp.where(pool >= 0, d, jnp.inf)
    nd, sel = jax.lax.top_k(-d, k)
    ids = jnp.take_along_axis(pool, sel, axis=1)
    return -nd, jnp.where(jnp.isfinite(-nd), ids, -1)
