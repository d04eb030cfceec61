"""Mesh-sharded single-graph construction.

Builds ONE graph index with the node rows sharded over a device mesh's
"db" axis, so the build-time working set (vectors + kNN state + candidate
pools) scales with the number of chips instead of being bound by one
chip's HBM — the parallel-build slot of SURVEY.md §2c (the reference
parallelizes HNSWBuilder across host threads over shared memory,
include/index/graph/hnsw/hnsw_builder.hpp:115-127; here the "shared
memory" is the mesh).

Everything is SPMD over the mesh's "db" axis with `shard_map`:

  - every per-node state tensor (data, sq_norms, kNN rows, pools,
    adjacency) lives row-sharded: device p owns rows [p·Nl, (p+1)·Nl);
  - each phase processes ONLY its own rows — P-way compute parallelism;
  - candidate scoring needs vectors owned by other devices. Instead of an
    all-gather of the database (which would reinstate the single-chip HBM
    bound), the data shards ROTATE around the ring (`lax.ppermute`): at
    stage s device p holds shard (p+s) mod P and scores the candidates
    that fall in that id range. Peak memory stays O(N/P · D); ICI traffic
    for one rotation equals one all-gather, streamed.
  - small global state (the [N, K] kNN ids needed for the
    neighbors-of-neighbors join and the reverse-edge scatter) IS
    all-gathered per round: ids, not vectors (128 MB at 1M×K=32).

Phases mirror the single-device pipeline (index/build_phases.py) with the
sequential beam-search pools replaced by sampled 2-hop CAGRA-style pools
(gather-shaped instead of hop-shaped, which is what makes them
ring-schedulable):

  NN-Descent rounds → sampled 2-hop pools → occlusion prune →
  bounded reverse → re-prune → (single-device) connectivity repair.

The finished adjacency is assembled host-side and served by the normal
single-device engine (or re-sharded for db-sharded serving); the mesh is
a BUILD-time scaling axis. Recall parity with the single-device build is
asserted by tests/test_build_sharded.py on an 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("alayalite_tpu")

FINF = float("inf")  # plain python: jnp constants at module level would init the backend


def make_build_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D ("db",) mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("db",))


def _ring_perm(p: int):
    """Shift-by-one ring: device i sends to i-1, so after s hops device p
    holds the shard that started at (p+s) mod P."""
    return [(i, (i - 1) % p) for i in range(p)]


# --------------------------------------------------------------------- ring
def _ring_dists(q, qsq, blk0, blk_sq0, cand, nring: int, n: int,
                metric: str, chunk: int):
    """Distances from each query row to its candidate ids, with the
    database shards rotating once around the ring.

    q [Q, D] f32 — local query rows (their own sq norms in qsq [Q]);
    blk0 [Nl, D] — this device's resident data shard (rotates);
    cand [Q, M] i32 GLOBAL ids; ids < 0 or >= n score +inf.
    Chunked over Q inside each stage to bound the [chunk, M, D] gather."""
    nl = blk0.shape[0]
    qn, m = cand.shape
    d_dim = q.shape[1]
    p_idx = jax.lax.axis_index("db")
    cand = jnp.where(cand < n, cand, -1)
    out = jnp.full((qn, m), FINF, jnp.float32)
    blk = blk0.astype(jnp.bfloat16)
    blk_sq = blk_sq0
    nck = qn // chunk

    def stage(s, carry):
        out, blk, blk_sq = carry
        lo_g = jax.lax.rem(p_idx + s, nring) * nl

        def body(ci, out):
            clo = ci * chunk
            ids = jax.lax.dynamic_slice(cand, (clo, 0), (chunk, m))
            qc = jax.lax.dynamic_slice(q, (clo, 0), (chunk, d_dim)
                                       ).astype(jnp.bfloat16)
            rel = ids - lo_g
            hit = (ids >= 0) & (rel >= 0) & (rel < nl)
            safe = jnp.clip(rel, 0, nl - 1)
            v = blk[safe]                                      # [C, M, D]
            dot = jnp.einsum("cmd,cd->cm", v, qc,
                             preferred_element_type=jnp.float32)
            if metric == "ip":
                dd = -dot
            else:
                qsq_c = jax.lax.dynamic_slice(qsq, (clo,), (chunk,))
                dd = jnp.maximum(
                    qsq_c[:, None] + blk_sq[safe] - 2.0 * dot, 0.0)
            dd = jnp.where(hit, dd, FINF)
            cur = jax.lax.dynamic_slice(out, (clo, 0), (chunk, m))
            return jax.lax.dynamic_update_slice(
                out, jnp.minimum(cur, dd), (clo, 0))

        out = jax.lax.fori_loop(0, nck, body, out)
        blk = jax.lax.ppermute(blk, "db", _ring_perm(nring))
        blk_sq = jax.lax.ppermute(blk_sq, "db", _ring_perm(nring))
        return out, blk, blk_sq

    out, _, _ = jax.lax.fori_loop(0, nring, stage, (out, blk, blk_sq))
    return out


def _ring_gather(blk0, blk_sq0, ids, nring: int, n: int):
    """Materialize candidate vectors (+ their sq norms) from the rotating
    shards: ids [C, M] global → (vecs [C, M, D] bf16, sq [C, M] f32)."""
    nl, d_dim = blk0.shape
    p_idx = jax.lax.axis_index("db")
    ids = jnp.where(ids < n, ids, -1)
    vecs = jnp.zeros(ids.shape + (d_dim,), jnp.bfloat16)
    sq = jnp.zeros(ids.shape, jnp.float32)
    blk = blk0.astype(jnp.bfloat16)
    blk_sq = blk_sq0

    def stage(s, carry):
        vecs, sq, blk, blk_sq = carry
        rel = ids - jax.lax.rem(p_idx + s, nring) * nl
        hit = (ids >= 0) & (rel >= 0) & (rel < nl)
        safe = jnp.clip(rel, 0, nl - 1)
        vecs = jnp.where(hit[..., None], blk[safe], vecs)
        sq = jnp.where(hit, blk_sq[safe], sq)
        blk = jax.lax.ppermute(blk, "db", _ring_perm(nring))
        blk_sq = jax.lax.ppermute(blk_sq, "db", _ring_perm(nring))
        return vecs, sq, blk, blk_sq

    vecs, sq, _, _ = jax.lax.fori_loop(0, nring, stage,
                                       (vecs, sq, blk, blk_sq))
    return vecs, sq


def _occlude_mat(cand_d, cand_i, vecs_c, sq_c, r: int, alpha: float,
                 metric: str):
    """MRNG occlusion rule over pre-materialized candidate vectors — the
    same greedy scan as prune.occlusion_prune_chunk, with pair distances
    from the ring-gathered [C, M, D] tensor instead of a space gather.
    cand_d/cand_i must be sorted ascending (pads: -1/+inf)."""
    c, m = cand_i.shape
    dots = jnp.einsum("cmd,cnd->cmn", vecs_c, vecs_c,
                      preferred_element_type=jnp.float32)
    if metric == "ip":
        pair_d = -dots
    else:
        pair_d = jnp.maximum(
            sq_c[:, :, None] + sq_c[:, None, :] - 2.0 * dots, 0.0)
    valid = cand_i >= 0

    def make_step(a):
        def step(carry, j):
            selected, count = carry
            d_j = cand_d[:, j]
            # sign-safe alpha threshold + progressive relaxation, same as
            # prune.occlusion_prune_chunk (see the rationale there)
            if a == 1.0:
                thr = d_j
            else:
                thr = d_j * jnp.where(d_j >= 0, 1.0 / a, a)
            occ = jnp.any(selected & (pair_d[:, :, j] < thr[:, None]),
                          axis=1)
            take = (valid[:, j] & jnp.isfinite(d_j) & (~occ) & (count < r)
                    & (~selected[:, j]))
            selected = selected.at[:, j].set(selected[:, j] | take)
            return (selected, count + take.astype(jnp.int32)), None
        return step

    init = (jnp.zeros((c, m), dtype=bool), jnp.zeros((c,), jnp.int32))
    (selected, count), _ = jax.lax.scan(make_step(1.0), init, jnp.arange(m))
    if alpha != 1.0:
        (selected, count), _ = jax.lax.scan(make_step(alpha),
                                            (selected, count), jnp.arange(m))
    sel_d = jnp.where(selected, cand_d, FINF)
    _, order = jax.lax.top_k(-sel_d, r)
    return jnp.take_along_axis(jnp.where(selected, cand_i, -1), order,
                               axis=1)


# ------------------------------------------------------------------ builder
class ShardedGraphBuilder:
    """Build one graph's base adjacency with rows sharded over "db".

    Produces the same artifact as HNSWBuilder's base layer (an [n, r]
    adjacency + an entry point); `build_graph_sharded` wraps it with the
    overlay + connectivity repair into an engine-ready Graph.
    """

    def __init__(self, mesh: Optional[Mesh] = None, r: int = 32,
                 knn_k: int = 32, ef: int = 0, alpha: float = 1.0,
                 rounds: int = 0, seed: int = 0, chunk: int = 1024,
                 metric: str = "l2"):
        self.mesh = mesh if mesh is not None else make_build_mesh()
        self.p = int(self.mesh.shape["db"])
        self.r = r
        self.knn_k = knn_k
        self.ef = ef if ef > 0 else max(2 * r, 64)
        self.alpha = alpha
        self.rounds = rounds
        self.seed = seed
        self.chunk = chunk
        self.metric = metric
        self._jits = {}

    # ---------------------------------------------------------------- build
    def build(self, data: np.ndarray, n: Optional[int] = None,
              ) -> Tuple[np.ndarray, int]:
        """→ (adjacency [n, r] int32, -1 pad; entry point id)."""
        t0 = time.time()
        data = np.asarray(data, dtype=np.float32)
        if n is None:
            n = data.shape[0]
        nl0 = -(-n // self.p)
        chunk = max(64, min(self.chunk, (nl0 // 64) * 64 or nl0))
        nl = -(-nl0 // chunk) * chunk
        npad = nl * self.p
        dpad = np.zeros((npad, data.shape[1]), np.float32)
        dpad[:n] = data[:n]
        dd = self._shard(dpad, P("db", None))
        sq = self._shard((dpad * dpad).sum(axis=1).astype(np.float32),
                         P("db"))
        key = jax.random.PRNGKey(self.seed)

        k = self.knn_k
        # random init needs ~log2(n) descent rounds (the single-device
        # pipeline starts near-converged from a cluster init; here the
        # shards rotate, so every round is a full ring pass) — the old
        # log2(n)-6 cap left the kNN graph unconverged at >=16k (r5)
        rounds = self.rounds if self.rounds > 0 else max(
            8, int(np.ceil(np.log2(max(n, 2)))) + 2)

        kd, ki = self._phase("init", n, chunk, k=k)(dd, sq, key)
        log.info("sharded knn init %.1fs", time.time() - t0)
        for rd in range(rounds):
            kd, ki, changed = self._phase("round", n, chunk, k=k)(
                dd, sq, kd, ki, jax.random.fold_in(key, 101 + rd))
            ch = int(changed)
            log.info("sharded nnd round %d/%d: %d changed (%.1fs)",
                     rd + 1, rounds, ch, time.time() - t0)
            if ch < max(64, (n * k) // 2000):
                break

        pool_d, pool_i = self._phase("pools", n, max(64, chunk // 8),
                                     k=k)(dd, sq, kd, ki)
        log.info("sharded pools %.1fs", time.time() - t0)

        cand_d = jnp.concatenate([pool_d, kd], axis=1)
        cand_i = jnp.concatenate([pool_i, ki], axis=1)
        nbrs = self._phase("prune", n, max(64, chunk // 4),
                           m=int(cand_i.shape[1]))(dd, sq, cand_d, cand_i)
        log.info("sharded prune %.1fs", time.time() - t0)

        nbrs = self._phase("reprune", n, max(64, chunk // 4))(
            dd, sq, nbrs, jax.random.fold_in(key, 7))
        log.info("sharded reprune %.1fs", time.time() - t0)

        # degree fill (single-device fill_degree_dev analog): occlusion
        # thins rows to ~r/3 (16k probe: mean degree 8.6/24) — fill the
        # free slots with the nearest unselected pool candidates. Without
        # it the graph is an RNG-island archipelago that repair's single
        # bridges cannot make navigable (served recall 0.44 vs 0.98).
        nbrs = self._phase("fill", n, max(64, chunk // 4),
                           m=int(cand_i.shape[1]))(nbrs, cand_d, cand_i)
        log.info("sharded fill %.1fs", time.time() - t0)

        nbrs_np = np.asarray(nbrs)[:n]
        nbrs_np = np.where(nbrs_np < n, nbrs_np, -1).astype(np.int32)
        # entry point: medoid of a sample (host, cheap)
        rng = np.random.default_rng(self.seed)
        samp = data[rng.integers(0, n, size=min(n, 4096))]
        mean = samp.mean(axis=0, keepdims=True)
        head = data[: min(n, 65536)]
        ep = int(np.argmin(((head - mean) ** 2).sum(axis=1)))
        log.info("sharded build done: n=%d r=%d over %d devices in %.1fs",
                 n, self.r, self.p, time.time() - t0)
        return nbrs_np, ep

    # ------------------------------------------------------------ phase jit
    def _shard(self, x, spec):
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def _phase(self, name: str, n: int, chunk: int, **kw):
        key = (name, n, chunk, tuple(sorted(kw.items())))
        if key not in self._jits:
            self._jits[key] = getattr(self, f"_make_{name}")(n, chunk, **kw)
        return self._jits[key]

    def _make_init(self, n: int, chunk: int, k: int):
        p, metric = self.p, self.metric

        @functools.partial(jax.jit)
        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P("db", None), P("db"), P()),
            out_specs=(P("db", None), P("db", None)),
            check_vma=False)
        def init(dd, sq, key):
            from ..index.prune import _sort_dedup

            nl = dd.shape[0]
            base = jax.lax.axis_index("db") * nl
            me = base + jnp.arange(nl, dtype=jnp.int32)[:, None]
            cand = jax.random.randint(jax.random.fold_in(key, base),
                                      (nl, k + 8), 0, n, dtype=jnp.int32)
            cand = jnp.where(cand == me, -1, cand)
            d = _ring_dists(dd, sq, dd, sq, cand, p, n, metric, chunk)
            sd, si = _sort_dedup(d, cand)
            return sd[:, :k], si[:, :k]

        return init

    def _make_round(self, n: int, chunk: int, k: int):
        p, metric = self.p, self.metric
        # sample widths follow the single-device driver (nndescent.
        # build_knn_graph): the r5 100k artifact run showed the old
        # (8, 4, 8, 4) join — 44 candidates/round vs the single path's
        # 148 — converging so slowly that the round budget ran out with
        # the kNN graph still random-grade (served recall 0.72 vs 0.98
        # single-device at ef=64; results/sharded_build_100k.json r5).
        s1 = max(4, k // 2)
        s2 = max(4, k // 4)
        s_rev = max(8, k // 2)
        n_rand = 4

        @functools.partial(jax.jit, donate_argnums=(2, 3))
        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P("db", None), P("db"), P("db", None), P("db", None),
                      P()),
            out_specs=(P("db", None), P("db", None), P()),
            check_vma=False)
        def rnd(dd, sq, kd, ki, key):
            from ..index.nndescent import _dedup_merge_fast

            nl = ki.shape[0]
            base = jax.lax.axis_index("db") * nl
            k_nb, k_slot, k_h, k_r = jax.random.split(key, 4)
            # global kNN ids: the neighbors-of-neighbors join reads rows
            # owned by every device (ids only — vectors stay sharded)
            ki_full = jax.lax.all_gather(ki, "db", axis=0, tiled=True)
            npd = ki_full.shape[0]
            # forward samples for ALL nodes (identical on every device:
            # same key, same ki_full) — the sources of the reverse edges
            # landing in OWN rows can be anywhere
            sel1 = jax.random.randint(k_nb, (npd, s1), 0, k)
            mid_full = jnp.take_along_axis(ki_full, sel1, axis=1)
            src = jnp.broadcast_to(
                jnp.arange(npd, dtype=jnp.int32)[:, None], (npd, s1))
            slot = jax.random.randint(k_slot, (npd, s1), 0, s_rev)
            rel_dst = mid_full - base
            ok = (mid_full >= 0) & (rel_dst >= 0) & (rel_dst < nl)
            rev = jnp.full((nl, s_rev), -1, jnp.int32)
            rev = rev.at[jnp.where(ok, rel_dst, nl).reshape(-1),
                         slot.reshape(-1)].set(src.reshape(-1),
                                               mode="drop")
            # candidates for own rows
            mid_c = jax.lax.dynamic_slice(mid_full, (base, 0), (nl, s1))
            their = ki_full[jnp.where(mid_c >= 0, mid_c, 0)]
            sel2 = jax.random.randint(k_h, (nl, s1, s2), 0, k)
            hop2 = jnp.take_along_axis(their, sel2, axis=2)
            hop2 = jnp.where(mid_c[:, :, None] >= 0, hop2,
                             -1).reshape(nl, s1 * s2)
            rand = jax.random.randint(
                jax.random.fold_in(k_r, base), (nl, n_rand), 0, n,
                dtype=jnp.int32)
            cand = jnp.concatenate([hop2, rev, rand], axis=1)
            me = base + jnp.arange(nl, dtype=jnp.int32)[:, None]
            cand = jnp.where(cand == me, -1, cand)
            d = _ring_dists(dd, sq, dd, sq, cand, p, n, metric, chunk)

            m = cand.shape[1]
            nck = nl // chunk

            def body(ci, st):
                kd, ki, changed = st
                lo = ci * chunk
                kd_c = jax.lax.dynamic_slice(kd, (lo, 0), (chunk, k))
                ki_c = jax.lax.dynamic_slice(ki, (lo, 0), (chunk, k))
                d_c = jax.lax.dynamic_slice(d, (lo, 0), (chunk, m))
                c_c = jax.lax.dynamic_slice(cand, (lo, 0), (chunk, m))
                nd, ni = _dedup_merge_fast(kd_c, ki_c, d_c, c_c, k)
                changed += jnp.sum(ni != ki_c)
                kd = jax.lax.dynamic_update_slice(kd, nd, (lo, 0))
                ki = jax.lax.dynamic_update_slice(ki, ni, (lo, 0))
                return kd, ki, changed

            kd, ki, changed = jax.lax.fori_loop(
                0, nck, body, (kd, ki, jnp.zeros((), jnp.int32)))
            return kd, ki, jax.lax.psum(changed, "db")

        return rnd

    def _make_pools(self, n: int, chunk: int, k: int):
        p, metric = self.p, self.metric
        ef = self.ef
        # sampled 2-hop: full K² joins cost O(N·K²) ids; 16 samples per
        # neighbor keep the pool gather-shaped at half the width (the NND
        # graph is converged — pools only need ef good candidates; 8
        # samples measured -0.05 recall vs the single-device beam pools)
        s2 = min(k, 16)

        @functools.partial(jax.jit)
        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P("db", None), P("db"), P("db", None), P("db", None)),
            out_specs=(P("db", None), P("db", None)),
            check_vma=False)
        def pools(dd, sq, kd, ki):
            from ..index.prune import _sort_dedup

            nl = ki.shape[0]
            base = jax.lax.axis_index("db") * nl
            ki_full = jax.lax.all_gather(ki, "db", axis=0, tiled=True)
            m = k + k * s2
            ww = min(ef, m)
            pool_d = jnp.full((nl, ww), FINF, jnp.float32)
            pool_i = jnp.full((nl, ww), -1, jnp.int32)
            key = jax.random.PRNGKey(17)
            nck = nl // chunk

            # dedicated LONG-edge slots (r5): a converged kNN's 2-hop pool
            # is purely local — occlusion then emits RNG islands (16k probe:
            # 1.6% BFS-reachable from ep, served recall 0.44) and repair's
            # one-bridge-per-component can't restore navigability. The
            # single-device pipeline's beam pools carry en-route mid-range
            # nodes for free; here Vamana-style random candidates ride in
            # slots EXEMPT from the nearest-ww truncation, and the
            # occlusion rule keeps the few diverse ones.
            n_long = 8
            pool_d = jnp.full((nl, ww + n_long), FINF, jnp.float32)
            pool_i = jnp.full((nl, ww + n_long), -1, jnp.int32)

            def body(ci, carry):
                pool_d, pool_i = carry
                lo = ci * chunk
                ki_c = jax.lax.dynamic_slice(ki, (lo, 0), (chunk, k))
                their = ki_full[jnp.where(ki_c >= 0, ki_c, 0)]
                sel = jax.random.randint(jax.random.fold_in(key, base + lo),
                                         (chunk, k, s2), 0, k)
                hop2 = jnp.take_along_axis(their, sel, axis=2)
                hop2 = jnp.where((ki_c >= 0)[:, :, None], hop2,
                                 -1).reshape(chunk, k * s2)
                rand = jax.random.randint(
                    jax.random.fold_in(key, 7770 + base + lo),
                    (chunk, n_long), 0, n, dtype=jnp.int32)
                cand = jnp.concatenate([ki_c, hop2, rand], axis=1)
                me = (base + lo
                      + jnp.arange(chunk, dtype=jnp.int32)[:, None])
                cand = jnp.where(cand == me, -1, cand)
                qc = jax.lax.dynamic_slice(dd, (lo, 0),
                                           (chunk, dd.shape[1]))
                qsq = jax.lax.dynamic_slice(sq, (lo,), (chunk,))
                d = _ring_dists(qc, qsq, dd, sq, cand, p, n, metric, chunk)
                d_r, c_r = d[:, -n_long:], cand[:, -n_long:]
                sd, si = _sort_dedup(d[:, :-n_long], cand[:, :-n_long])
                pool_d = jax.lax.dynamic_update_slice(
                    pool_d, jnp.concatenate([sd[:, :ww], d_r], axis=1),
                    (lo, 0))
                pool_i = jax.lax.dynamic_update_slice(
                    pool_i, jnp.concatenate([si[:, :ww], c_r], axis=1),
                    (lo, 0))
                return pool_d, pool_i

            return jax.lax.fori_loop(0, nck, body, (pool_d, pool_i))

        return pools

    def _make_fill(self, n: int, chunk: int, m: int):
        p = self.p
        r = self.r

        @functools.partial(jax.jit, donate_argnums=(0,))
        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P("db", None), P("db", None), P("db", None)),
            out_specs=P("db", None), check_vma=False)
        def fill(nbrs, cd, ci):
            nl = nbrs.shape[0]
            base = jax.lax.axis_index("db") * nl
            nck = nl // chunk

            def body(k_, out):
                lo = k_ * chunk
                row = jax.lax.dynamic_slice(out, (lo, 0), (chunk, r))
                cd_c = jax.lax.dynamic_slice(cd, (lo, 0), (chunk, m))
                ci_c = jax.lax.dynamic_slice(ci, (lo, 0), (chunk, m))
                me = (base + lo
                      + jnp.arange(chunk, dtype=jnp.int32)[:, None])
                in_row = jnp.any(ci_c[:, :, None] == row[:, None, :],
                                 axis=2)
                ok = ((ci_c >= 0) & (ci_c < n) & ~in_row & (ci_c != me)
                      & jnp.isfinite(cd_c))
                order = jnp.argsort(jnp.where(ok, cd_c, FINF), axis=1)
                add = jnp.take_along_axis(
                    jnp.where(ok, ci_c, -1), order, axis=1)[:, :r]
                # pool ∪ kNN candidates overlap: drop later duplicates
                dup = jnp.any((add[:, None, :] == add[:, :, None])
                              & jnp.triu(jnp.ones((r, r), bool),
                                         k=1)[None], axis=1)
                add = jnp.where(dup, -1, add)
                cat = jnp.concatenate([row, add], axis=1)
                order2 = jnp.argsort(cat < 0, axis=1, stable=True)
                filled = jnp.take_along_axis(cat, order2, axis=1)[:, :r]
                return jax.lax.dynamic_update_slice(out, filled, (lo, 0))

            return jax.lax.fori_loop(0, nck, body, nbrs)

        return fill

    def _make_prune(self, n: int, chunk: int, m: int):
        p, metric, r, alpha = self.p, self.metric, self.r, self.alpha

        @functools.partial(jax.jit)
        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P("db", None), P("db"), P("db", None), P("db", None)),
            out_specs=P("db", None),
            check_vma=False)
        def prune(dd, sq, cand_d, cand_i):
            from ..index.prune import _sort_dedup

            nl = cand_i.shape[0]
            base = jax.lax.axis_index("db") * nl
            out = jnp.full((nl, r), -1, jnp.int32)
            nck = nl // chunk

            def body(ci, out):
                lo = ci * chunk
                cd = jax.lax.dynamic_slice(cand_d, (lo, 0), (chunk, m))
                ci_ = jax.lax.dynamic_slice(cand_i, (lo, 0), (chunk, m))
                me = (base + lo
                      + jnp.arange(chunk, dtype=jnp.int32)[:, None])
                bad = (ci_ == me) | (ci_ >= n)
                cd = jnp.where(bad, FINF, cd)
                ci_ = jnp.where(bad, -1, ci_)
                cd, ci_ = _sort_dedup(cd, ci_)
                vecs_c, sq_c = _ring_gather(dd, sq, ci_, p, n)
                res = _occlude_mat(cd, ci_, vecs_c, sq_c, r, alpha, metric)
                return jax.lax.dynamic_update_slice(out, res, (lo, 0))

            return jax.lax.fori_loop(0, nck, body, out)

        return prune

    def _make_reprune(self, n: int, chunk: int):
        p, metric, r, alpha = self.p, self.metric, self.r, self.alpha
        w = 2 * self.r

        @functools.partial(jax.jit, donate_argnums=(2,))
        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P("db", None), P("db"), P("db", None), P()),
            out_specs=P("db", None),
            check_vma=False)
        def rev_reprune(dd, sq, nbrs, key):
            from ..index.prune import _sort_dedup

            nl, rr = nbrs.shape
            base = jax.lax.axis_index("db") * nl
            # bounded reverse table for OWN rows, scattered from the full
            # (all-gathered) adjacency — ids only
            nb_full = jax.lax.all_gather(nbrs, "db", axis=0, tiled=True)
            npd = nb_full.shape[0]
            src = jnp.broadcast_to(
                jnp.arange(npd, dtype=jnp.int32)[:, None], (npd, rr))
            slot = jax.random.randint(key, (npd, rr), 0, w)
            rel = nb_full - base
            ok = (nb_full >= 0) & (rel >= 0) & (rel < nl)
            rev = jnp.full((nl, w), -1, jnp.int32)
            rev = rev.at[jnp.where(ok, rel, nl).reshape(-1),
                         slot.reshape(-1)].set(src.reshape(-1),
                                               mode="drop")
            out = jnp.full((nl, r), -1, jnp.int32)
            nck = nl // chunk

            def body(ci, out):
                lo = ci * chunk
                nb_c = jax.lax.dynamic_slice(nbrs, (lo, 0), (chunk, rr))
                rv_c = jax.lax.dynamic_slice(rev, (lo, 0), (chunk, w))
                cand = jnp.concatenate([nb_c, rv_c], axis=1)
                me = (base + lo
                      + jnp.arange(chunk, dtype=jnp.int32)[:, None])
                cand = jnp.where((cand == me) | (cand >= n), -1, cand)
                qc = jax.lax.dynamic_slice(dd, (lo, 0),
                                           (chunk, dd.shape[1]))
                qsq = jax.lax.dynamic_slice(sq, (lo,), (chunk,))
                d = _ring_dists(qc, qsq, dd, sq, cand, p, n, metric, chunk)
                d, cand = _sort_dedup(d, cand)
                vecs_c, sq_c = _ring_gather(dd, sq, cand, p, n)
                res = _occlude_mat(d, cand, vecs_c, sq_c, r, alpha, metric)
                return jax.lax.dynamic_update_slice(out, res, (lo, 0))

            return jax.lax.fori_loop(0, nck, body, out)

        return rev_reprune


def build_graph_sharded(space, n: int, r: int, params, mesh=None):
    """Engine hook: build the base adjacency on a mesh, then finish
    (overlay, connectivity repair, entry points) exactly like the
    single-device HNSW pipeline. Returns an engine-ready Graph."""
    from ..index.graph import Graph
    from ..index.hnsw import _build_overlay
    from ..index.repair_dev import repair_connectivity

    data = np.asarray(space.data[:n].astype(jnp.float32))
    builder = ShardedGraphBuilder(
        mesh=mesh, r=r, knn_k=32,
        alpha=float(getattr(params, "prune_alpha", 1.0)),
        ef=max(2 * r, 64), metric=space.metric)
    nbrs, ep = builder.build(data, n)
    rng = np.random.default_rng(0xA1A7A ^ n)
    overlay, top_global = _build_overlay(space, n, r, rng)
    if top_global is not None:
        ep = top_global
    nbrs = repair_connectivity(space, jnp.asarray(nbrs), ep)
    extra = rng.integers(0, n, size=7).astype(np.int32)
    return Graph.from_numpy(nbrs, eps=np.concatenate([[ep], extra]),
                            overlay=overlay, capacity=space.capacity)
