"""QG builder: fixed-degree-32 graph + RaBitQ neighbor quantization.

TPU-native re-design of /root/reference/include/index/graph/qg/qg_builder.hpp
(:34-522). The reference iterates {OpenMP beam search with *estimated*
distances → heuristic prune → reverse edges → angle-based degree fill} three
times because exact distances are expensive on CPU; on TPU exact distances
are MXU matmuls, so the candidate/prune pipeline runs with exact distances
(strictly better edge quality) and a final fill pass pads every node to
exactly kDegreeBound=32 edges — the invariant the packed neighbor blocks
require (qg_builder.hpp angle_based_supplement, :198-246). Ends with
``update_neighbors`` re-quantizing every node's block
(rabitq_space.hpp:138-161 analog).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..spaces.rabitq import DEGREE
from .graph import Graph
from .nndescent import build_knn_graph
from .nsg import find_medoid

log = logging.getLogger("alayalite_tpu")


@dataclasses.dataclass
class QGBuilder:
    """ef_build=400, 3 iterations in the reference (qg_builder.hpp:85-91);
    one exact-distance pass replaces the estimate-driven iterations."""

    r: int = DEGREE
    ef: int = 128
    knn_k: int = 32
    chunk: int = 4096
    alpha: float = 1.0  # occlusion slack (params.prune_alpha)
    nnd_iters: int = 0  # 0 = auto (~log2 n rounds)
    pool_iters: int = 0  # build-pool beam hop cap (0 = beam auto)
    pool_scan: int = 4096  # seed-scan sample for build pools (0 = off)
    # "beam" = scan-seeded beam-search pools (search_pool_dev);
    # "block" = the same beams over an *interim block space* packed from
    # the kNN rows (build_phases.block_pool_dev) — one fat gather per pop
    # instead of M·R thin ones; SQ8-grade traversal estimates, exact
    # reranked pool distances. Default for bsq8 (see build_graph);
    # "twohop" = CAGRA-style kNN ∪ kNN² exact-scored pools
    # (build_phases.twohop_pool_dev) — one fat gather instead of ~12
    # sequential hops per chunk (measured recall-negative, kept for A/Bs).
    # ALAYA_POOL_MODE overrides for A/Bs.
    pool_mode: str = ""
    seed: int = 0

    def build_graph(self, raw_space, rabitq_space, n: Optional[int] = None):
        """Returns (Graph with eps, RaBitQSpace with quantized blocks)."""
        t0 = time.time()
        if n is None:
            n = int(raw_space.num)
        assert self.r == getattr(rabitq_space, "degree", DEGREE), (
            "block degree must match the space's block width")

        import jax
        import jax.numpy as jnp

        from .build_phases import (bf16_pool_space, fill_degree_dev,
                                   prune_all_dev, reprune_with_reverse_dev,
                                   reverse_edges_dev, search_pool_dev)

        import os

        def sync(x):
            # opt-in per-phase sync for build profiling (device phases are
            # dispatched async; wall-clock otherwise lands on the first
            # blocking download)
            if os.environ.get("ALAYA_BUILD_SYNC") == "1":
                # slice on DEVICE first — np.asarray(full_leaf) would pull
                # the whole array through the tunnel and time the download
                leaf = jax.tree_util.tree_leaves(x)[0]
                np.asarray(jnp.ravel(leaf)[:1])

        nnd_iters = self.nnd_iters
        if nnd_iters == 0 and self.pool_scan and n > 100_000:
            # scan-seeded pools clean up residual kNN noise: 8 rounds cost
            # 0.003 recall@32 at 1M vs the 12-round auto but save ~70 s
            # (A/B 2026-08-17, /tmp/ab_nnd8)
            nnd_iters = 8
        knn_d, knn_i = build_knn_graph(raw_space, n, self.knn_k,
                                       max_iters=nnd_iters,
                                       seed=self.seed, as_numpy=False)
        sync(knn_i)
        log.info("qg: knn graph %.1fs", time.time() - t0)
        ep = find_medoid(raw_space, n)
        pool_mode = self.pool_mode
        if not pool_mode:
            # bsq8's SQ8-grade block estimates match raw-traversal pool
            # quality; 1-/2-bit rabitq estimates are too noisy to steer
            # the build beams (same reason serving reranks through them).
            # Gated by scale: measured warm A/Bs (scripts/ab_block_pools.py,
            # v5e) put block pools ~16 s SLOWER at 100k (fixed per-hop cost
            # of the fat-gather kernel + interim pack) and ~128 s FASTER at
            # 1M (beam pools scale ~linearly with n, block pools barely
            # grow: 100k->1M is 44->437 s beam vs 61->309 s block total).
            # Linear crossover estimate ~240k; gate at 250k.
            pool_mode = ("block" if n >= 250_000
                         and type(rabitq_space).__name__ == "BQGSpace"
                         else "beam")
        pool_mode = os.environ.get("ALAYA_POOL_MODE", pool_mode)
        if pool_mode == "block":
            from .build_phases import block_pool_dev

            sample = None
            pool_iters = self.pool_iters
            if self.pool_scan and n >= 4 * 128:
                if pool_iters == 0:
                    pool_iters = 12  # scan-seeded beams: see beam mode below
                s = min(self.pool_scan, (n // 128) * 128)
                rng = np.random.default_rng(self.seed + 5)
                sids = jnp.asarray(np.sort(rng.choice(n, size=s,
                                                      replace=False))
                                   .astype(np.int32))
                from .search import seed_sample_arrays

                sample = seed_sample_arrays(raw_space.data, sids,
                                            raw_space.user_metric)
            pool_iters = int(os.environ.get("ALAYA_POOL_ITERS", pool_iters))
            pool_ef = min(self.ef, 128)
            pool_chunk = int(os.environ.get("ALAYA_POOL_CHUNK", self.chunk))
            # pack interim neighbor blocks from the kNN rows; the final
            # update_neighbors below re-encodes from the real adjacency.
            # Rebinding rabitq_space recycles the 4 GB code buffer through
            # donation (update_neighbors donates nbr_codes) instead of
            # allocating a second copy.
            rabitq_space = rabitq_space.update_neighbors(knn_i,
                                                         chunk=self.chunk)
            sync(rabitq_space.nbr_codes)
            log.info("qg: interim block pack %.1fs", time.time() - t0)
            pool_d, pool_i = block_pool_dev(
                rabitq_space, np.array([ep]), ef=pool_ef, n=n,
                chunk=pool_chunk, seed=self.seed, max_iters=pool_iters,
                seed_sample=sample)
        elif pool_mode == "twohop":
            from .build_phases import twohop_pool_dev

            pool_d, pool_i = twohop_pool_dev(raw_space, knn_i, ef=self.ef,
                                             n=n, chunk=self.chunk)
        else:
            sample = None
            pool_iters = self.pool_iters
            if self.pool_scan and n >= 4 * 128:
                s = min(self.pool_scan, (n // 128) * 128)
                rng = np.random.default_rng(self.seed + 5)
                sids = jnp.asarray(np.sort(rng.choice(n, size=s,
                                                      replace=False))
                                   .astype(np.int32))
                from .search import seed_sample_arrays

                sample = seed_sample_arrays(raw_space.data, sids,
                                            raw_space.user_metric)
                if pool_iters == 0:
                    # scan-seeded beams start 2-4 hops closer; 12 hops match
                    # 29-hop-from-medoid pool quality (scripts/ab_pool_scan.py)
                    pool_iters = 12
            pool_iters = int(os.environ.get("ALAYA_POOL_ITERS",
                                            pool_iters))
            knn_seed = int(os.environ.get("ALAYA_POOL_KNNSEED", "0"))
            pool_space = bf16_pool_space(raw_space)
            # pool width caps at 128: ef=128 pools measured ≥ ef=200 pools
            # on the scan-seeded graph (same A/B; narrower merge, same
            # recall) — wider pools only pad the per-hop sort
            pool_ef = min(self.ef, 128)
            pool_chunk = int(os.environ.get("ALAYA_POOL_CHUNK", self.chunk))
            pool_d, pool_i = search_pool_dev(
                pool_space, knn_i, np.array([ep]), ef=pool_ef, n=n,
                chunk=pool_chunk, seed=self.seed, max_iters=pool_iters,
                seed_sample=sample, knn_seed=knn_seed)
        cand_i = jnp.concatenate([pool_i, knn_i], axis=1)
        cand_d = jnp.concatenate([pool_d, knn_d], axis=1)
        sync(cand_i)
        log.info("qg: candidate pools %.1fs", time.time() - t0)
        # the concats copied these — drop the device buffers now (locals
        # would otherwise pin ~2.5 GB of dead pools/knn/bf16-space through
        # the final 7.7 GB block allocation and OOM the 1M x 960 build)
        pool_d = pool_i = knn_d = knn_i = None  # noqa: F841
        sample = pool_space = None  # noqa: F841 (rebind drops device bufs)

        nbrs_dev = prune_all_dev(raw_space, cand_d, cand_i, r=self.r,
                                 alpha=self.alpha, chunk=self.chunk)
        sync(nbrs_dev)
        log.info("qg: prune %.1fs", time.time() - t0)
        rev = reverse_edges_dev(nbrs_dev, jax.random.PRNGKey(self.seed + 3),
                                width=2 * self.r)
        nbrs_dev = reprune_with_reverse_dev(raw_space, nbrs_dev, rev,
                                            r=self.r, alpha=self.alpha,
                                            chunk=self.chunk)
        sync(nbrs_dev)
        log.info("qg: reverse+reprune %.1fs", time.time() - t0)
        nbrs_dev = fill_degree_dev(nbrs_dev, cand_d, cand_i, r=self.r,
                                   chunk=self.chunk)
        sync(nbrs_dev)
        log.info("qg: prune+reverse+fill %.1fs", time.time() - t0)
        # last consumers of the candidate pools and reverse lists ran;
        # free them before repair + the full-capacity block allocation
        cand_d = cand_i = rev = None  # noqa: F841

        from .repair_dev import repair_connectivity

        sync(nbrs_dev)
        log.info("qg: device sync %.1fs", time.time() - t0)
        nbrs = repair_connectivity(raw_space, nbrs_dev, ep)
        log.info("qg: connectivity repair %.1fs", time.time() - t0)

        rabitq_space = rabitq_space.update_neighbors(nbrs, chunk=self.chunk)
        rng = np.random.default_rng(self.seed + 17)
        extra = rng.integers(0, n, size=7).astype(np.int32)
        graph = Graph.from_numpy(nbrs, eps=np.concatenate([[ep], extra]),
                                 capacity=raw_space.capacity)
        log.info("QG build: n=%d in %.2fs", n, time.time() - t0)
        return graph, rabitq_space
