"""Sweep the block-search hop schedule (ef, M, max_iters) on a real bsq8
100k index: recall@10 + on-chip QPS (in-jit repeated search) per point.

Builds the index once and caches it under /tmp/alaya_sweep_idx (save/load
path), so re-runs only pay the search sweeps. Writes
results/sweep_hop_sched.json.

Run (TPU, single process): python scripts/sweep_hop_sched.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alayalite_tpu.utils.platforms import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alayalite_tpu import Index, IndexParams  # noqa: E402
from alayalite_tpu.index.engine import IndexEngine  # noqa: E402
from alayalite_tpu.index.search import block_beam_search  # noqa: E402
from alayalite_tpu.utils.datasets import random_dataset  # noqa: E402
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall  # noqa: E402

N, DIM, NQ, TOPK = 100_000, 128, 4096, 10
CACHE = "/tmp/alaya_sweep_idx"

ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=42, clusters=N // 2000)

if os.path.exists(os.path.join(CACHE, "schema.json")):
    print("loading cached index", file=sys.stderr, flush=True)
    eng = IndexEngine.load(CACHE)
else:
    idx = Index("s", IndexParams(index_type="hnsw", capacity=N, max_nbrs=32,
                                 ef_construction=200,
                                 quantization_type="bsq8"))
    t0 = time.time()
    idx.fit(ds.data)
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    idx.save(CACHE)
    eng = idx._engine

gt = calc_gt(ds.data, ds.queries, TOPK, fast=True)
space = eng.search_space
eps = eng.graph.eps
valid = eng.space.valid
q = jnp.asarray(ds.queries)
qj = space.prep_query(q)


def run_cfg(ef, M, iters):
    seeds = jnp.broadcast_to(eps[None, :], (NQ, eps.shape[0]))
    d, ids = block_beam_search(space, seeds, qj, k=TOPK, ef=ef,
                               max_iters=iters, valid=valid, n_expand=M)
    rec = calc_recall(np.asarray(ids), gt)

    REPS = 8

    @jax.jit
    def whole(sp, qj, seeds, valid):
        def f(i, acc):
            d, _ = block_beam_search(sp, seeds, qj + acc * 1e-12, k=TOPK,
                                     ef=ef, max_iters=iters, valid=valid,
                                     n_expand=M)
            return acc + d[0, 0]
        return jax.lax.fori_loop(0, REPS, f, jnp.float32(0.0))

    np.asarray(whole(space, qj, seeds, valid))
    t0 = time.time()
    np.asarray(whole(space, qj, seeds, valid))
    per = (time.time() - t0 - 0.035) / REPS
    return rec, NQ / per


rows = []
for ef, M, iters in [
    (24, 8, 8), (24, 8, 6), (24, 12, 6), (24, 16, 5), (24, 16, 4),
    (32, 8, 8), (32, 16, 5), (32, 16, 6), (32, 24, 4),
    (48, 16, 6), (48, 24, 5), (64, 16, 8),
]:
    rec, qps = run_cfg(ef, M, iters)
    rows.append({"ef": ef, "M": M, "iters": iters,
                 "recall": round(float(rec), 4), "qps_chip": round(qps, 1)})
    print(f"ef={ef:3d} M={M:2d} it={iters} recall={rec:.4f} "
          f"chipQPS={qps:,.0f}", flush=True)

os.makedirs("results", exist_ok=True)
with open("results/sweep_hop_sched.json", "w") as f:
    json.dump({"n": N, "dim": DIM, "nq": NQ, "rows": rows}, f, indent=1)
best = max([r for r in rows if r["recall"] >= 0.95],
           key=lambda r: r["qps_chip"], default=None)
print("best@0.95:", best, flush=True)
