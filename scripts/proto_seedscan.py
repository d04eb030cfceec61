"""Seed-scan prototype: per-query entry points from one MXU pass over a
random sample, instead of 8 shared entry points. Loads the cached bsq8
index (scripts/sweep_hop_sched.py) and A/Bs (ef, M, iters) x seed modes.

Hypothesis: the hop-schedule sweep showed recall needs ~8 serial hops from
shared eps; a [B, S] bf16 scan (S=2048: ~2 GFLOP, trivial on MXU) starts
each query 2-3 hops closer, recovering >=0.95 recall at 5-6 hops.

Run (TPU): python scripts/proto_seedscan.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alayalite_tpu.utils.platforms import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alayalite_tpu.index.engine import IndexEngine  # noqa: E402
from alayalite_tpu.index.search import block_beam_search  # noqa: E402
from alayalite_tpu.utils.datasets import random_dataset  # noqa: E402
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall  # noqa: E402

N, DIM, NQ, TOPK = 100_000, 128, 4096, 10
CACHE = "/tmp/alaya_sweep_idx"
S = int(os.environ.get("PS_S", "2048"))
NSEED = int(os.environ.get("PS_NSEED", "4"))

ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=42, clusters=N // 2000)
eng = IndexEngine.load(CACHE)
gt = calc_gt(ds.data, ds.queries, TOPK, fast=True)
space = eng.search_space
eps = eng.graph.eps
valid = eng.space.valid
q = jnp.asarray(ds.queries)
qj = space.prep_query(q)

rng = np.random.default_rng(0)
sids_np = rng.choice(N, size=S, replace=False).astype(np.int32)
sids = jnp.asarray(sids_np)
svecs = space.data[sids].astype(jnp.bfloat16)          # [S, D]
ssq = jnp.sum(space.data[sids].astype(jnp.float32) ** 2, axis=1)


def scan_seeds(qc, svecs, ssq, sids):
    dot = jnp.dot(qc.astype(jnp.bfloat16), svecs.T,
                  preferred_element_type=jnp.float32)   # [B, S]
    d = ssq[None, :] - 2.0 * dot
    if os.environ.get("PS_APPROX", "1") == "1":
        # exact top-NSEED of 4096 lanes is a full sort; approximate seeds
        # are free on the TPU top-k unit and seeds only need to be close
        _, sel = jax.lax.approx_max_k(-d, NSEED, recall_target=0.9)
    else:
        _, sel = jax.lax.top_k(-d, NSEED)
    return sids[sel]


def run_cfg(ef, M, iters, scan):
    # big arrays ride as jit ARGUMENTS (captured constants ship with the
    # remote-compile request through the tunnel — CLAUDE.md TPU rules)
    def search(sp, vld, eps, svecs, ssq, sids, qc):
        seeds = (scan_seeds(qc, svecs, ssq, sids) if scan else
                 jnp.broadcast_to(eps[None, :], (qc.shape[0], eps.shape[0])))
        return block_beam_search(sp, seeds, qc, k=TOPK, ef=ef,
                                 max_iters=iters, valid=vld, n_expand=M)

    d, ids = jax.jit(search)(space, valid, eps, svecs, ssq, sids, qj)
    rec = calc_recall(np.asarray(ids), gt)
    REPS = 8

    @jax.jit
    def whole(sp, vld, eps, svecs, ssq, sids, qj):
        def f(i, acc):
            d, _ = search(sp, vld, eps, svecs, ssq, sids, qj + acc * 1e-12)
            return acc + d[0, 0]
        return jax.lax.fori_loop(0, REPS, f, jnp.float32(0.0))

    args = (space, valid, eps, svecs, ssq, sids, qj)
    np.asarray(whole(*args))
    t0 = time.time()
    np.asarray(whole(*args))
    per = (time.time() - t0 - 0.035) / REPS
    return rec, NQ / per


import json as _json
CFGS = _json.loads(os.environ.get(
    "PS_CFGS",
    '[[24,8,8,0],[24,8,8,1],[24,8,6,1],[24,8,5,1],'
    '[24,8,4,1],[16,8,5,1],[24,12,4,1],[32,8,6,1]]'))
for ef, M, iters, scan in CFGS:
    rec, qps = run_cfg(ef, M, iters, scan)
    print(f"ef={ef:3d} M={M:2d} it={iters} scan={int(scan)} "
          f"recall={rec:.4f} chipQPS={qps:,.0f}", flush=True)
