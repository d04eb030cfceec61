"""(beam_expand, iters, ef) grid on ONE 1M x 128 bsq8 build: can a
wider-but-shallower hop schedule cross the 1M matched-recall point
(0.9593) cheaper than the 4-hop M=8 crossing (219k chip QPS —
results/sift1m_frontier.json)?

Rationale: each extra hop costs ~5 ms serial latency per 4096-query
batch while pool width is nearly free (ef 16->24 at 3 hops: -6% QPS);
M=12-16 at 3 hops buys the same number of expanded nodes as M=8 at
4-5 hops with one less serial step. Reference anchor for the schedule
being replaced: graph_search_job.hpp:221-258 (one node per step).

Run (TPU):  python scripts/probe_m_iters.py
Env: PM_GRID "m:iters:ef[:B],..." override (B = chip-probe batch size,
     default 4096 — fixed per-hop overheads amortize with B),
     PM_ALPHA (1.2), PM_SS (16384), PM_N/PM_DIM smoke override.
Appends config blocks to results/sift1m_frontier.json (config key
includes m/iters so rows stay distinguishable).
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

import logging  # noqa: E402

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(message)s")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("PM_N", "1000000"))
DIM = int(os.environ.get("PM_DIM", "128"))
NQ = 8192
K = 10
def _parse(g):
    parts = [int(x) for x in g.split(":")]
    return tuple(parts + [4096] * (4 - len(parts)))


GRID = [_parse(g) for g in os.environ.get(
    "PM_GRID",
    "8:4:32,10:3:30,12:3:36,16:3:48,12:4:48,16:4:64").split(",")]


def load_data():
    from alayalite_tpu.utils.datasets import random_dataset

    ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=42,
                        clusters=max(32, N // 2000))
    name = ("synthetic_sift1m" if N >= 1_000_000
            else f"synthetic_sift{N // 1000}k")
    gt_path = os.path.join(REPO, ".bench_cache",
                           f"gt_{name}_{N}_{DIM}_{NQ}_k{K}.npy")
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
    else:
        from alayalite_tpu.utils.evaluate import calc_gt

        gt = np.asarray(calc_gt(ds.data, ds.queries, K, fast=True))
        os.makedirs(os.path.dirname(gt_path), exist_ok=True)
        np.save(gt_path, gt)
    return ds.data, ds.queries, gt


def chip_rate(idx, queries, ef: int, iters: int, m: int,
              nb: int = 4096) -> float:
    import jax
    import jax.numpy as jnp

    from alayalite_tpu.index.search import block_beam_search, scan_seeds

    eng = idx._engine
    space, valid = eng.search_space, eng.space.valid
    ss = eng._seed_scan_arrays()
    eps = eng.graph.eps
    q = np.asarray(queries, dtype=np.float32)
    if nb > q.shape[0]:  # tile the query set up to the probe batch size
        q = np.concatenate([q] * (-(-nb // q.shape[0])))[:nb]
    qd = space.prep_query(jnp.asarray(q[:nb]))

    @jax.jit
    def run(space, valid, ss, eps, q):
        def body(i, acc):
            qc = q + acc * 1e-12
            seeds = (scan_seeds(qc, *ss) if ss is not None else
                     jnp.broadcast_to(eps[None, :],
                                      (qc.shape[0], eps.shape[0])))
            d, _ = block_beam_search(space, seeds, qc, k=K, ef=ef,
                                     max_iters=iters, valid=valid,
                                     n_expand=m)
            return acc + d[0, 0]
        return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

    args = (space, valid, ss, eps, qd)
    np.asarray(run(*args))
    t0 = time.time()
    np.asarray(run(*args))
    dt = max(time.time() - t0 - 0.035, 1e-6) / 8
    return qd.shape[0] / dt


def main() -> None:
    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.evaluate import calc_recall

    data, queries, gt = load_data()
    alpha = float(os.environ.get("PM_ALPHA", "1.2"))
    ss = int(os.environ.get("PM_SS", "16384"))
    idx = Index("pm", IndexParams(index_type="hnsw", capacity=N,
                                  max_nbrs=32, ef_construction=200,
                                  prune_alpha=alpha, seed_sample=ss,
                                  quantization_type="bsq8",
                                  search_iters=3, beam_expand=8))
    t0 = time.time()
    idx.fit(data)
    build_s = time.time() - t0
    print(f"# build {build_s:.1f}s", file=sys.stderr, flush=True)

    rows = []
    seen_recall = {}
    for m, iters, ef, nb in GRID:
        idx._engine.params.beam_expand = m
        idx._engine.params.search_iters = iters
        key = (m, iters, ef)
        if key not in seen_recall:  # recall is B-independent
            ids = idx.batch_search(queries, K, ef_search=ef)
            seen_recall[key] = calc_recall(ids, gt)
        rec = seen_recall[key]
        row = {"m": m, "iters": iters, "ef": ef, "probe_b": nb,
               "recall10": round(float(rec), 4)}
        try:
            row["qps_chip"] = round(
                chip_rate(idx, queries, ef, iters, m, nb), 1)
        except Exception as e:  # pragma: no cover - chip-only path
            row["qps_chip_error"] = str(e)[:200]
        rows.append(row)
        print(f"m={m} iters={iters} ef={ef} B={nb}: recall@10={rec:.4f} "
              f"chip={row.get('qps_chip', 0):,.0f}",
              file=sys.stderr, flush=True)

    cfg = (f"hnsw_bsq8_a{alpha}_ss{ss}_m-iters-grid"
           + os.environ.get("PM_TAG", ""))
    if (N, DIM) != (1000000, 128):
        print(json.dumps({"config": cfg, "rows": rows}))
        return
    path = os.path.join(REPO, "results", "sift1m_frontier.json")
    with open(path) as f:
        doc = json.load(f)
    doc["configs"] = [c for c in doc["configs"] if c["config"] != cfg]
    doc["configs"].append({"config": cfg, "build_s": round(build_s, 1),
                           "rows": rows})
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({"config": cfg, "rows": rows}))


if __name__ == "__main__":
    main()
