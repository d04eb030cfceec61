"""SIFT-1M-shape frontier probe (1M x 128 L2): find the best on-chip
QPS at the reference's 1M matched-recall point (0.9593 — results/
reference_baseline_1m.json) across the levers that won on GIST-960:
`prune_alpha` (progressive occlusion slack) and `rabitq2` (2-bit block
path). The round-4 bench validation crossed the matched point with a
0.9753-recall row — ~0.016 of recall headroom that a finer operating
point should convert into QPS.

Same dataset + GT as bench.py (seed=42, clusters=n/2000, 8192 queries,
GT cached in .bench_cache — committed), so rows compare 1:1 with the
driver headline. Reference anchor: annbenchmark module.py:23-79,
hnsw_builder.hpp:98-194.

Run (TPU):
  F1M_QUANT=bsq8 F1M_ALPHA=1.2 python scripts/frontier_1m.py
Env:
  F1M_QUANT  bsq8 (default) | rabitq2 | rabitq | sq8
  F1M_ALPHA  prune_alpha (default 1.0)
  F1M_R      max_nbrs (default 32; block quants are fixed 32)
  F1M_EFC    ef_construction (default 200)
  F1M_EFS    comma ef ladder (default 16,20,24,28,32,40,48)
  F1M_SEED_SAMPLE  seed-scan sample size (default params default 4096;
             4096/1M = 0.4%% coverage vs 4%% at the tuned 100k shape —
             a bigger sample starts each query hops closer)
  F1M_N/F1M_DIM  shape override for smoke runs
Appends a config block to results/sift1m_frontier.json.
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
N = int(os.environ.get("F1M_N", "1000000"))
DIM = int(os.environ.get("F1M_DIM", "128"))
NQ = 8192
K = 10


def load_data():
    from alayalite_tpu.utils.datasets import random_dataset
    from alayalite_tpu.utils.evaluate import calc_gt

    t0 = time.time()
    ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=42,
                        clusters=max(32, N // 2000))
    print(f"# data {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    name = "synthetic_sift1m" if N >= 1_000_000 else f"synthetic_sift{N//1000}k"
    gt_path = os.path.join(REPO, ".bench_cache",
                           f"gt_{name}_{N}_{DIM}_{NQ}_k{K}.npy")
    t0 = time.time()
    if os.path.exists(gt_path):
        gt = np.load(gt_path)
    else:
        gt = np.asarray(calc_gt(ds.data, ds.queries, K, fast=True))
        os.makedirs(os.path.dirname(gt_path), exist_ok=True)
        np.save(gt_path, gt)
    print(f"# gt {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    return ds.data, ds.queries, gt


def iters_for(ef: int, m: int) -> int:
    return max(3, ef // m)  # bench.py's per-ef hop budget


def chip_rate_block(idx, queries, ef: int, iters: int) -> float:
    """bench.py chip_rate_graph: seed scan + block beam, x8 in one jit."""
    import jax
    import jax.numpy as jnp

    from alayalite_tpu.index.search import block_beam_search, scan_seeds

    eng = idx._engine
    space, valid = eng.search_space, eng.space.valid
    ss = eng._seed_scan_arrays()
    eps = eng.graph.eps
    m = eng.params.beam_expand
    nb = int(os.environ.get("F1M_PROBE_Q", "4096"))
    qd = space.prep_query(jnp.asarray(
        np.asarray(queries[:nb], dtype=np.float32)))

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
    np.asarray(run(*args))  # compile + warm
    t0 = time.time()
    np.asarray(run(*args))
    dt = max(time.time() - t0 - 0.035, 1e-6) / 8
    return qd.shape[0] / dt


def chip_rate_thin(idx, queries, ef: int, iters: int) -> float:
    """Thin-row (sq8) path: quantized beam + exact rerank, x4 in one jit."""
    import jax
    import jax.numpy as jnp

    from alayalite_tpu.index.engine import _rerank_exact
    from alayalite_tpu.index.search import graph_search_device

    eng = idx._engine
    space, ss = eng.space, eng.search_space
    nbrs, eps, overlay = eng.graph.nbrs, eng.graph.eps, eng.graph.overlay
    valid = space.valid
    nb = int(os.environ.get("F1M_PROBE_Q", "4096"))
    q = np.asarray(queries[:nb], dtype=np.float32)
    qj = ss.prep_query(jnp.asarray(q))
    qr = space.prep_query(jnp.asarray(q))
    m = eng.params.beam_expand

    @jax.jit
    def run(ss, space, nbrs, eps, overlay, valid, qj, qr):
        def body(i, acc):
            qc = qj + acc * 1e-12
            _, pool = graph_search_device(
                ss, nbrs, eps, overlay, qc, k=ef, ef=ef, max_iters=iters,
                valid=valid, n_expand=m, qchunk=1024, exact_rerank=False)
            d, _ = _rerank_exact(space, qr, pool, K)
            return acc + d[0, 0]
        return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))

    args = (ss, space, nbrs, eps, overlay, valid, qj, qr)
    np.asarray(run(*args))
    t0 = time.time()
    np.asarray(run(*args))
    dt = max(time.time() - t0 - 0.035, 1e-6) / 4
    return q.shape[0] / dt


def main() -> None:
    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.evaluate import calc_recall

    data, queries, gt = load_data()
    quant = os.environ.get("F1M_QUANT", "bsq8")
    alpha = float(os.environ.get("F1M_ALPHA", "1.0"))
    r = int(os.environ.get("F1M_R", "32"))
    efc = int(os.environ.get("F1M_EFC", "200"))
    efs = [int(e) for e in
           os.environ.get("F1M_EFS", "16,20,24,28,32,40,48").split(",")]
    m = 8

    seed_sample = int(os.environ.get("F1M_SEED_SAMPLE", "4096"))
    boost = float(os.environ.get("F1M_BOOST", "4.0"))  # 1-bit rabitq only
    cfg = (f"hnsw_{quant}_R{r}_efc{efc}"
           + (f"_a{alpha}" if alpha != 1.0 else "")
           + (f"_ss{seed_sample}" if seed_sample != 4096 else "")
           + (f"_b{boost:g}" if quant == "rabitq" and boost != 4.0 else ""))
    idx = Index(cfg, IndexParams(index_type="hnsw", capacity=N, max_nbrs=r,
                                 ef_construction=efc, prune_alpha=alpha,
                                 quantization_type=quant,
                                 seed_sample=seed_sample,
                                 rabitq_ef_boost=boost,
                                 search_iters=3, beam_expand=m))
    t0 = time.time()
    idx.fit(data)
    build_s = time.time() - t0
    print(f"# build {build_s:.1f}s", file=sys.stderr, flush=True)
    is_block = idx._engine.params.quantization_type.is_block

    rows = []
    for ef in efs:
        iters = iters_for(ef, m)
        idx._engine.params.search_iters = iters
        ids = idx.batch_search(queries, K, ef_search=ef)
        rec = calc_recall(ids, gt)
        idx.batch_search(queries, K, ef_search=ef)
        t0 = time.time()
        for _ in range(3):
            idx.batch_search(queries, K, ef_search=ef)
        qps = NQ / ((time.time() - t0) / 3)
        row = {"ef": ef, "iters": iters, "recall10": round(float(rec), 4),
               "qps_e2e": round(qps, 1)}
        try:
            probe = chip_rate_block if is_block else chip_rate_thin
            # 1-bit applies rabitq_ef_boost internally — probe the pool
            # the e2e path actually ran, or the chip rate pairs with the
            # wrong recall
            probe_ef = (int(round(ef * boost)) if quant == "rabitq"
                        else ef)
            row["qps_chip"] = round(probe(idx, queries, probe_ef, iters), 1)
        except Exception as e:  # pragma: no cover - chip-only path
            row["qps_chip_error"] = str(e)[:200]
        rows.append(row)
        print(f"{cfg} ef={ef} iters={iters}: recall@10={rec:.4f} "
              f"e2e={qps:,.0f} chip={row.get('qps_chip', 0):,.0f}",
              file=sys.stderr, flush=True)
        if rec >= 0.985:
            break

    if (N, DIM) != (1000000, 128):  # smoke shapes don't pollute the artifact
        print(json.dumps({"config": cfg, "rows": rows}))
        return
    path = os.path.join(REPO, "results", "sift1m_frontier.json")
    doc = {"dataset": f"synthetic SIFT-1M shape ({N}x{DIM} f32, "
                      "clustered=500, seed=42), 8192 queries, L2",
           "matched_recall_point": 0.9593,
           "configs": []}
    if os.path.exists(path):
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
