"""GIST-960 frontier attack (round-3 verdict next #4): reach recall@10
>= 0.95 at ef <= 64 on the 1M x 960 L2 shape, and record the on-chip
search rate (`qps_chip`) for the 960-d config — the round-3 artifact
(results/scale1m_gist960.json) met the 0.95 bar only at ef=128 with
e2e-only (tunnel-capped) QPS.

Lever tried first: graph degree. R=32 at 960-d needs 4x the ef of the
128-d shape for the same recall (distance concentration flattens the
estimate ordering — DESIGN.md high-dim notes); wider rows buy recall per
hop at the cost of gather bandwidth. Reference anchor for the shape:
README.md:63-69 (gist-960 curve), hnsw_builder.hpp:98-194.

Run (TPU):
  GF_R=48 python scripts/gist_frontier.py
Env:
  GF_R        row width (default 48)
  GF_EFC      ef_construction (default 200)
  GF_EFS      comma ef ladder (default 32,48,64,96,128)
  GF_QUANT    sq8 (default, thin-row) | rabitq | rabitq2 (block path —
              1/2-bit neighbor codes fit 960-d blocks in HBM where sq8
              blocks would need 30 GB; estimator error shrinks ~1/sqrt(D))
  GF_N/GF_DIM override the shape for smoke runs
Writes results/gist960_frontier.json (appends a config block per run).
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
N = int(os.environ.get("GF_N", "1000000"))
DIM = int(os.environ.get("GF_DIM", "960"))
NQ = 4096
K = 10


def load_data():
    """Same generator + cache as scripts/scale1m.py so results compare."""
    from alayalite_tpu.utils.datasets import random_dataset
    from alayalite_tpu.utils.evaluate import calc_gt

    d_cache = f"/tmp/alaya_s1m_data_{N}_{DIM}_{NQ}.npz"
    t0 = time.time()
    if os.path.exists(d_cache):
        z = np.load(d_cache)
        data, queries = z["data"], z["queries"]
    else:
        ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=42, clusters=500)
        data, queries = ds.data, ds.queries
        if DIM >= 512:
            np.savez(d_cache, data=data, queries=queries)
    print(f"# data {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    g_cache = f"/tmp/alaya_s1m_gt_{N}_{DIM}_{NQ}.npy"
    t0 = time.time()
    if os.path.exists(g_cache):
        gt = np.load(g_cache)
    else:
        gt = np.asarray(calc_gt(data, queries, K, fast=True))
        np.save(g_cache, gt)
    print(f"# gt {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    return data, queries, gt


def chip_rate(idx, queries, ef: int, iters: int) -> float:
    """On-chip QPS for the quantized-traversal path (sq8 beam + exact
    rerank looped x4 inside ONE jit — same relay-floor amortization as
    bench.py's chip_rate_graph, but for the thin-row graph pipeline the
    960-d config actually runs: engine._batch_search_impl quantized
    branch)."""
    import jax
    import jax.numpy as jnp

    from alayalite_tpu.index.engine import _rerank_exact
    from alayalite_tpu.index.search import graph_search_device

    eng = idx._engine
    space, ss = eng.space, eng.search_space
    nbrs, eps, overlay = eng.graph.nbrs, eng.graph.eps, eng.graph.overlay
    valid = space.valid
    # 1024-query probe: the in-jit exact rerank gathers [B, ef, D] f32 —
    # at B=4096, ef=128, D=960 that transient is ~2 GB and the remote
    # compile helper dies; 1024 keeps it ~0.5 GB and still amortizes the
    # dispatch floor over the x4 in-jit loop.
    nb = int(os.environ.get("GF_PROBE_Q", "1024"))
    q = np.asarray(queries[:nb], dtype=np.float32)
    qj = ss.prep_query(jnp.asarray(q))
    qr = space.prep_query(jnp.asarray(q))
    m = eng.params.beam_expand

    # every device array is a jit ARGUMENT (incl. the overlay pytree) —
    # captured constants ship with the remote-compile request (CLAUDE.md)
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
    np.asarray(run(*args))  # compile + warm
    t0 = time.time()
    np.asarray(run(*args))
    dt = max(time.time() - t0 - 0.035, 1e-6) / 4
    return q.shape[0] / dt


def chip_rate_block(idx, queries, ef: int, iters: int) -> float:
    """On-chip QPS for the block path (seed scan + block beam, exact
    rerank inside block_beam_search), x4 in one jit — mirrors bench.py's
    chip_rate_graph."""
    import jax
    import jax.numpy as jnp

    from alayalite_tpu.index.search import block_beam_search, scan_seeds

    eng = idx._engine
    space, valid = eng.search_space, eng.space.valid
    ss = eng._seed_scan_arrays()
    eps = eng.graph.eps
    m = eng.params.beam_expand
    nb = int(os.environ.get("GF_PROBE_Q", "1024"))
    qd = space.prep_query(jnp.asarray(
        np.asarray(queries[:nb], dtype=np.float32)))

    @jax.jit
    def run(space, valid, ss, eps, q):
        def body(i, acc):
            qc = q + acc * 1e-12
            seeds = (scan_seeds(qc, *ss) if ss is not None else
                     jnp.broadcast_to(eps[None, :], (qc.shape[0],
                                                     eps.shape[0])))
            d, _ = block_beam_search(space, seeds, qc, k=K, ef=ef,
                                     max_iters=iters, valid=valid,
                                     n_expand=m)
            return acc + d[0, 0]
        return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))

    args = (space, valid, ss, eps, qd)
    np.asarray(run(*args))  # compile + warm
    t0 = time.time()
    np.asarray(run(*args))
    dt = max(time.time() - t0 - 0.035, 1e-6) / 4
    return qd.shape[0] / dt


def main() -> None:
    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.evaluate import calc_recall

    data, queries, gt = load_data()
    r = int(os.environ.get("GF_R", "48"))
    efc = int(os.environ.get("GF_EFC", "200"))
    alpha = float(os.environ.get("GF_ALPHA", "1.0"))
    quant = os.environ.get("GF_QUANT", "sq8")
    efs = [int(e) for e in
           os.environ.get("GF_EFS", "32,48,64,96,128").split(",")]
    if quant in ("rabitq", "rabitq2"):
        r = 32  # RaBitQSpace blocks are fixed-degree 32 (engine.fit)

    cfg = f"hnsw_{quant}_R{r}_efc{efc}" + (f"_a{alpha}" if alpha != 1.0
                                           else "")
    idx = Index(cfg, IndexParams(index_type="hnsw", capacity=N, max_nbrs=r,
                                 ef_construction=efc, prune_alpha=alpha,
                                 quantization_type=quant))
    t0 = time.time()
    idx.fit(data)
    build_s = time.time() - t0
    print(f"# build {build_s:.1f}s", file=sys.stderr, flush=True)

    rows = []
    for ef in efs:
        ids = idx.batch_search(queries, K, ef_search=ef)
        rec = calc_recall(ids, gt)
        idx.batch_search(queries, K, ef_search=ef)
        t0 = time.time()
        for _ in range(3):
            idx.batch_search(queries, K, ef_search=ef)
        qps = NQ / ((time.time() - t0) / 3)
        row = {"ef": ef, "recall10": round(float(rec), 4),
               "qps_e2e": round(qps, 1)}
        try:
            iters = int(getattr(idx._engine.params, "search_iters", 0))
            probe = (chip_rate_block
                     if idx._engine.params.quantization_type.is_block
                     else chip_rate)
            row["qps_chip"] = round(probe(idx, queries, ef, iters), 1)
        except Exception as e:  # pragma: no cover - chip-only path
            row["qps_chip_error"] = str(e)[:200]
        rows.append(row)
        print(f"{cfg} ef={ef}: recall@10={rec:.4f} e2e={qps:,.0f} "
              f"chip={row.get('qps_chip', 0):,.0f}",
              file=sys.stderr, flush=True)
        if rec >= 0.99:
            break

    if (N, DIM) != (1000000, 960):  # smoke shapes don't pollute the artifact
        print(json.dumps({"config": cfg, "rows": rows}))
        return
    path = os.path.join(REPO, "results", "gist960_frontier.json")
    doc = {"dataset": f"synthetic GIST-960 shape ({N}x{DIM} f32, "
                      "clustered=500, seed=42), 4096 queries, L2",
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
