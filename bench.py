"""End-of-round benchmark: batch QPS at recall@10 ≥ 0.95.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

Workload (BASELINE.md eval configs, network-free): synthetic SIFT-like
clustered data (100k × 128, L2), HNSW-analog graph (R=32), ef swept until
recall@10 ≥ 0.95 against on-device brute-force GT, then batch QPS measured at
that ef. ``vs_baseline`` divides by 100k QPS — the documented estimate of the
C++ reference's 32-core batch throughput on a workload of this size (the
reference publishes no numbers, BASELINE.md; to be replaced by a measured
reference run when one exists).

Env knobs: ALAYA_BENCH_N (default 100000), ALAYA_BENCH_DIM (128),
ALAYA_BENCH_Q (10000), ALAYA_BENCH_SMALL=1 → tiny CPU-runnable config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_QPS = 100_000.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    t_start = time.time()
    small = os.environ.get("ALAYA_BENCH_SMALL") == "1"
    n = int(os.environ.get("ALAYA_BENCH_N", "4000" if small else "100000"))
    dim = int(os.environ.get("ALAYA_BENCH_DIM", "32" if small else "128"))
    nq = int(os.environ.get("ALAYA_BENCH_Q", "512" if small else "10000"))
    topk = 10

    import jax
    import jax.numpy as jnp

    from alayalite_tpu.utils.platforms import enable_compile_cache

    enable_compile_cache()

    from alayalite_tpu.index.engine import IndexEngine
    from alayalite_tpu.params import IndexParams
    from alayalite_tpu.utils.datasets import random_dataset
    from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

    log(f"devices: {jax.devices()}")
    log(f"workload: n={n} dim={dim} nq={nq}")

    ds = random_dataset(n=n, dim=dim, n_queries=nq, seed=42,
                        clusters=max(32, n // 2000))
    t0 = time.time()
    gt = calc_gt(ds.data, ds.queries, topk)
    log(f"gt: {time.time() - t0:.1f}s")

    params = IndexParams(index_type="hnsw", capacity=n, max_nbrs=32,
                         ef_construction=200)
    eng = IndexEngine(params)
    t0 = time.time()
    eng.fit(ds.data)
    build_s = time.time() - t0
    log(f"build: {build_s:.1f}s")

    best = None
    for ef in (32, 48, 64, 96, 128, 192, 256):
        ids, _ = eng.batch_search_with_distance(ds.queries, topk, ef=ef)
        rec = calc_recall(ids, gt)
        # timed: 1 warm + 3 measured passes over the full query set
        eng.batch_search(ds.queries, topk, ef=ef)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            eng.batch_search(ds.queries, topk, ef=ef)
        dt = (time.time() - t0) / reps
        qps = nq / dt
        log(f"ef={ef}: recall@10={rec:.4f} qps={qps:,.0f}")
        best = {"ef": ef, "recall": rec, "qps": qps}
        if rec >= 0.95:
            break

    value = best["qps"] if best["recall"] >= 0.95 else 0.0
    out = {
        "metric": "batch_qps@recall10>=0.95_synthetic_sift100k",
        "value": round(value, 1),
        "unit": "qps",
        "vs_baseline": round(value / BASELINE_QPS, 4),
        "detail": {
            "n": n, "dim": dim, "nq": nq,
            "recall": round(best["recall"], 4),
            "ef": best["ef"],
            "build_s": round(build_s, 1),
            "total_s": round(time.time() - t_start, 1),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
