"""Recall@k vs QPS frontier sweep — the ann-benchmarks-shaped measurement
harness (BASELINE.md §6). Prints a table and writes JSON.

Usage:
  python scripts/sweep.py --n 100000 --dim 128 --index hnsw [--quant sq8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--nq", type=int, default=10_000)
    p.add_argument("--topk", type=int, default=10)
    p.add_argument("--index", default="hnsw")
    p.add_argument("--quant", default="none")
    p.add_argument("--max-nbrs", type=int, default=32)
    p.add_argument("--ef-construction", type=int, default=200)
    p.add_argument("--prune-alpha", type=float, default=1.0)
    p.add_argument("--efs", type=int, nargs="+",
                   default=[16, 24, 32, 48, 64, 96, 128, 192, 256])
    p.add_argument("--base-fvecs", help="fvecs file for base vectors")
    p.add_argument("--query-fvecs", help="fvecs file for queries")
    p.add_argument("--gt-ivecs", help="ivecs ground truth")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.datasets import random_dataset
    from alayalite_tpu.utils.evaluate import calc_gt, calc_recall
    from alayalite_tpu.utils.io import load_fvecs, load_ivecs
    from alayalite_tpu.utils.platforms import enable_compile_cache

    enable_compile_cache()

    if args.base_fvecs:
        data = load_fvecs(args.base_fvecs)
        queries = load_fvecs(args.query_fvecs)[: args.nq]
        gt = (load_ivecs(args.gt_ivecs)[: args.nq, : args.topk]
              if args.gt_ivecs else calc_gt(data, queries, args.topk))
        args.n, args.dim = data.shape
    else:
        ds = random_dataset(n=args.n, dim=args.dim, n_queries=args.nq,
                            seed=42, clusters=max(32, args.n // 2000))
        data, queries = ds.data, ds.queries
        gt = calc_gt(data, queries, args.topk)

    idx = Index("sweep", IndexParams(
        index_type=args.index, capacity=args.n, max_nbrs=args.max_nbrs,
        quantization_type=args.quant,
        prune_alpha=args.prune_alpha,
        ef_construction=args.ef_construction))
    t0 = time.time()
    idx.fit(data)
    build_s = time.time() - t0
    print(f"# build: {build_s:.1f}s  n={args.n} dim={args.dim} "
          f"index={args.index} quant={args.quant}", flush=True)

    rows = []
    print(f"{'ef':>5} {'recall@'+str(args.topk):>10} {'qps':>12} "
          f"{'ms/batch':>9}")
    for ef in args.efs:
        if ef < args.topk:
            continue
        ids = idx.batch_search(queries, args.topk, ef_search=ef)
        rec = calc_recall(ids, gt)
        idx.batch_search(queries, args.topk, ef_search=ef)  # warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            idx.batch_search(queries, args.topk, ef_search=ef)
        dt = (time.time() - t0) / reps
        qps = len(queries) / dt
        rows.append({"ef": ef, "recall": round(rec, 4),
                     "qps": round(qps, 1)})
        print(f"{ef:>5} {rec:>10.4f} {qps:>12,.0f} {dt*1000:>9.1f}",
              flush=True)

    out = {"config": vars(args), "build_s": round(build_s, 1), "rows": rows}
    path = args.out or f"sweep_{args.index}_{args.quant}_{args.n}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=str)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
