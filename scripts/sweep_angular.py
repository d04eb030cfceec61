"""GloVe-style angular sweep: cos + ip metrics through raw, sq8, and the
block (bsq8) path at 100k scale (BASELINE.md eval config "GloVe-100
angular/IP with SQ8 quantization"; round-2 verdict #7 wanted the artifact).

GloVe vectors are dense word embeddings compared by cosine; the synthetic
stand-in is clustered gaussian data WITHOUT normalization (norms vary, so
ip and cos genuinely differ — zero egress, no real GloVe bytes available).

Run (TPU): python scripts/sweep_angular.py   → results/sweep_angular_100k.json
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

from alayalite_tpu import Index, IndexParams  # noqa: E402
from alayalite_tpu.utils.datasets import random_dataset  # noqa: E402
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall  # noqa: E402

N = int(os.environ.get("ALAYA_SWEEP_N", "100000"))
DIM = int(os.environ.get("ALAYA_SWEEP_DIM", "100"))  # GloVe-100 shape
NQ = int(os.environ.get("ALAYA_SWEEP_Q", "8192"))
TOPK = 10

ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=7,
                    clusters=max(32, N // 2000))
out = {"n": N, "dim": DIM, "nq": NQ, "rows": []}

for metric in ("cos", "ip"):
    gt = calc_gt(ds.data, ds.queries, TOPK, metric=metric, fast=True)
    configs = [
        ("flat_fast", dict(index_type="flat", flat_mode="fast"), [TOPK]),
        ("hnsw_sq8", dict(index_type="hnsw", quantization_type="sq8",
                          max_nbrs=32, ef_construction=200), [32, 48, 64]),
        ("bsq8", dict(index_type="hnsw", quantization_type="bsq8",
                      max_nbrs=32, ef_construction=200), [24, 32, 48, 64]),
    ]
    for name, kw, efs in configs:
        idx = Index(f"{name}_{metric}",
                    IndexParams(capacity=N, metric=metric, **kw))
        t0 = time.time()
        idx.fit(ds.data)
        build = time.time() - t0
        for ef in efs:
            ids = idx.batch_search(ds.queries, TOPK, ef_search=ef)
            rec = calc_recall(ids, gt)
            idx.batch_search(ds.queries, TOPK, ef_search=ef)  # warm
            t0 = time.time()
            for _ in range(3):
                idx.batch_search(ds.queries, TOPK, ef_search=ef)
            qps = NQ / ((time.time() - t0) / 3)
            row = {"metric": metric, "config": name, "ef": ef,
                   "recall": round(rec, 4), "qps": round(qps, 1),
                   "build_s": round(build, 1)}
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
            if rec >= 0.97 and name != "flat_fast":
                break

os.makedirs(os.path.join(os.path.dirname(__file__), "..", "results"),
            exist_ok=True)
path = os.path.join(os.path.dirname(__file__), "..", "results",
                    f"sweep_angular_{N // 1000}k.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print(f"# wrote {path}", flush=True)
