"""RaBitQ at the reference operating point: ef sweep to 400 at 100k scale.

Reference threshold: python/tests/test_rabitq_search.py:38-66 asserts
recall@10 >= 0.95 at ef=400 on 1-bit RaBitQ. This sweep publishes the
100k frontier (recall + e2e/device QPS per ef) next to bsq8's, writing
results/sweep_rabitq_100k.json.

Run (TPU, single process): python scripts/sweep_rabitq.py
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

import jax.numpy as jnp  # noqa: E402

from alayalite_tpu import Index, IndexParams  # noqa: E402
from alayalite_tpu.index.engine import IndexEngine  # noqa: E402
from alayalite_tpu.utils.datasets import random_dataset  # noqa: E402
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall  # noqa: E402

N, DIM, NQ, TOPK = 100_000, 128, 8192, 10
QUANT = os.environ.get("SR_QUANT", "rabitq")
CACHE = f"/tmp/alaya_{QUANT}_idx"

ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=42, clusters=N // 2000)

if os.path.exists(os.path.join(CACHE, "schema.json")):
    print("loading cached index", file=sys.stderr, flush=True)
    eng = IndexEngine.load(CACHE)
    idx = None
else:
    idx = Index("r", IndexParams(index_type="hnsw", capacity=N, max_nbrs=32,
                                 ef_construction=200,
                                 quantization_type=QUANT))
    t0 = time.time()
    idx.fit(ds.data)
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    idx.save(CACHE)
    eng = idx._engine

gt = calc_gt(ds.data, ds.queries, TOPK, fast=True)
q_dev = jnp.asarray(ds.queries)

rows = []
for ef in [48, 96, 160, 240, 320, 400]:
    ids, _ = eng.batch_search_with_distance(ds.queries, TOPK, ef=ef)
    rec = calc_recall(ids, gt)
    eng.batch_search_with_distance(q_dev, TOPK, ef=ef)  # warm
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        eng.batch_search_with_distance(q_dev, TOPK, ef=ef)
    qps_dev = NQ / ((time.time() - t0) / reps)
    rows.append({"ef": ef, "recall": round(float(rec), 4),
                 "qps_dev": round(qps_dev, 1)})
    print(f"ef={ef:3d} recall={rec:.4f} qps_dev={qps_dev:,.0f}", flush=True)
    if rec >= 0.97:
        break

os.makedirs("results", exist_ok=True)
with open(f"results/sweep_{QUANT}_100k.json", "w") as f:
    json.dump({"n": N, "dim": DIM, "nq": NQ, "quant": QUANT,
               "rows": rows}, f, indent=1)
ok = [r for r in rows if r["recall"] >= 0.95]
print("first >=0.95:", ok[0] if ok else None, flush=True)
