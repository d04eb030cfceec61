"""A/B: cap the build-pool beam's hop count (QG pools run 29 hops at
ef=200 by default — do the extra hops buy edge quality?).

Builds bsq8@100k with pool max_iters in {0 (auto=29), 16, 12, 8} and
reports build wall-clock + recall@10 at ef=24/32.

Run (TPU): python scripts/ab_pool_iters.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alayalite_tpu.utils.platforms import enable_compile_cache  # noqa: E402

enable_compile_cache()

import alayalite_tpu.index.qg as qg  # noqa: E402
from alayalite_tpu import Index, IndexParams  # noqa: E402
from alayalite_tpu.utils.datasets import random_dataset  # noqa: E402
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall  # noqa: E402

N, DIM, NQ = 100_000, 128, 8192
ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=42, clusters=N // 2000)
gt = calc_gt(ds.data, ds.queries, 10, fast=True)

orig_init = qg.QGBuilder.__init__

for cap in [0, 12, 8]:
    def patched_init(self, *a, _cap=cap, **kw):
        orig_init(self, *a, **kw)
        self.pool_iters = _cap

    qg.QGBuilder.__init__ = patched_init
    idx = Index(f"ab{cap}", IndexParams(index_type="hnsw", capacity=N,
                                        max_nbrs=32, ef_construction=200,
                                        quantization_type="bsq8"))
    t0 = time.time()
    idx.fit(ds.data)
    b = time.time() - t0
    for ef in (24, 32):
        ids = idx.batch_search(ds.queries, 10, ef_search=ef)
        rec = calc_recall(ids, gt)
        print(f"cap={cap:2d} ef={ef} build={b:6.1f}s recall={rec:.4f}",
              flush=True)
qg.QGBuilder.__init__ = orig_init
