"""A/B: scan-seeded build pools (12 hops) vs medoid-seeded auto (29 hops)
for the QG build at 100k: build wall-clock + recall@ef24/32.

Run (TPU): python scripts/ab_pool_scan.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alayalite_tpu.utils.platforms import enable_compile_cache
enable_compile_cache()
import alayalite_tpu.index.qg as qg
from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

N, DIM, NQ = 100_000, 128, 8192
ds = random_dataset(n=N, dim=DIM, n_queries=NQ, seed=42, clusters=N // 2000)
gt = calc_gt(ds.data, ds.queries, 10, fast=True)
orig_init = qg.QGBuilder.__init__

for scan, iters in [(0, 0), (4096, 12), (4096, 8)]:
    def patched(self, *a, _s=scan, _i=iters, **kw):
        orig_init(self, *a, **kw)
        self.pool_scan = _s
        self.pool_iters = _i
    qg.QGBuilder.__init__ = patched
    idx = Index(f"ps{scan}_{iters}", IndexParams(
        index_type="hnsw", capacity=N, max_nbrs=32, ef_construction=200,
        quantization_type="bsq8"))
    t0 = time.time(); idx.fit(ds.data); b = time.time() - t0
    for ef in (24, 32):
        ids = idx.batch_search(ds.queries, 10, ef_search=ef)
        print(f"scan={scan} iters={iters} ef={ef} build={b:6.1f}s "
              f"recall={calc_recall(ids, gt):.4f}", flush=True)
qg.QGBuilder.__init__ = orig_init
