"""A/B: QG candidate-pool mode "beam" (bf16 raw thin-row gathers) vs
"block" (interim SQ8 blocks packed from the kNN rows, one fat gather per
pop). Reports pools-phase time (ALAYA_BUILD_SYNC per-phase logs), total
build time, and search recall at ef=24/32.

Usage: AB_N=100000 python scripts/ab_block_pools.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alayalite_tpu.utils.platforms import enable_compile_cache
enable_compile_cache()
import logging
logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(message)s")
import numpy as np
from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

n = int(os.environ.get("AB_N", "100000"))
dim = int(os.environ.get("AB_DIM", "128"))
nq = 4096
os.environ["ALAYA_BUILD_SYNC"] = "1"

ds = random_dataset(n=n, dim=dim, n_queries=nq, seed=42, clusters=500)
gt = calc_gt(ds.data, ds.queries, 10, fast=True)
print("# data + gt ready", flush=True)

try:
    for mode in os.environ.get("AB_MODES", "block,beam").split(","):
        os.environ["ALAYA_POOL_MODE"] = mode
        try:
            idx = Index("ab_" + mode, IndexParams(
                capacity=n, max_nbrs=32, ef_construction=200,
                index_type="hnsw", quantization_type="bsq8"))
            t0 = time.time(); idx.fit(ds.data); b = time.time() - t0
        finally:
            del os.environ["ALAYA_POOL_MODE"]
        for ef in (24, 32):
            ids = idx.batch_search(ds.queries, 10, ef_search=ef)
            rec = calc_recall(ids, gt)
            print(f"{mode:6} ef={ef:3} recall={rec:.4f} build={b:.1f}s",
                  flush=True)
finally:
    del os.environ["ALAYA_BUILD_SYNC"]
