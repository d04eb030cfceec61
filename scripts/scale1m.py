"""1M-scale build + search on TPU (SIFT-1M analog, synthetic)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alayalite_tpu.utils.platforms import enable_compile_cache
enable_compile_cache()
import logging; logging.basicConfig(level=logging.INFO, stream=sys.stderr, format="%(asctime)s %(message)s")
import numpy as np
from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

n = int(os.environ.get("ALAYA_SCALE_N", "1000000"))
dim = int(os.environ.get("ALAYA_SCALE_DIM", "128"))   # 960 = GIST-960 shape
nq = int(os.environ.get("ALAYA_SCALE_Q", "4096"))
t0=time.time()
_d_cache = f"/tmp/alaya_s1m_data_{n}_{dim}_{nq}.npz"
if os.path.exists(_d_cache):
    _z = np.load(_d_cache)
    class _DS: pass
    ds = _DS(); ds.data, ds.queries = _z["data"], _z["queries"]
else:
    ds = random_dataset(n=n, dim=dim, n_queries=nq, seed=42, clusters=500)
    if dim >= 512:  # 960-d gen costs ~14 min; cache for per-config reruns
        np.savez(_d_cache, data=ds.data, queries=ds.queries)
print(f"# data gen {time.time()-t0:.0f}s", flush=True)
t0=time.time()
_gt_cache = f"/tmp/alaya_s1m_gt_{n}_{dim}_{nq}.npy"
if os.path.exists(_gt_cache):
    gt = np.load(_gt_cache)
else:
    gt = calc_gt(ds.data, ds.queries, 10, fast=True)
    np.save(_gt_cache, np.asarray(gt))
print(f"# gt {time.time()-t0:.0f}s", flush=True)

def bench(name, kw, efs):
    idx = Index(name, IndexParams(capacity=n, max_nbrs=32, ef_construction=200, **kw))
    t0=time.time(); idx.fit(ds.data); b=time.time()-t0
    for ef in efs:
        ids = idx.batch_search(ds.queries, 10, ef_search=ef)
        rec = calc_recall(ids, gt)
        idx.batch_search(ds.queries, 10, ef_search=ef)
        t0=time.time()
        for _ in range(3): idx.batch_search(ds.queries, 10, ef_search=ef)
        qps = nq/((time.time()-t0)/3)
        print(f"{name:10} ef={ef:4} recall={rec:.4f} qps={qps:10,.0f} build={b:7.1f}s", flush=True)

only = os.environ.get("S1M_ONLY", "flat,bsq8").split(",")
if "flat" in only:
    bench("flat_fast", dict(index_type="flat", flat_mode="fast"), [10])
if "bsq8" in only:
    bench("bsq8", dict(index_type="hnsw", quantization_type="bsq8"), [32, 64, 128])
if "sq8" in only:
    # high-dim config: thin-row SQ8 graph (block layouts duplicate each
    # 960-B code R times and blow HBM at D=960)
    bench("hnsw_sq8", dict(index_type="hnsw", quantization_type="sq8"), [32, 64, 128, 192])
if "hnsw" in only:
    bench("hnsw_f32", dict(index_type="hnsw"), [32, 64])
