"""A/B max_iters + n_expand on the TPU: recall/QPS tradeoff at ef=64."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alayalite_tpu.utils.platforms import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from alayalite_tpu import Index, IndexParams
from alayalite_tpu.index.search import beam_search, graph_seeds
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

n, dim, nq = 100_000, 128, 4096
ds = random_dataset(n=n, dim=dim, n_queries=nq, seed=42, clusters=max(32, n//2000))
gt = calc_gt(ds.data, ds.queries, 10)
idx = Index("t", IndexParams(capacity=n, max_nbrs=32, ef_construction=200))
t0=time.time(); idx.fit(ds.data); print(f"# build {time.time()-t0:.0f}s", flush=True)
eng = idx._engine
space, graph = eng.space, eng.graph
q = space.prep_query(jnp.asarray(ds.queries))
seeds = graph_seeds(space, graph.eps, graph.overlay, q)

def run(ef, m, iters):
    d, i = beam_search(space, graph.nbrs, seeds, q, k=10, ef=ef,
                       valid=space.valid, n_expand=m, max_iters=iters)
    jax.block_until_ready(i)
    rec = calc_recall(np.asarray(i), gt)
    t0=time.time()
    for _ in range(3):
        d, i = beam_search(space, graph.nbrs, seeds, q, k=10, ef=ef,
                           valid=space.valid, n_expand=m, max_iters=iters)
        jax.block_until_ready(i)
    qps = nq/((time.time()-t0)/3)
    print(f"ef={ef:4} m={m} iters={iters:3}  recall={rec:.4f} qps={qps:10,.0f}", flush=True)

for ef, m, iters in [
    (64, 4, 48), (64, 4, 32), (64, 4, 24), (64, 4, 18),
    (64, 8, 16), (64, 8, 12),
    (96, 8, 18), (128, 8, 24), (128, 16, 12),
    (32, 4, 16),
]:
    run(ef, m, iters)
