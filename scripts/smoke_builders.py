import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax.numpy as jnp, time
from alayalite_tpu.spaces.raw import RawSpace
from alayalite_tpu.index.nsg import NSGBuilder
from alayalite_tpu.index.hnsw import HNSWBuilder
from alayalite_tpu.index.search import beam_search, graph_seeds
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_recall

ds = random_dataset(n=3000, dim=32, n_queries=64, seed=3, topk=10)
space = RawSpace.create(3000, 32).fit(ds.data)
for name, builder in [("nsg", NSGBuilder(r=16, l=64, chunk=1024)),
                      ("hnsw", HNSWBuilder(r=16, l=64, chunk=1024))]:
    t0=time.time()
    g = builder.build_graph(space)
    q = space.prep_query(jnp.asarray(ds.queries))
    seeds = graph_seeds(space, g.eps, g.overlay, q)
    d, ids = beam_search(space, g.nbrs, seeds, q, k=10, ef=64, valid=space.valid)
    rec = calc_recall(np.asarray(ids), ds.gt)
    print(name, "recall", rec, "build_s", round(time.time()-t0,1), "overlay", len(g.overlay))
