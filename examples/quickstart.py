"""Quickstart — the README workload (reference README.md:38-61 shape):
1k×128 random vectors, L2, fit + batch_search top-10, recall printed."""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from alayalite_tpu import Client
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

rng = np.random.default_rng(0)
data = rng.random((1000, 128), dtype=np.float32)
queries = data[:10] + 0.01 * rng.standard_normal((10, 128)).astype(np.float32)

client = Client()
index = client.create_index("quickstart", index_type="hnsw", capacity=1000)
index.fit(data)

ids = index.batch_search(queries, topk=10, ef_search=64)
gt = calc_gt(data, queries, 10)
print(f"recall@10 = {calc_recall(ids, gt):.3f}")
print(f"top-1 ids  = {ids[:, 0].tolist()}")
