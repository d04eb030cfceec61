"""QG candidate-pool modes build graphs of equal quality.

The "block" pool mode (interim SQ8 neighbor blocks packed from the kNN
rows, one fat gather per pop — index/build_phases.py::block_pool_dev) is
the default for bsq8 builds at n >= 250k, where no hermetic test used to
reach; this forces it at small n and asserts recall parity with the "beam"
mode (round-3 advisor, mirroring test_qg_build_with_device_repair)."""

import os

import numpy as np

from alayalite_tpu import Index, IndexParams
from alayalite_tpu.utils.datasets import random_dataset
from alayalite_tpu.utils.evaluate import calc_gt, calc_recall
import pytest

pytestmark = pytest.mark.slow  # >100 s on a 1-core host


def test_qg_block_pools_match_beam_recall():
    ds = random_dataset(n=4000, dim=32, n_queries=128, seed=13, clusters=12)
    gt = calc_gt(ds.data, ds.queries, 10)
    recalls = {}
    for mode in ("beam", "block"):
        os.environ["ALAYA_POOL_MODE"] = mode
        try:
            idx = Index(f"pm_{mode}", IndexParams(
                index_type="hnsw", quantization_type="bsq8", capacity=4096,
                max_nbrs=32, ef_construction=200))
            idx.fit(ds.data)
            ids = idx.batch_search(ds.queries, 10, ef_search=64)
            recalls[mode] = calc_recall(ids, gt)
        finally:
            del os.environ["ALAYA_POOL_MODE"]
    assert recalls["beam"] >= 0.85, recalls
    assert recalls["block"] >= recalls["beam"] - 0.02, recalls
