"""Search-mode shootout on one dataset: raw f32 / bf16 / sq8 / rabitq / flat.

Builds each index once, then times batch searches at a few ef values.
Run on the TPU (no env overrides); one process only.
"""

from __future__ import annotations

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


def time_search(idx, queries, topk, ef, reps=3):
    idx.batch_search(queries, topk, ef_search=ef)  # warm/compile
    t0 = time.time()
    for _ in range(reps):
        idx.batch_search(queries, topk, ef_search=ef)
    return len(queries) / ((time.time() - t0) / reps)


def main() -> None:
    n = int(os.environ.get("BV_N", "100000"))
    dim = int(os.environ.get("BV_DIM", "128"))
    nq = int(os.environ.get("BV_Q", "4096"))
    topk = 10
    ds = random_dataset(n=n, dim=dim, n_queries=nq, seed=42,
                        clusters=max(32, n // 2000))
    gt = calc_gt(ds.data, ds.queries, topk)
    print(f"# n={n} dim={dim} nq={nq}", flush=True)

    configs = [
        ("hnsw_f32", dict(index_type="hnsw")),
        ("hnsw_bf16", dict(index_type="hnsw", storage_dtype="bfloat16")),
        ("hnsw_sq8", dict(index_type="hnsw", quantization_type="sq8")),
        ("rabitq", dict(index_type="hnsw", quantization_type="rabitq")),
        ("bsq8", dict(index_type="hnsw", quantization_type="bsq8")),
        ("flat_f32", dict(index_type="flat", flat_mode="fast")),
        ("flat_bf16", dict(index_type="flat", storage_dtype="bfloat16", flat_mode="fast")),
    ]
    only = os.environ.get("BV_ONLY")
    for name, kw in configs:
        if only and name not in only.split(","):
            continue
        idx = Index(name, IndexParams(capacity=n, max_nbrs=32,
                                      ef_construction=200, **kw))
        t0 = time.time()
        idx.fit(ds.data)
        build_s = time.time() - t0
        efs = ([64] if name.startswith("flat") else
               [32, 64, 128])
        for ef in efs:
            ids = idx.batch_search(ds.queries, topk, ef_search=ef)
            rec = calc_recall(ids, gt)
            qps = time_search(idx, ds.queries, topk, ef)
            print(f"{name:10} ef={ef:4} recall={rec:.4f} "
                  f"qps={qps:12,.0f} build={build_s:6.1f}s", flush=True)


if __name__ == "__main__":
    main()
