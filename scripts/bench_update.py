"""Steady-state online-update throughput: insert/remove rates on a live
bsq8 index at 100k scale (the update-path analog of bench.py's search
numbers; reference anchor: tests/executor/update_test.cpp churn flow).

Run (TPU): python scripts/bench_update.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alayalite_tpu.utils.platforms import enable_compile_cache  # noqa: E402

enable_compile_cache()

from alayalite_tpu import Index, IndexParams  # noqa: E402
from alayalite_tpu.utils.datasets import random_dataset  # noqa: E402

N = int(os.environ.get("BU_N", "100000"))
DIM = int(os.environ.get("BU_DIM", "128"))
BATCH = int(os.environ.get("BU_BATCH", "512"))
QUANT = os.environ.get("BU_QUANT", "bsq8")  # bsq8 | sq8 | none (raw path)
SKIP_COMPACT = os.environ.get("BU_SKIP_COMPACT", "") == "1"
ds = random_dataset(n=N, dim=DIM, n_queries=0, seed=42, clusters=N // 2000)

idx = Index("u", IndexParams(index_type="hnsw", capacity=N + 32 * BATCH,
                             max_nbrs=32, ef_construction=200,
                             quantization_type=QUANT))
t0 = time.time()
idx.fit(ds.data)
print(f"build {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
base = ds.data[rng.integers(0, N, size=8 * BATCH)]
new = base + 0.02 * rng.normal(size=base.shape).astype(np.float32)

# warm (first batch compiles the insert-search shapes)
t0 = time.time()
idx.insert(new[:BATCH])
print(f"insert warm batch ({BATCH}): {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
for b in range(1, 5):
    idx.insert(new[b * BATCH: (b + 1) * BATCH])
dt = time.time() - t0
print(f"insert steady: {4*BATCH/dt:,.0f} vec/s ({dt/4:.2f}s per {BATCH})",
      flush=True)

doomed = rng.choice(N, size=4 * BATCH, replace=False).astype(np.int32)
t0 = time.time()
for b in range(4):
    idx.remove(doomed[b * BATCH: (b + 1) * BATCH])
dt = time.time() - t0
print(f"remove steady: {4*BATCH/dt:,.0f} vec/s", flush=True)

# larger batches amortize the per-dispatch tunnel floor: report both
big = ds.data[rng.integers(0, N, size=4 * 1024)] + 0.02 * rng.normal(
    size=(4 * 1024, DIM)).astype(np.float32)
idx.insert(big[:1024])  # warm the 1024 shapes
t0 = time.time()
for b in range(1, 4):
    idx.insert(big[b * 1024: (b + 1) * 1024])
dt = time.time() - t0
print(f"insert steady (1024-batch): {3*1024/dt:,.0f} vec/s", flush=True)

# compaction wall-clock: 20% tombstones at 100k (round-2 verdict target:
# < 5 s host time with the vectorized rewire_candidates). Cycle 1 pays the
# one-time XLA compiles of the [A, W]-bucketed rewire shapes; cycle 2 on a
# fresh index is the steady state a long-lived serving process sees.
if SKIP_COMPACT:
    sys.exit(0)
for cycle in (1, 2):
    jdx = Index(f"c{cycle}", IndexParams(
        index_type="hnsw", capacity=N + 32 * BATCH, max_nbrs=32,
        ef_construction=200, quantization_type="bsq8"))
    jdx.fit(ds.data)
    eng = jdx._engine
    eng.params.compaction_threshold = 0.0  # manual
    dead = rng.choice(N, size=int(0.2 * N), replace=False).astype(np.int32)
    jdx.remove(dead)
    t0 = time.time()
    eng.compact()
    print(f"compact 20% of {N} (cycle {cycle}): {time.time()-t0:.1f}s",
          flush=True)
