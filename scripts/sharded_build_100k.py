"""100k mesh-sharded single-graph build on the 8-virtual-device CPU mesh
(VERDICT r4 weak #5: no >=100k sharded build had ever run; this host has
ONE physical TPU chip, so multi-device scale runs hermetically — the same
mesh/shard_map program the driver dry-runs).

Writes results/sharded_build_100k.json: build wall-clock + recall parity
vs brute-force GT at ef ladder.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      timeout 7200 python scripts/sharded_build_100k.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    assert len(jax.devices()) >= 8, "needs the 8-virtual-device CPU mesh"
    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.datasets import random_dataset
    from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

    n, dim, nq, k = 100_000, 64, 1024, 10
    ds = random_dataset(n=n, dim=dim, n_queries=nq, seed=42, clusters=64)
    gt = calc_gt(ds.data, ds.queries, k, fast=True)

    def fit_measure(shards):
        idx = Index(f"sb100k{shards}",
                    IndexParams(index_type="hnsw", capacity=n,
                                max_nbrs=24, ef_construction=96,
                                build_shards=shards))
        t0 = time.time()
        idx.fit(ds.data)
        build_s = time.time() - t0
        rows = []
        for ef in (48, 64, 96):
            ids = idx.batch_search(ds.queries, k, ef_search=ef)
            rows.append({"ef": ef,
                         "recall10": round(float(calc_recall(ids, gt)), 4)})
            print(shards, rows[-1], flush=True)
        return build_s, rows

    build_s, rows = fit_measure(8)
    build1_s, rows1 = fit_measure(1)  # single-device control, same params
    out = {
        "config": "hnsw build_shards=8 (ring-rotating mesh build), "
                  f"n={n} dim={dim} R=24 efc=96, 8-virtual-CPU mesh",
        "build_s": round(build_s, 1),
        "host": f"nproc={os.cpu_count()} (hermetic CPU mesh; the physical "
                "fleet has one TPU chip)",
        "rows": rows,
        "single_device_control": {"build_s": round(build1_s, 1),
                                  "rows": rows1},
    }
    with open(os.path.join(REPO, "results", "sharded_build_100k.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
