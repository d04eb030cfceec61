"""Fashion-MNIST-784 sweep: the reference's other published eval curve
(reference README.md:63-69 plots fashion-mnist-784-euclidean; BASELINE.md
eval configs; round-3 verdict missing #3 / next #7).

Zero egress — no real fmnist bytes available — so the stand-in mimics its
statistics: 60k x 784 L2, pixel-valued [0, 255] u8-ish, ~10 class modes
with LOW INTRINSIC DIMENSION (each class a rank-16 affine subspace +
noise, like articulated grayscale garments). That is the regime the
dataset stresses: high ambient dim, tiny intrinsic dim, heavy cluster
overlap. Real fmnist via ALAYA_DATA_DIR is used when mounted.

Run (TPU): python scripts/sweep_fmnist.py → results/sweep_fmnist784_60k.json
"""

from __future__ import annotations

import json
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

N, DIM, NQ, K = 60_000, 784, 8192, 10
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def synth_fmnist(n, dim, nq, seed=42, classes=10, rank=16):
    rng = np.random.default_rng(seed)
    protos = rng.uniform(0, 160, size=(classes, dim)).astype(np.float32)
    bases = rng.normal(size=(classes, rank, dim)).astype(np.float32)
    bases /= np.linalg.norm(bases, axis=2, keepdims=True)

    def draw(m):
        cls = rng.integers(0, classes, size=m)
        coef = rng.normal(scale=40.0, size=(m, rank)).astype(np.float32)
        x = protos[cls] + np.einsum("mr,mrd->md", coef, bases[cls])
        x += rng.normal(scale=8.0, size=(m, dim)).astype(np.float32)
        return np.clip(x, 0, 255).astype(np.float32)

    return draw(n), draw(nq)


def main() -> None:
    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.datasets import (available_real_datasets,
                                              load_real_dataset)
    from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

    name = "fashion-mnist-784-euclidean"
    if name in set(available_real_datasets()):
        ds = load_real_dataset(name, topk=K)
        data, queries, gt = ds.data, ds.queries[:NQ], ds.gt[:NQ, :K]
        src = "real"
    else:
        data, queries = synth_fmnist(N, DIM, NQ)
        gt = calc_gt(data, queries, K, fast=True)
        src = "synthetic"
    n, dim = data.shape
    nq = queries.shape[0]
    print(f"dataset: {src} n={n} dim={dim} nq={nq}", file=sys.stderr)

    rows = []

    # chip-rate probes (relay-floor-amortized in-jit loops) shared with the
    # GIST frontier harness
    from gist_frontier import chip_rate, chip_rate_block

    def run(cfg_name, params, efs, probe=None):
        idx = Index(cfg_name, params)
        t0 = time.time()
        idx.fit(data)
        build_s = time.time() - t0
        for ef in efs:
            ids = idx.batch_search(queries, K, ef_search=ef)
            rec = calc_recall(ids, gt)
            idx.batch_search(queries, K, ef_search=ef)
            t0 = time.time()
            for _ in range(3):
                idx.batch_search(queries, K, ef_search=ef)
            qps = nq / ((time.time() - t0) / 3)
            row = {"config": cfg_name, "ef": ef,
                   "recall": round(rec, 4), "qps": round(qps, 1),
                   "build_s": round(build_s, 1)}
            if probe is not None:
                try:
                    iters = max(3, ef // 8)
                    row["qps_chip"] = round(probe(idx, queries, ef, iters),
                                            1)
                except Exception as e:  # best-effort: keep the e2e row
                    row["qps_chip_error"] = str(e)[:200]
            rows.append(row)
            print(f"{cfg_name} ef={ef}: recall@10={rec:.4f} "
                  f"qps={qps:,.0f} chip={row.get('qps_chip', 0):,.0f} "
                  f"build={build_s:.1f}s", file=sys.stderr)
            if rec >= 0.995:
                break

    path = os.path.join(REPO, "results", "sweep_fmnist784_60k.json")

    def flush(note=""):
        out = {"dataset": f"fmnist784_{src}", "n": n, "dim": dim, "nq": nq,
               "rows": rows}
        if note:
            out["note"] = note
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        return out

    run("flat_fast", IndexParams(index_type="flat", capacity=n,
                                 flat_mode="fast"), [K])
    flush()
    run("hnsw_sq8", IndexParams(index_type="hnsw", capacity=n, max_nbrs=32,
                                ef_construction=200,
                                quantization_type="sq8"),
        [32, 48, 64, 96, 128], probe=chip_rate)
    flush()
    # block arm (VERDICT r4 weak #6): rabitq2 is the high-dim block winner
    # (the 960-d deferred-alloc + flat code layout work covers 784 too)
    run("rabitq2", IndexParams(index_type="hnsw", capacity=n, max_nbrs=32,
                               ef_construction=200, prune_alpha=1.2,
                               quantization_type="rabitq2",
                               search_iters=0, beam_expand=8),
        [32, 48, 64, 96, 128], probe=chip_rate_block)
    out = flush()
    print(json.dumps(out)[:400])


if __name__ == "__main__":
    main()
