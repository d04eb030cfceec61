"""Measure the reference (AlayaLite) on this host's CPU — same workload as
bench.py — and write results/reference_baseline.json.

Builds ref_bench.cpp against the reference headers in place (see that file's
header comment), generates the identical synthetic dataset bench.py uses
(random_dataset seed=42), runs the reference's HNSW build + search_solo
sweep over ef, and computes recall@10 against numpy brute force.

The host has a single CPU core (nproc=1), so qps_1core is a true
single-thread measurement of the reference's own hot loop (AVX-512 active —
this CPU has avx512f/bw/dq/vl). The reference's batch_search runs one
coroutine per query over num_threads workers with no shared mutable state
(reference python/include/index.hpp:289-370), so its 32-core throughput is
bounded above by 32 x qps_1core; BASELINE.md uses that linear extrapolation
as the (reference-favoring) baseline.

Usage:  python scripts/reference_baseline/run.py  [n] [dim] [nq]
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))


def write_bin(path, arr):
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    with open(path, "wb") as f:
        np.array(arr.shape, dtype=np.int64).tofile(f)
        arr.tofile(f)


def read_ids(path):
    with open(path, "rb") as f:
        nq, k = np.fromfile(f, dtype=np.int64, count=2)
        return np.fromfile(f, dtype=np.uint32).reshape(nq, k)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    topk = 10

    from alayalite_tpu.utils.datasets import random_dataset
    from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

    ds = random_dataset(n=n, dim=dim, n_queries=nq, seed=42,
                        clusters=max(32, n // 2000))
    tmp = os.path.join(HERE, "tmp")
    os.makedirs(tmp, exist_ok=True)
    write_bin(os.path.join(tmp, "data.bin"), ds.data)
    write_bin(os.path.join(tmp, "queries.bin"), ds.queries)

    exe = os.path.join(HERE, "ref_bench")
    src = os.path.join(HERE, "ref_bench.cpp")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++20",
             "-I", os.path.join(HERE, "stubs"),
             "-I", "/root/reference/include",
             "-o", exe, src, "-lpthread"],
            check=True)

    print("computing brute-force GT ...", file=sys.stderr)
    gt = calc_gt(ds.data, ds.queries, topk, fast=True)

    # R / L / ef ladder overridable for non-128-d shapes (GIST-960 needs a
    # wider ladder to cross 0.95 recall)
    r_nbrs = os.environ.get("REF_R", "32")
    l_cons = os.environ.get("REF_L", "200")
    efs = os.environ.get("REF_EFS", "16,24,32,48,64,96,128").split(",")
    t0 = time.time()
    out = subprocess.run(
        [exe, os.path.join(tmp, "data.bin"), os.path.join(tmp, "queries.bin"),
         os.path.join(tmp, "ref"), r_nbrs, l_cons, str(topk)] + efs,
        check=True, capture_output=True, text=True)
    print(out.stderr, file=sys.stderr)

    rows = []
    for line in out.stdout.splitlines():
        row = json.loads(line)
        ids = read_ids(os.path.join(tmp, f"ref_ef{row['ef']}.bin"))
        row["recall"] = round(float(calc_recall(ids.astype(np.int64), gt)), 4)
        rows.append(row)
        print(row, file=sys.stderr)

    ok = [r for r in rows if r["recall"] >= 0.95]
    best = max(ok, key=lambda r: r["qps_1core"]) if ok else None
    result = {
        "system": "reference AlayaLite (header-only C++ core, compiled "
                  "-O3 -march=native, AVX-512 host, 1 CPU core)",
        "workload": {"n": n, "dim": dim, "nq": nq, "topk": topk,
                     "dataset": "random_dataset(seed=42) — identical to bench.py"},
        "config": {"index": "hnsw", "R": int(r_nbrs), "L": int(l_cons),
                   "space": "raw f32 L2",
                   "search": "GraphSearchJob::search_solo (sync hot loop)"},
        "host_cores": os.cpu_count(),
        "rows": rows,
        "best_at_recall95_1core": best,
        "extrapolated_32core_qps": (round(32 * best["qps_1core"], 1)
                                    if best else None),
        "note": "batch_search = independent per-query coroutines; 32-core "
                "QPS <= 32 x single-core (linear upper bound, favors the "
                "reference). Measured on {}s total".format(
                    round(time.time() - t0, 1)),
    }
    os.makedirs(os.path.join(REPO, "results"), exist_ok=True)
    suffix = "" if n == 100_000 else ("_1m" if n == 1_000_000 else f"_{n}")
    if dim != 128:
        suffix += f"_d{dim}"
    out_path = os.path.join(REPO, "results", f"reference_baseline{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
