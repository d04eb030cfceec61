"""End-of-round benchmark: 1M-scale batch QPS at the reference's own
matched-recall operating point.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

Workload (BASELINE.md eval configs, network-free): synthetic SIFT-like
clustered data (default 1M × 128, L2) — the EXACT dataset the reference
itself was measured on at the same scale (scripts/reference_baseline/,
results/reference_baseline_1m.json: random_dataset(seed=42), same clusters,
same 8192 queries).

``vs_baseline`` divides the best device-resident QPS at the reference's own
matched-recall point by the MEASURED reference baseline at the same n
(single-core measured on this host's AVX-512 CPU × 32 — the linear 32-core
upper bound that favors the reference). Device-resident rate is the honest
chip number: this test harness reaches the TPU through a tunnel with a
~35 ms dispatch floor and ~20-50 MB/s host link (measured,
scripts/io_probe.py) that caps *any* end-to-end number regardless of
compute; e2e tunnel QPS is still reported per row ("qps").

Env knobs: ALAYA_BENCH_N (default 1000000), ALAYA_BENCH_DIM (128),
ALAYA_BENCH_Q (8192), ALAYA_BENCH_GRAPH=0 (skip the bsq8 graph row),
ALAYA_BENCH_SMALL=1 (tiny CPU-runnable config).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))

# measured single-core reference QPS at its best >=0.95-recall operating
# point x 32 cores (linear upper bound), per scale — see
# results/reference_baseline{,_1m}.json (scripts/reference_baseline/run.py)
_FALLBACK_BASELINES = {
    100_000: (231_158.0, 0.973),     # ef=48: 7,223.7 x 32
    1_000_000: (108_560.0, 0.9593),  # ef=64: 3,392.5 x 32
}

# measured reference at 250k x 960 (results/reference_baseline_250000_d960
# .json, r5): best >=0.95-recall point ef=64, 314.3 QPS/core -> x32 linear
_GIST_BASELINE = (10_057.6, 0.9584)


def load_gist_baseline():
    path = os.path.join(REPO, "results",
                        "reference_baseline_250000_d960.json")
    try:
        with open(path) as f:
            d = json.load(f)
        best = d["best_at_recall95_1core"]
        return float(d["extrapolated_32core_qps"]), float(best["recall"])
    except (OSError, KeyError, ValueError, TypeError):
        return _GIST_BASELINE


def load_baseline(n: int):
    """(32-core-extrapolated QPS, recall at that operating point) for the
    measured reference baseline at scale n."""
    suffix = {100_000: "", 1_000_000: "_1m"}.get(n)
    if suffix is not None:
        path = os.path.join(REPO, "results",
                            f"reference_baseline{suffix}.json")
        try:
            with open(path) as f:
                d = json.load(f)
            best = d["best_at_recall95_1core"]
            return float(d["extrapolated_32core_qps"]), float(best["recall"])
        except (OSError, KeyError, ValueError, TypeError):
            pass
    if n in _FALLBACK_BASELINES:
        return _FALLBACK_BASELINES[n]
    # unmeasured scale: nearest measured baseline, flagged by recall point
    return _FALLBACK_BASELINES[min(_FALLBACK_BASELINES,
                                   key=lambda k: abs(k - n))]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    t_start = time.time()
    small = os.environ.get("ALAYA_BENCH_SMALL") == "1"
    n = int(os.environ.get("ALAYA_BENCH_N", "4000" if small else "1000000"))
    dim = int(os.environ.get("ALAYA_BENCH_DIM", "32" if small else "128"))
    nq = int(os.environ.get("ALAYA_BENCH_Q", "512" if small else "8192"))
    topk = 10

    from alayalite_tpu.utils.platforms import enable_compile_cache

    enable_compile_cache()

    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                        format="%(asctime)s %(message)s")

    import jax

    from alayalite_tpu import Index, IndexParams
    from alayalite_tpu.utils.datasets import random_dataset
    from alayalite_tpu.utils.evaluate import calc_gt, calc_recall

    log(f"devices: {jax.devices()}")
    log(f"workload: n={n} dim={dim} nq={nq}")

    # Real data when mounted (VERDICT r1 #3): ALAYA_DATA_DIR + optional
    # ALAYA_BENCH_DATASET (default: first available of sift/fashion-mnist).
    dataset_name = ("synthetic_sift1m" if n >= 1_000_000
                    else f"synthetic_sift{n // 1000}k")
    ds = None
    if not small:
        from alayalite_tpu.utils.datasets import (available_real_datasets,
                                                  load_real_dataset)

        want = os.environ.get("ALAYA_BENCH_DATASET")
        cands = [want] if want else ["sift", "fashion-mnist-784-euclidean",
                                     "gist", "siftsmall"]
        avail = set(available_real_datasets())
        for name in cands:
            if name in avail:
                ds = load_real_dataset(name, topk=topk)
                if ds is not None:
                    dataset_name = name
                    n, dim = ds.data.shape
                    nq = min(nq, ds.queries.shape[0])
                    ds.queries = ds.queries[:nq]
                    if ds.gt is not None:
                        ds.gt = ds.gt[:nq]
                    log(f"real dataset: {name} n={n} dim={dim} nq={nq}")
                    break
    if ds is None:
        ds = random_dataset(n=n, dim=dim, n_queries=nq, seed=42,
                            clusters=max(32, n // 2000))
    t0 = time.time()
    if ds.gt is not None:
        gt = ds.gt[:, :topk]
    else:
        # deterministic dataset (seed 42) -> the brute-force GT is cacheable;
        # at 1M x 128 the host computation costs minutes on a 1-core session
        cache_dir = os.path.join(REPO, ".bench_cache")
        gt_path = os.path.join(
            cache_dir, f"gt_{dataset_name}_{n}_{dim}_{nq}_k{topk}.npy")
        if os.path.exists(gt_path):
            gt = np.load(gt_path)
        else:
            gt = calc_gt(ds.data, ds.queries, topk, fast=True)
            os.makedirs(cache_dir, exist_ok=True)
            np.save(gt_path, np.asarray(gt))
    log(f"gt: {time.time() - t0:.1f}s")

    _last_idx = [None]

    # the measured baseline's own operating point at this scale
    # (results/reference_baseline_1m.json: 1M ef=64 → recall 0.9593;
    # 100k ef=48 → 0.9730). The ef ladder runs until it crosses this so a
    # chip rate exists at MATCHED recall, not just at the 0.95 floor
    # (round-2 verdict: the operating points did not line up).
    baseline_qps, matched_recall = load_baseline(n)
    log(f"baseline at n={n}: {baseline_qps:,.0f} qps (32-core linear) "
        f"at recall {matched_recall}")

    def iters_for(ef, m):
        # per-ef hop budget: the 3-hop schedule is tuned for ef=24 on the
        # scan-seeded graph; wider pools need proportionally more hops to
        # actually fill (recall saturates ~ef/M + a couple of hops)
        return max(3, ef // m)

    def measure(name, params, efs, per_ef_iters=False):
        import jax.numpy as jnp

        idx = Index(name, params)
        _last_idx[0] = idx
        t0 = time.time()
        idx.fit(ds.data)
        build_s = time.time() - t0
        q_dev = jnp.asarray(ds.queries)  # device-resident variant
        rows = []
        for ef in efs:
            if per_ef_iters:
                idx._engine.params.search_iters = iters_for(
                    ef, params.beam_expand)
            ids = idx.batch_search(ds.queries, topk, ef_search=ef)
            rec = calc_recall(ids, gt)
            idx.batch_search(ds.queries, topk, ef_search=ef)  # warm
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                idx.batch_search(ds.queries, topk, ef_search=ef)
            qps = nq / ((time.time() - t0) / reps)
            # device-resident queries: what the chip does once the H2D of
            # the query batch is off the critical path (embedders on-chip,
            # or a host with real PCIe instead of this test tunnel)
            idx.batch_search(q_dev, topk, ef_search=ef)
            t0 = time.time()
            for _ in range(reps):
                idx.batch_search(q_dev, topk, ef_search=ef)
            qps_dev = nq / ((time.time() - t0) / reps)
            rows.append({"config": name, "ef": ef, "recall": round(rec, 4),
                         "qps": round(qps, 1), "qps_dev": round(qps_dev, 1),
                         "build_s": round(build_s, 1)})
            log(f"{name} ef={ef}: recall@10={rec:.4f} qps={qps:,.0f} "
                f"qps_dev={qps_dev:,.0f} build={build_s:.1f}s")
            if rec >= matched_recall and name != "flat_fast":
                break
        return rows

    def chip_rate_flat(idx):
        """On-chip search rate: the full coarse+rerank program looped x10
        inside ONE jit, amortizing the test harness's ~35ms relay floor
        (scripts/io_probe.py). This is what a real TPU VM host would see."""
        import jax
        import jax.numpy as jnp

        from alayalite_tpu.ops.distance import (_exact_topk_device,
                                                _rerank_device, sqnorms)

        space = idx._engine.space
        x = space.data.astype(jnp.float32)
        npad = -(-x.shape[0] // 65536) * 65536
        if npad != x.shape[0]:
            x = jnp.pad(x, ((0, npad - x.shape[0]), (0, 0)))
        x_sq = sqnorms(x)
        vfull = jnp.zeros((npad,), bool).at[: n].set(True)
        qd = jnp.asarray(ds.queries[: min(4096, nq)])

        @jax.jit
        def run(q):
            def body(i, acc):
                d, i1 = _exact_topk_device(q + acc * 1e-12, x, x_sq, vfull,
                                           k=40, metric=space.metric,
                                           tile_n=min(65536, npad), bf16=True,
                                           approx=True, group=1)
                d2, i2 = _rerank_device(q, x, x_sq, i1, k=topk,
                                        metric=space.metric)
                return acc + d2[0, 0]
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))

        np.asarray(run(qd))  # compile + warm
        t0 = time.time()
        np.asarray(run(qd))
        dt = max(time.time() - t0 - 0.035, 1e-6) / 10
        return qd.shape[0] / dt

    def chip_rate_graph(idx, ef, iters, m, queries=None, chip_b=4096):
        """On-chip graph-search rate: seed scan + block beam looped x8
        inside ONE jit (same relay-floor amortization as chip_rate_flat)."""
        import jax
        import jax.numpy as jnp

        from alayalite_tpu.index.search import block_beam_search, scan_seeds

        eng = idx._engine
        space, valid = eng.search_space, eng.space.valid
        ss = eng._seed_scan_arrays()
        eps = eng.graph.eps
        if queries is None:
            queries = ds.queries
        qd = space.prep_query(jnp.asarray(queries[: min(chip_b,
                                                        len(queries))]))

        @jax.jit
        def run(space, valid, ss, eps, q):
            def body(i, acc):
                qc = q + acc * 1e-12
                seeds = (scan_seeds(qc, *ss) if ss is not None else
                         jnp.broadcast_to(eps[None, :],
                                          (qc.shape[0], eps.shape[0])))
                d, _ = block_beam_search(space, seeds, qc, k=topk, ef=ef,
                                         max_iters=iters, valid=valid,
                                         n_expand=m)
                return acc + d[0, 0]
            return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

        np.asarray(run(space, valid, ss, eps, qd))  # compile + warm
        t0 = time.time()
        np.asarray(run(space, valid, ss, eps, qd))
        dt = max(time.time() - t0 - 0.035, 1e-6) / 8
        return qd.shape[0] / dt

    rows = []
    rows += measure("flat_fast",
                    IndexParams(index_type="flat", capacity=n,
                                flat_mode="fast"), [topk])
    try:
        rows[0]["qps_chip"] = round(chip_rate_flat(
            Index("chip", IndexParams(index_type="flat", capacity=n),
                  ) if False else _last_idx[0]), 1)
    except Exception as e:
        log(f"chip-rate measurement failed: {e}")
    graph_rows = []
    if os.environ.get("ALAYA_BENCH_GRAPH", "1") == "1" and not small:
        # operating points: hop budget scaling with ef so the ladder
        # genuinely reaches the matched recall point instead of hop-capping
        # below it (results/sweep_hop_sched.json). prune_alpha=1.2 +
        # seed_sample=16384 are the measured 1M frontier winners
        # (results/sift1m_frontier.json: ef=32/4 hops crosses the matched
        # 0.9593 point at 0.9696, ~219k chip QPS; alpha=1.0 needs ef>=40).
        m = 8
        graph_rows = measure("bsq8_graph",
                             IndexParams(index_type="hnsw", capacity=n,
                                         max_nbrs=32, ef_construction=200,
                                         quantization_type="bsq8",
                                         prune_alpha=1.2, seed_sample=16384,
                                         search_iters=3, beam_expand=m),
                             [24, 32, 40, 48, 64, 96], per_ef_iters=True)
        for r in graph_rows:
            try:
                r["qps_chip"] = round(chip_rate_graph(
                    _last_idx[0], r["ef"], iters_for(r["ef"], m), m), 1)
                log(f"bsq8 ef={r['ef']} chip QPS {r['qps_chip']:,.0f}")
            except Exception as e:
                log(f"graph chip-rate failed: {e}")
        rows += graph_rows

    def add_pcie(row, d):
        """qps_pcie (VERDICT r4 #6): what a production PCIe host would see
        — chip time plus the query/result bytes over a 16 GB/s link,
        pipelined (max, not sum: H2D of batch t+1 overlaps compute of t).
        The tunnel's 20-50 MB/s + 35 ms floor is the test artifact; PCIe
        moves ~600 B/query, which is noise next to microseconds of chip
        time."""
        if "qps_chip" not in row or not row["qps_chip"]:
            return
        bytes_pq = d * 4 + topk * 8  # query f32 down, ids+dists back
        t_chip = 1.0 / row["qps_chip"]
        row["qps_pcie"] = round(1.0 / max(t_chip, bytes_pq / 16e9), 1)

    for r in rows:
        add_pcie(r, dim)

    # ---- GIST-960 arm (VERDICT r4 #4): the SECOND named shape in
    # BASELINE.json, driver-captured so the 960-d path cannot silently
    # regress. Matches the measured reference baseline's exact workload
    # (250k x 960 random_dataset seed=42, 2048 queries —
    # results/reference_baseline_250000_d960.json). rabitq2 block path:
    # the r4 frontier winner at 960-d.
    gist = None
    if (os.environ.get("ALAYA_BENCH_GIST", "1") == "1" and not small
            and dataset_name.startswith("synthetic")
            and time.time() - t_start < 1500):
        try:
            gn, gdim, gnq = 250_000, 960, 2048
            gds = random_dataset(n=gn, dim=gdim, n_queries=gnq, seed=42,
                                 clusters=max(32, gn // 2000))
            gt_path = os.path.join(
                REPO, ".bench_cache",
                f"gt_synthetic_gist250k_{gn}_{gdim}_{gnq}_k{topk}.npy")
            if os.path.exists(gt_path):
                ggt = np.load(gt_path)
            else:
                ggt = calc_gt(gds.data, gds.queries, topk, fast=True)
                os.makedirs(os.path.join(REPO, ".bench_cache"),
                            exist_ok=True)
                np.save(gt_path, np.asarray(ggt))
            g_base, g_matched = load_gist_baseline()
            gm = 8
            gidx = Index("gist_rabitq2",
                         IndexParams(index_type="hnsw", capacity=gn,
                                     max_nbrs=32, ef_construction=200,
                                     quantization_type="rabitq2",
                                     prune_alpha=1.2, beam_expand=gm))
            t0 = time.time()
            gidx.fit(gds.data)
            g_build = time.time() - t0
            log(f"gist arm: build {g_build:.1f}s")
            g_rows = []
            for ef in (48, 64, 96, 128):
                ids = gidx.batch_search(gds.queries, topk, ef_search=ef)
                rec = calc_recall(ids, ggt)
                row = {"config": "gist_rabitq2_250k", "ef": ef,
                       "recall": round(float(rec), 4),
                       "build_s": round(g_build, 1)}
                try:
                    row["qps_chip"] = round(chip_rate_graph(
                        gidx, ef, 0, gm, queries=gds.queries,
                        chip_b=1024), 1)
                except Exception as e:  # keep the arm best-effort
                    log(f"gist chip-rate failed: {e}")
                add_pcie(row, gdim)
                g_rows.append(row)
                log(f"gist ef={ef}: recall={rec:.4f} "
                    f"chip={row.get('qps_chip', 0):,.0f}")
                if rec >= g_matched:
                    break
            okg = [r for r in g_rows
                   if r["recall"] >= g_matched and r.get("qps_chip")]
            bestg = max(okg, key=lambda r: r["qps_chip"]) if okg else (
                max(g_rows, key=lambda r: r["recall"]))
            gist = {
                "baseline_qps_32core": g_base,
                "baseline_recall_point": g_matched,
                "best": bestg,
                "vs_baseline_gist": round(
                    bestg.get("qps_chip", 0.0) / g_base, 4)
                if bestg["recall"] >= g_matched else 0.0,
                "rows": g_rows,
            }
            del gidx
        except Exception as e:
            log(f"gist arm failed: {e}")

    # Headline: the GRAPH config (the index class that scales past what
    # brute force can carry — flat stays a row for context) at the best
    # on-chip rate with recall >= 0.95. Chip rate vs the 32-core linear
    # extrapolation is the engine-vs-engine comparison: the reference was
    # measured in-process on this host; the chip number excludes only this
    # test harness's TPU tunnel (~35 ms dispatch + 20-50 MB/s host link,
    # scripts/io_probe.py), which a real TPU VM host does not have.
    pick = graph_rows or rows
    ok95 = [r for r in pick if r["recall"] >= 0.95 and "qps_chip" in r]
    okm = [r for r in pick
           if r["recall"] >= matched_recall and "qps_chip" in r]
    best95 = (max(ok95, key=lambda r: r["qps_chip"]) if ok95
              else max(pick, key=lambda r: r["recall"]))
    bestm = max(okm, key=lambda r: r["qps_chip"]) if okm else None
    # headline at the MATCHED recall point (the baseline was measured at
    # 0.973) when the ladder reached it; the 0.95-floor row stays in detail
    best = bestm if bestm is not None else best95
    thresh = matched_recall if bestm is not None else 0.95
    value = best.get("qps_chip", 0.0) if best["recall"] >= thresh else 0.0

    def hop_roofline(row):
        """Static hop roofline at the headline point (VERDICT r4 #6): the
        block path's per-hop gather bytes vs HBM bandwidth (v5e ~819 GB/s)
        against measured chip time — when gather_share is small the hop
        loop is MERGE-bound (sort/top-k over the ef pool), i.e. chip
        headroom lives in the merge networks, not in memory traffic."""
        if "qps_chip" not in row or not row["qps_chip"]:
            return None
        m_, r_ = 8, 32
        iters = iters_for(row["ef"], m_)
        code_b = -(-dim // 128) * 128  # bsq8 code bytes/neighbor (padded)
        bytes_hop_q = m_ * r_ * (code_b + 4 + 4) + m_ * dim * 4
        t_chip_q = 1.0 / row["qps_chip"]
        t_hbm_q = iters * bytes_hop_q / 819e9
        return {
            "iters": iters, "bytes_per_hop_per_query": bytes_hop_q,
            "t_chip_us_per_query": round(t_chip_q * 1e6, 3),
            "t_hbm_floor_us_per_query": round(t_hbm_q * 1e6, 3),
            "gather_share": round(t_hbm_q / t_chip_q, 4),
            "bound": ("hbm" if t_hbm_q / t_chip_q > 0.5 else "merge"),
        }

    out = {
        "metric": f"graph_chip_qps@recall10>={thresh}_{dataset_name}",
        "value": round(value, 1),
        "unit": "qps",
        "vs_baseline": round(value / baseline_qps, 4),
        "detail": {
            "n": n, "dim": dim, "nq": nq,
            "baseline_qps_32core": baseline_qps,
            "best": best,
            "best_at_095": best95,
            "vs_baseline_at_095": round(
                best95.get("qps_chip", 0.0) / baseline_qps, 4),
            "baseline_recall_point": matched_recall,
            "rows": rows,
            "hop_roofline": hop_roofline(best),
            "gist960": gist,
            "total_s": round(time.time() - t_start, 1),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(out), flush=True)


def _supervise() -> int:
    """Run the bench in a child process with a deadline, retrying on
    infra failure.

    The axon tunnel's chip claim can hang indefinitely when the remote
    TPU worker has crashed (measured this host: a client OOM wedged the
    pool for hours; backend init neither errors nor returns). A hung or
    errored attempt must not eat the whole round-end bench window, so the
    parent (which never imports jax) gives each attempt
    ALAYA_BENCH_DEADLINE seconds (default 2400) and retries
    ALAYA_BENCH_RETRIES times (default 2) with a 120 s gap. The child
    inherits stdout, so the single JSON line still lands on stdout.
    """
    import subprocess

    attempts = max(1, int(os.environ.get("ALAYA_BENCH_RETRIES", "2")))
    deadline = float(os.environ.get("ALAYA_BENCH_DEADLINE", "3000"))
    env = dict(os.environ, ALAYA_BENCH_CHILD="1")
    rc = 1
    for att in range(1, attempts + 1):
        t0 = time.time()
        try:
            rc = subprocess.call([sys.executable, os.path.abspath(__file__)],
                                 env=env, timeout=deadline)
        except subprocess.TimeoutExpired:
            rc = 4
        log(f"bench attempt {att}/{attempts}: rc={rc} "
            f"({time.time() - t0:.0f}s)")
        if rc == 0:
            break
        if att < attempts:
            time.sleep(120)
    return rc


if __name__ == "__main__":
    if os.environ.get("ALAYA_BENCH_CHILD") == "1":
        import threading

        _init_done = threading.Event()
        _budget = float(os.environ.get("ALAYA_BENCH_INIT_TIMEOUT", "900"))

        def _watchdog():
            if not _init_done.wait(_budget):
                log(f"bench: backend init exceeded {_budget:.0f}s "
                    "(wedged chip claim); exiting 3 for supervisor retry")
                os._exit(3)

        threading.Thread(target=_watchdog, daemon=True).start()
        import jax  # noqa: F401  (backend init happens on first devices())

        jax.devices()
        _init_done.set()
        main()
    else:
        sys.exit(_supervise())
