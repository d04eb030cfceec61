"""A/B: raw-path stale check vs popring only (VERDICT r3 #5).

The hop's stale check is its worst-lowering XLA op (DESIGN.md "fused-hop
kernel"): a [B, K, W] broadcast equality + any-reduce per hop. The Pallas
fusion attempts are recorded negative results (compile-time and
DMA-issue-bound); this measures the algebraic fix instead — dropping the
redundant in-pool half of the compare on the RAW path (see
search._expand_popring), W = P+L -> P.

Run on chip:  python scripts/ab_stale_check.py
Env: AB_B (4096), AB_N (100000), AB_EF (96), AB_R (32).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alayalite_tpu.utils.platforms import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import alayalite_tpu.index.search as S  # noqa: E402
from alayalite_tpu.ops.topk import merge_topk_dedup  # noqa: E402
from alayalite_tpu.spaces.raw import RawSpace  # noqa: E402

B = int(os.environ.get("AB_B", "4096"))
N = int(os.environ.get("AB_N", "100000"))
D = int(os.environ.get("AB_D", "128"))
R = int(os.environ.get("AB_R", "32"))
EF = int(os.environ.get("AB_EF", "96"))
M = 8
FINF = float("inf")


def expand_old(space, q, popring, pool_d, pool_i, pool_c, cand_ids, ef):
    """Round-3 formulation: stale = in-ring OR in-pool."""
    seen = jnp.concatenate([popring, pool_i], axis=1)
    stale = jnp.any(cand_ids[:, :, None] == seen[:, None, :], axis=2)
    fresh = (cand_ids >= 0) & ~stale
    safe = jnp.where(fresh, cand_ids, 0)
    d = space.gather_dists(q, safe)
    d = jnp.where(fresh, d, FINF)
    return merge_topk_dedup(
        pool_d, pool_i, pool_c, d, jnp.where(fresh, cand_ids, -1),
        jnp.zeros_like(fresh), ef)


def main():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(N, D)).astype(np.float32)
    space = RawSpace.create(N, D, metric="l2").fit(data)
    nbrs = jnp.asarray(rng.integers(0, N, size=(N, R)).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    seeds = jnp.asarray(rng.integers(0, N, size=(B, 8)).astype(np.int32))
    iters = max(8, EF // M + 4)

    new_expand = S._expand_popring
    results = {}
    for name, fn in [("new popring-only", new_expand),
                     ("old ring+pool", expand_old)]:
        S._expand_popring = fn
        S.beam_search.clear_cache()
        ids = None
        t0 = time.time()
        d, i = S.beam_search(space, nbrs, seeds, q, k=10, ef=EF,
                             max_iters=iters, n_expand=M)
        np.asarray(d[:1])
        print(f"{name}: compile+run {time.time() - t0:.1f}s", flush=True)
        best = FINF
        for _ in range(4):
            t0 = time.time()
            d, i = S.beam_search(space, nbrs, seeds, q, k=10, ef=EF,
                                 max_iters=iters, n_expand=M)
            np.asarray(d[:1])
            best = min(best, time.time() - t0 - 0.035)
        ms_hop = best * 1000 / iters
        results[name] = (ms_hop, np.asarray(i))
        print(f"{name}: {best*1000:.1f} ms total, {ms_hop:.3f} ms/hop "
              f"(B={B} ef={EF} iters={iters})", flush=True)
    S._expand_popring = new_expand

    a, b = results["new popring-only"][1], results["old ring+pool"][1]
    same = (a == b).mean()
    print(f"result-id agreement new-vs-old: {same:.4f}")


if __name__ == "__main__":
    main()
