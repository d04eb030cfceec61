"""Reproduce the GIST-960 chip-rate COMPILE failure without the 1100 s build.

gist_frontier.py's chip_rate probe died with `HTTP 500: tpu_compile_helper
subprocess exit code 1` on every ef at the 1M x 960 fitted shapes (see
results/gist960_frontier.json `qps_chip_error`), even with every array a jit
argument and the probe shrunk to 1024 queries. This script AOT-lowers the
IDENTICAL program over jax.ShapeDtypeStruct pytrees at the same shapes and
calls .compile() — no data, no HBM residency, no build — so the failure can
be bisected cheaply (vary EF/QCHUNK/PROBE_Q/R via env).

Usage (real TPU):  timeout 1200 python scripts/probe_gist_chip_compile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from alayalite_tpu.utils.platforms import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alayalite_tpu.index.engine import _rerank_exact  # noqa: E402
from alayalite_tpu.index.graph import OverlayLevel  # noqa: E402
from alayalite_tpu.index.search import graph_search_device  # noqa: E402
from alayalite_tpu.spaces.raw import RawSpace  # noqa: E402
from alayalite_tpu.spaces.sq import SQSpace  # noqa: E402

N = int(os.environ.get("PG_N", "1000000"))
DIM = int(os.environ.get("PG_DIM", "960"))
R = int(os.environ.get("PG_R", "48"))
EF = int(os.environ.get("PG_EF", "64"))
NB = int(os.environ.get("PG_Q", "1024"))
QCHUNK = int(os.environ.get("PG_QCHUNK", "1024"))
ITERS = int(os.environ.get("PG_ITERS", "0"))
LOOP = int(os.environ.get("PG_LOOP", "4"))
K, M = 10, 8

S = jax.ShapeDtypeStruct
f32, i32, u8, b8 = jnp.float32, jnp.int32, jnp.uint8, jnp.bool_

ss = SQSpace(codes=S((N, DIM), u8), dmin=S((DIM,), f32),
             scale=S((DIM,), f32), xhat_sq=S((N,), f32),
             valid=S((N,), b8), num=S((), i32),
             metric="l2", user_metric="l2", bits=8, dim=DIM)
space = RawSpace(data=S((N, DIM), f32), sq_norms=S((N,), f32),
                 valid=S((N,), b8), num=S((), i32),
                 metric="l2", user_metric="l2")
nbrs = S((N, R), i32)
eps = S((8,), i32)
# hnsw._build_overlay at n=1M, R=48: levels 434 and 20833, padded to 8
r2 = max(2, R // 2)
sizes = []
cur = N
while cur > max(2 * R, 64):
    cur = max(1, cur // max(2, R))
    sizes.append(-(-cur // 8) * 8)
sizes = sizes[::-1]
overlay = tuple(OverlayLevel(ids=S((c,), i32), nbrs=S((c, r2), i32),
                             down=S((c,), i32)) for c in sizes)
valid = S((N,), b8)
qj = S((NB, DIM), f32)
qr = S((NB, DIM), f32)


@jax.jit
def run(ss, space, nbrs, eps, overlay, valid, qj, qr):
    def body(i, acc):
        qc = qj + acc * 1e-12
        _, pool = graph_search_device(
            ss, nbrs, eps, overlay, qc, k=EF, ef=EF, max_iters=ITERS,
            valid=valid, n_expand=M, qchunk=QCHUNK, exact_rerank=False)
        d, _ = _rerank_exact(space, qr, pool, K)
        return acc + d[0, 0]
    return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))


def _rand_state():
    """Random fitted-state arrays at the exact shapes. The lockstep beam
    runs a FIXED iteration count, so wall time doesn't depend on values —
    but gather ADDRESSES do; random rows reproduce the real random-access
    HBM pattern (zeros would alias every gather to row 0)."""
    import numpy as np
    rng = np.random.default_rng(0)
    rows = rng.integers(0, N, size=(N, R), dtype=np.int32)
    ovl = []
    for c in sizes:
        ovl.append(OverlayLevel(
            ids=jnp.asarray(rng.integers(0, N, size=c, dtype=np.int32)),
            nbrs=jnp.asarray(rng.integers(0, c, size=(c, r2),
                                          dtype=np.int32)),
            down=jnp.asarray(rng.integers(0, c, size=c, dtype=np.int32))))
    ss_v = SQSpace(codes=jnp.asarray(
                       rng.integers(0, 256, size=(N, DIM), dtype=np.uint8)),
                   dmin=jnp.zeros(DIM, jnp.float32),
                   scale=jnp.full((DIM,), 1 / 255, jnp.float32),
                   xhat_sq=jnp.asarray(
                       rng.random(N, dtype=np.float32) * DIM),
                   valid=jnp.ones(N, jnp.bool_),
                   num=jnp.int32(N), metric="l2", user_metric="l2",
                   bits=8, dim=DIM)
    sp_v = RawSpace(data=jnp.asarray(rng.random((N, DIM), np.float32)),
                    sq_norms=jnp.asarray(
                        rng.random(N, dtype=np.float32) * DIM),
                    valid=jnp.ones(N, jnp.bool_), num=jnp.int32(N),
                    metric="l2", user_metric="l2")
    q = jnp.asarray(rng.random((NB, DIM), np.float32))
    return (ss_v, sp_v, jnp.asarray(rows), jnp.zeros(8, jnp.int32),
            tuple(ovl), jnp.ones(N, jnp.bool_), q, q)


def main() -> None:
    import numpy as np
    print(f"devices: {jax.devices()}", flush=True)
    print(f"shapes: N={N} DIM={DIM} R={R} EF={EF} NB={NB} "
          f"qchunk={QCHUNK} overlay={sizes}", flush=True)
    t0 = time.time()
    low = run.lower(ss, space, nbrs, eps, overlay, valid, qj, qr)
    print(f"lowered in {time.time() - t0:.1f}s "
          f"(HLO {len(low.as_text()) / 1e6:.1f} MB)", flush=True)
    t0 = time.time()
    try:
        low.compile()
        print(f"COMPILED OK in {time.time() - t0:.1f}s", flush=True)
    except Exception as e:
        print(f"COMPILE FAILED after {time.time() - t0:.1f}s: "
              f"{str(e)[:500]}", flush=True)
        raise SystemExit(1)
    if os.environ.get("PG_MEASURE") != "1":
        return
    t0 = time.time()
    args = _rand_state()
    np.asarray(args[2][:1])
    print(f"state uploaded in {time.time() - t0:.0f}s", flush=True)
    np.asarray(run(*args))  # warm
    t0 = time.time()
    np.asarray(run(*args))
    dt = max(time.time() - t0 - 0.035, 1e-6) / LOOP
    print(f"qps_chip_synth ef={EF}: {NB / dt:,.1f}  ({dt * 1e3:.1f} ms "
          f"per {NB}-query pass)", flush=True)


if __name__ == "__main__":
    main()
