"""Pallas fused tiles vs XLA dot+epilogue on the TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alayalite_tpu.utils.platforms import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from alayalite_tpu.ops.pallas_distance import pairwise_l2_pallas, sq8_pairwise_pallas
from alayalite_tpu.ops.distance import pairwise

rng = np.random.default_rng(0)
Q, N, D = 4096, 65536, 128
q = jnp.asarray(rng.normal(size=(Q, D)).astype(np.float32))
x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
codes = jnp.asarray(rng.integers(0, 256, size=(N, D)).astype(np.uint8))
dmin = jnp.zeros((D,)); scale = jnp.full((D,), 0.01)
xsq = jnp.zeros((N,))

def sync(out):
    # block_until_ready is not a real barrier through the axon relay;
    # force a tiny D2H read to synchronize
    x = out[0] if isinstance(out, tuple) else out
    np.asarray(x[:1, :1])

def t(name, f):
    sync(f())
    t0=time.time()
    for _ in range(5): sync(f())
    dt=(time.time()-t0)/5
    gb = Q*N*4/1e9
    print(f"{name:22} {dt*1000:8.1f} ms   ({2*Q*N*D/dt/1e12:5.1f} TFLOPs)", flush=True)

xla_l2 = jax.jit(lambda q, x: pairwise(q, x, compute_dtype=jnp.bfloat16))
t("xla l2 bf16", lambda: xla_l2(q, x))
t("pallas l2 (f32 dot)", lambda: pairwise_l2_pallas(q, x, tq=256, tn=512))
from alayalite_tpu.spaces.sq import SQSpace
t("pallas sq8 fused", lambda: sq8_pairwise_pallas(q, codes, dmin, scale, xsq, tq=256, tn=512))
# and with selection consuming the matrix
sel_xla = jax.jit(lambda q, x: jax.lax.approx_max_k(-pairwise(q, x, compute_dtype=jnp.bfloat16), 40)[0])
t("xla l2+approxk", lambda: sel_xla(q, x))
sel_pal = jax.jit(lambda q, x: jax.lax.approx_max_k(-pairwise_l2_pallas(q, x, tq=256, tn=512), 40)[0])
t("pallas l2+approxk", lambda: sel_pal(q, x))
sel_sq8 = jax.jit(lambda q: jax.lax.approx_max_k(-sq8_pairwise_pallas(q, codes, dmin, scale, xsq, tq=256, tn=512), 40)[0])
t("pallas sq8+approxk", lambda: sel_sq8(q))


# true on-chip cost: repeat the op inside ONE jit, amortizing the relay floor
print("# in-jit x20 loops (relay floor amortized):", flush=True)

def t20(name, make_body):
    @jax.jit
    def run(q, x):
        def body(i, acc):
            out = make_body(q + acc * 1e-12, x)
            return acc + out[0, 0]
        return jax.lax.fori_loop(0, 20, body, jnp.float32(0.0))
    sync_v = run(q, x)
    np.asarray(sync_v)
    t0 = time.time()
    np.asarray(run(q, x))
    dt = (time.time() - t0 - 0.035) / 20
    print(f"{name:22} {dt*1000:8.2f} ms/op  ({2*Q*N*D/dt/1e12:5.1f} TFLOPs)",
          flush=True)

t20("xla l2 bf16", lambda q, x: pairwise(q, x, compute_dtype=jnp.bfloat16))
t20("pallas l2", lambda q, x: pairwise_l2_pallas(q, x, tq=256, tn=512))
t20("pallas sq8", lambda q, x: sq8_pairwise_pallas(q, codes, dmin, scale, xsq, tq=256, tn=512))
t20("xla l2+approxk",
    lambda q, x: jax.lax.approx_max_k(
        -pairwise(q, x, compute_dtype=jnp.bfloat16), 40)[0])
t20("pallas sq8+approxk",
    lambda q, x: jax.lax.approx_max_k(
        -sq8_pairwise_pallas(q, codes, dmin, scale, xsq, tq=256, tn=512),
        40)[0])
