"""Probe host<->device transfer bandwidth + dispatch latency + the flat
search with device-resident queries (isolates the relay-transfer cost)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alayalite_tpu.utils.platforms import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp

for mb in (2, 32):
    x = np.random.rand(mb * 131072, 2).astype(np.float32)
    jnp.asarray(x).block_until_ready()
    t0=time.time(); jnp.asarray(x).block_until_ready(); dt=time.time()-t0
    print(f"H2D {mb}MB: {dt*1000:7.1f} ms -> {mb/dt:7.0f} MB/s", flush=True)
    y = jnp.asarray(x)
    t0=time.time(); np.asarray(y); dt=time.time()-t0
    print(f"D2H {mb}MB: {dt*1000:7.1f} ms -> {mb/dt:7.0f} MB/s", flush=True)

f = jax.jit(lambda a: a + 1)
s = jnp.ones((8,)); f(s).block_until_ready()
t0=time.time()
for _ in range(50): f(s).block_until_ready()
print(f"dispatch+sync: {(time.time()-t0)/50*1000:.2f} ms", flush=True)

# flat search: host-resident vs device-resident queries
from alayalite_tpu.ops.distance import _exact_topk_device, _rerank_device, sqnorms
n, dim, nq = 1_000_000 if os.environ.get("IOP_BIG") else 100_000, 128, 4096
rng = np.random.default_rng(0)
data = jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
x_sq = sqnorms(data)
valid = jnp.ones((n,), bool)
q_host = rng.normal(size=(nq, dim)).astype(np.float32)
q_dev = jnp.asarray(q_host)

def run(q):
    d, i = _exact_topk_device(q if not isinstance(q, np.ndarray) else jnp.asarray(q),
                              data, x_sq, valid, k=40, metric="l2",
                              tile_n=min(65536, n), bf16=True, approx=True)
    d, i = _rerank_device(q_dev, data, x_sq, i, k=10, metric="l2")
    return i

jax.block_until_ready(run(q_dev))
t0=time.time()
for _ in range(5): jax.block_until_ready(run(q_dev))
dev_qps = nq/((time.time()-t0)/5)
print(f"flat n={n} device-resident queries: {dev_qps:10,.0f} qps", flush=True)
t0=time.time()
for _ in range(5): jax.block_until_ready(run(q_host))
host_qps = nq/((time.time()-t0)/5)
print(f"flat n={n} host queries (H2D each): {host_qps:10,.0f} qps", flush=True)
