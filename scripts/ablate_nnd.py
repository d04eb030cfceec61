"""Ablate one NN-Descent chunk round on TPU: gather+dists vs dedup-merge.
All arrays passed as jit ARGS (captured constants get embedded into the
remote-compile request and blow its size limit)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alayalite_tpu.utils.platforms import enable_compile_cache
enable_compile_cache()
import numpy as np, jax, jax.numpy as jnp
from alayalite_tpu.spaces.raw import RawSpace
from alayalite_tpu.index.nndescent import _dedup_sorted_merge

N, D, K = 1_000_000, 128, 32
C = 32768
s1, s2, s_rev, n_rand = 16, 8, 16, 4
M = s1 * s2 + s_rev + n_rand

rng = np.random.default_rng(0)
space = RawSpace.create(N, D).fit(rng.normal(size=(N, D)).astype(np.float32))
knn_i = jnp.asarray(rng.integers(0, N, size=(N, K)).astype(np.int32))
knn_d = jnp.zeros((N, K), jnp.float32)
cand = jnp.asarray(rng.integers(0, N, size=(C, M)).astype(np.int32))
qv = space.data[:C]

def sync(x): np.asarray(x.ravel()[:1])

def t10(name, jitted, *args):
    sync(jitted(*args)); t0=time.time(); sync(jitted(*args))
    print(f"{name:28} {(time.time()-t0-0.035)/10*1000:8.1f} ms/round-chunk", flush=True)

@jax.jit
def g_dists(space, qv, cand):
    def body(i, acc):
        d = space.gather_dists(qv, (cand + i) % N)
        return acc + d.ravel()[0]
    return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

@jax.jit
def g_hop2(knn_i, cand):
    def body(i, acc):
        h = knn_i[(cand[:, :16] + i) % N]
        return acc + h.ravel()[0].astype(jnp.float32)
    return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

@jax.jit
def g_full(space, qv, cand, kd, ki):
    def body(i, acc):
        d = space.gather_dists(qv, (cand + i) % N)
        nd, ni = _dedup_sorted_merge(kd, ki, d, (cand + i) % N, K)
        return acc + nd.ravel()[0]
    return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

@jax.jit
def g_merge(cand, kd, ki):
    def body(i, acc):
        d = ((cand + i) % 97).astype(jnp.float32)
        nd, ni = _dedup_sorted_merge(kd, ki, d, (cand + i) % N, K)
        return acc + nd.ravel()[0]
    return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

t10("gather+dists [32k,148]", g_dists, space, qv, cand)
t10("hop2 gather [32k,16,32]", g_hop2, knn_i, cand)
t10("dists+dedup_merge", g_full, space, qv, cand, knn_d[:C], knn_i[:C])
t10("dedup_merge only", g_merge, cand, knn_d[:C], knn_i[:C])
