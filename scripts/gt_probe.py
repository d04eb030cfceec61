import sys, time, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from alayalite_tpu.utils.platforms import enable_compile_cache
enable_compile_cache("/root/repo/.jax_cache")
import numpy as np, jax
t0=time.time()
def log(*a): print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)
log("devices", jax.devices())
from alayalite_tpu.ops.distance import exact_topk
rng = np.random.default_rng(0)
data = rng.normal(size=(100_000,128)).astype(np.float32)
q = rng.normal(size=(10_000,128)).astype(np.float32)
d,i = exact_topk(q[:100], data, 10); log("topk B=100 done")
d,i = exact_topk(q[:1000], data, 10); log("topk B=1000 done")
d,i = exact_topk(q, data, 10); log("topk B=10000 done")
t0b=time.time(); d,i = exact_topk(q, data, 10); log("topk B=10000 warm", round(time.time()-t0b,2),"s")
