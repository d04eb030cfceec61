"""RawSpace: full-precision vector store as a JAX pytree.

TPU-native re-design of /root/reference/include/space/raw_space.hpp:50-322.
The reference stores vectors in a bump-allocated aligned slab with a validity
bitmap (SequentialStorage); here the slab is a device array ``data[capacity,
dim]`` with a ``valid`` mask and a dynamic ``num`` counter, so insert/remove
are functional updates and every distance evaluation is a batched gather +
MXU contraction instead of a per-pair SIMD call.

COS is handled exactly like the reference (raw_space.hpp:131-153, 266-269):
vectors are L2-normalized at fit/insert/query time and the compute metric
becomes IP.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import normalize_rows, pairwise, sqnorms


@flax.struct.dataclass
class RawSpace:
    data: jax.Array       # [capacity, dim] storage dtype
    sq_norms: jax.Array   # [capacity] f32 (0 for empty slots)
    valid: jax.Array      # [capacity] bool
    num: jax.Array        # scalar int32: bump counter (next free slot)
    metric: str = flax.struct.field(pytree_node=False)        # compute metric: 'l2'|'ip'
    user_metric: str = flax.struct.field(pytree_node=False)   # as requested: 'l2'|'ip'|'cos'
    bf16: bool = flax.struct.field(pytree_node=False, default=False)

    # ---- properties ----
    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def dim(self) -> int:
        return self.data.shape[1]

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.bf16 else None

    # ---- construction ----
    @staticmethod
    def create(
        capacity: int,
        dim: int,
        metric: str = "l2",
        storage_dtype: str = "float32",
    ) -> "RawSpace":
        metric = metric.lower()
        compute = "ip" if metric in ("ip", "cos") else "l2"
        dt = jnp.dtype(storage_dtype)
        return RawSpace(
            data=jnp.zeros((capacity, dim), dtype=dt),
            sq_norms=jnp.zeros((capacity,), dtype=jnp.float32),
            valid=jnp.zeros((capacity,), dtype=bool),
            num=jnp.zeros((), dtype=jnp.int32),
            metric=compute,
            user_metric=metric,
            bf16=(storage_dtype == "bfloat16"),
        )

    def prep_query(self, q: jax.Array) -> jax.Array:
        """Apply the same transform queries get in the reference QueryComputer
        (normalize for COS, raw otherwise)."""
        q = q.astype(jnp.float32)
        if self.user_metric == "cos":
            q = normalize_rows(q)
        return q

    def fit(self, vectors: jax.Array) -> "RawSpace":
        """Bulk-load ``n`` vectors into slots [0, n) (raw_space.hpp:131-140)."""
        v = jnp.asarray(vectors, dtype=jnp.float32)
        n, d = v.shape
        if n > self.capacity:
            raise ValueError(f"fit of {n} vectors exceeds capacity {self.capacity}")
        if self.user_metric == "cos":
            v = normalize_rows(v)
        data = self.data.at[:n].set(v.astype(self.data.dtype))
        sq = self.sq_norms.at[:n].set(sqnorms(v))
        valid = self.valid.at[:n].set(True)
        return self.replace(data=data, sq_norms=sq, valid=valid,
                            num=jnp.asarray(n, dtype=jnp.int32))

    def insert(self, vectors: jax.Array) -> Tuple["RawSpace", jax.Array]:
        """Append a batch at the bump pointer; returns (space, new_ids).

        Slots past capacity are dropped with id -1 (the caller surfaces the
        capacity error like index.py:117-123 does).
        """
        v = jnp.asarray(vectors, dtype=jnp.float32)
        if v.ndim == 1:
            v = v[None, :]
        if self.user_metric == "cos":
            v = normalize_rows(v)
        b = v.shape[0]
        start = self.num
        ids = start + jnp.arange(b, dtype=jnp.int32)
        ok = ids < self.capacity
        slot = jnp.where(ok, ids, 0)
        keep = lambda new, old: jnp.where(ok[:, None] if old.ndim > 1 else ok, new, old)  # noqa: E731
        data = self.data.at[slot].set(
            keep(v.astype(self.data.dtype), self.data[slot]))
        sq = self.sq_norms.at[slot].set(jnp.where(ok, sqnorms(v), self.sq_norms[slot]))
        valid = self.valid.at[slot].set(jnp.where(ok, True, self.valid[slot]))
        new_num = jnp.minimum(start + b, self.capacity).astype(jnp.int32)
        return (
            self.replace(data=data, sq_norms=sq, valid=valid, num=new_num),
            jnp.where(ok, ids, -1),
        )

    def insert_donated(self, vectors: jax.Array
                       ) -> Tuple["RawSpace", jax.Array]:
        """``insert`` as ONE donated jitted program: the eager path issues
        ~a dozen device ops per batch (each ~35 ms through a TPU tunnel)
        and copies the full slab three times; this dispatches once and
        scatters in place. The caller must drop every other reference to
        this space's buffers first (donation invalidates aliases) — the
        engine only takes this path when search_space IS the space or
        holds no alias."""
        return _insert_donated(self, jnp.asarray(vectors))

    def remove(self, ids: jax.Array) -> "RawSpace":
        ids = jnp.atleast_1d(jnp.asarray(ids, dtype=jnp.int32))
        return self.replace(valid=self.valid.at[jnp.clip(ids, 0, self.capacity - 1)]
                            .set(jnp.where(ids >= 0, False, self.valid[jnp.clip(ids, 0, self.capacity - 1)])))

    # ---- distance evaluation ----
    def gather_dists(self, q: jax.Array, ids: jax.Array) -> jax.Array:
        """Distances from per-query vectors to gathered node ids.

        q: [B, D] (already prep_query'd), ids: [B, K] int32 (may contain -1;
        caller masks). Returns f32 [B, K].
        """
        safe = jnp.clip(ids, 0, self.capacity - 1)
        vecs = self.data[safe]                      # [B, K, D]
        if self.bf16:
            dot = jnp.einsum("bkd,bd->bk", vecs, q.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
        else:
            # traversal ordering only — default (fast) MXU precision; the
            # engine re-scores returned ids exactly. HIGHEST here cost ~4x
            # on the serving hot loop.
            dot = jnp.einsum("bkd,bd->bk", vecs.astype(jnp.float32), q,
                             preferred_element_type=jnp.float32)
        if self.metric == "ip":
            return -dot
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        d = q_sq + self.sq_norms[safe] - 2.0 * dot
        return jnp.maximum(d, 0.0)

    def tile_dists(self, q: jax.Array, start, size: int) -> jax.Array:
        """[B, size] distances to the contiguous slab slice [start, start+size)."""
        xs = jax.lax.dynamic_slice_in_dim(self.data, start, size)
        ss = jax.lax.dynamic_slice_in_dim(self.sq_norms, start, size)
        return pairwise(q, xs.astype(jnp.float32) if not self.bf16 else xs,
                        metric=self.metric, x_sq=ss,
                        compute_dtype=self.compute_dtype)

    # ---- persistence ----
    def save_arrays(self) -> dict:
        return {
            "data": np.asarray(self.data.astype(jnp.float32)),
            "valid": np.asarray(self.valid),
            "num": int(self.num),
            "metric": self.user_metric,
        }

    @staticmethod
    def load_arrays(d: dict, storage_dtype: str = "float32") -> "RawSpace":
        data = np.asarray(d["data"], dtype=np.float32)
        sp = RawSpace.create(data.shape[0], data.shape[1], metric=str(d["metric"]),
                             storage_dtype=storage_dtype)
        # data on disk is already normalized for cos; bypass fit's re-normalize
        return sp.replace(
            data=jnp.asarray(data, dtype=sp.data.dtype),
            sq_norms=sqnorms(jnp.asarray(data)),
            valid=jnp.asarray(d["valid"], dtype=bool),
            num=jnp.asarray(int(d["num"]), dtype=jnp.int32),
        )


@functools.partial(jax.jit, donate_argnums=(0,))
def _insert_donated(space: RawSpace, v: jax.Array):
    return space.insert(v)
