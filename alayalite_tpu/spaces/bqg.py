"""Block-SQ8 quantized graph space — the TPU-native flagship layout.

No direct reference analog (this is a TPU-first design, motivated by
measurement): the per-row cost of HBM gathers on TPU (~12 ns/row regardless
of row bytes ≤ ~4KB) makes "one thin row per neighbor" traversal
gather-bound. Borrowing the reference RaBitQ space's *layout* idea
(/root/reference/include/space/rabitq_space.hpp:63-85 packs each node's
neighbors' codes beside the node) but with 8-bit scalar quantization instead
of 1-bit: each graph node owns one fat row [32 neighbor ids ‖ 32×D u8 codes ‖
32 reconstruction norms], so expanding M nodes costs M fat gathers per query
per hop instead of M·R thin ones — and the SQ8 estimator is accurate enough
that recall matches raw traversal (unlike 1-bit RaBitQ estimates, whose
noise grows with cluster tightness).

Quantization math = SQSpace (per-dim global min/max, spaces/sq.py), distance
factored for the MXU:  d² = (|q|² − 2 q·m) − 2 (q∘s)·c + |x̂|².
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import normalize_rows


@flax.struct.dataclass
class BQGSpace:
    data: jax.Array        # [C, D] f32 raw vectors (exact rerank path)
    sq_norms: jax.Array    # [C] f32
    dmin: jax.Array        # [D] f32
    scale: jax.Array       # [D] f32
    nbr_ids: jax.Array     # [C, R] i32 (-1 pad)
    nbr_codes: jax.Array   # [C, R, Dp] u8 — neighbors' SQ8 codes, blocked;
                           # Dp = D padded to a lane multiple (128) with the
                           # center byte 128 so pads contribute 0 to the dot
                           # and every dim rides the fused decode+dot kernel
    nbr_xsq: jax.Array     # [C, R] f32 — |x̂|² per neighbor
    valid: jax.Array       # [C] bool
    num: jax.Array         # scalar i32
    metric: str = flax.struct.field(pytree_node=False, default="l2")
    user_metric: str = flax.struct.field(pytree_node=False, default="l2")

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def dim(self) -> int:
        return self.data.shape[1]

    @property
    def degree(self) -> int:
        return self.nbr_ids.shape[1]

    @property
    def code_dim(self) -> int:
        return self.nbr_codes.shape[2]

    # ---- construction ----
    @staticmethod
    def create(capacity: int, dim: int, metric: str = "l2",
               degree: int = 32) -> "BQGSpace":
        metric = metric.lower()
        if metric not in ("l2", "cos", "ip"):
            raise ValueError("bqg supports l2/cos/ip metrics")
        cdim = -(-dim // 128) * 128
        return BQGSpace(
            data=jnp.zeros((capacity, dim), dtype=jnp.float32),
            sq_norms=jnp.zeros((capacity,), dtype=jnp.float32),
            dmin=jnp.zeros((dim,), dtype=jnp.float32),
            scale=jnp.ones((dim,), dtype=jnp.float32),
            nbr_ids=jnp.full((capacity, degree), -1, dtype=jnp.int32),
            # neighbor blocks allocate DEFERRED (0 rows): the ~4 GB code
            # tensor (1M x 32 x 128) would otherwise sit idle through the
            # kNN phase before the interim block pack first writes it.
            # _blocks_alloc() materializes full-capacity buffers on first
            # use; every writer goes through it.
            nbr_codes=jnp.full((0, degree, cdim), 128, dtype=jnp.uint8),
            nbr_xsq=jnp.zeros((0, degree), dtype=jnp.float32),
            valid=jnp.zeros((capacity,), dtype=bool),
            num=jnp.zeros((), dtype=jnp.int32),
            # cos = normalize-then-L2 (order-equivalent); ip is its own path:
            # the estimator factorization keeps the same shape with the dot
            # coefficient 1 instead of 2 and |x̂|² stored as 0
            # (reference: include/simd/distance_ip.hpp:50-170 sign rule)
            metric="ip" if metric == "ip" else "l2",
            user_metric=metric,
        )

    def _blocks_alloc(self):
        """Full-capacity (nbr_codes, nbr_xsq), materializing the
        create()-deferred zero-row placeholders on first write."""
        if self.nbr_codes.shape[0] == self.capacity:
            return self.nbr_codes, self.nbr_xsq
        return (jnp.full((self.capacity, self.degree, self.code_dim), 128,
                         dtype=jnp.uint8),
                jnp.zeros((self.capacity, self.degree), dtype=jnp.float32))

    def prep_query(self, q: jax.Array) -> jax.Array:
        q = jnp.asarray(q, dtype=jnp.float32)
        if self.user_metric == "cos":
            q = normalize_rows(q)
        return q

    def fit(self, vectors: jax.Array) -> "BQGSpace":
        v = jnp.asarray(vectors, dtype=jnp.float32)
        if self.user_metric == "cos":
            v = normalize_rows(v)
        n = v.shape[0]
        dmin = jnp.min(v, axis=0)
        scale = jnp.maximum((jnp.max(v, axis=0) - dmin) / 255.0, 1e-30)
        return self.replace(
            data=self.data.at[:n].set(v),
            sq_norms=self.sq_norms.at[:n].set(jnp.sum(v * v, axis=-1)),
            dmin=dmin, scale=scale,
            valid=self.valid.at[:n].set(True),
            num=jnp.asarray(n, dtype=jnp.int32),
        )

    # ---- neighbor blocks ----
    def update_neighbors(self, nbrs: np.ndarray,
                         chunk: int = 2048) -> "BQGSpace":
        """Encode every node's neighbor block. Codes accumulate on device
        with buffer donation (at 1M the code tensor is ~4 GB — a host
        roundtrip would take minutes through a TPU tunnel)."""
        n = int(self.num)
        if n == 0:
            return self  # nothing stored yet: no blocks to encode
        r = self.degree
        if isinstance(nbrs, jax.Array):
            # device-resident adjacency (repair_connectivity_dev output):
            # slice/pad on device, skip the host roundtrip entirely
            nbrs = nbrs[:n, :r].astype(jnp.int32)
            if nbrs.shape[1] < r:
                nbrs = jnp.pad(nbrs, ((0, 0), (0, r - nbrs.shape[1])),
                               constant_values=-1)
        else:
            nbrs = np.asarray(nbrs[:n, :r], dtype=np.int32)
            if nbrs.shape[1] < r:
                nbrs = np.pad(nbrs, ((0, 0), (0, r - nbrs.shape[1])),
                              constant_values=-1)
        nbrs_dev = self.nbr_ids.at[:n].set(jnp.asarray(nbrs))
        codes, xsq = self._blocks_alloc()
        chunk = min(chunk, n)
        for lo in range(0, n, chunk):
            start = min(lo, n - chunk)
            codes, xsq = _encode_block_into(
                codes, xsq, self.data, self.dmin, self.scale, nbrs_dev,
                jnp.asarray(start, jnp.int32), chunk=chunk,
                store_sq=self.metric == "l2")
        return self.replace(nbr_ids=nbrs_dev, nbr_codes=codes, nbr_xsq=xsq)

    def insert_raw(self, vectors: jax.Array) -> Tuple["BQGSpace", jax.Array]:
        """Append raw vectors at the bump pointer (RawSpace.insert semantics:
        slots past capacity drop with id -1). Neighbor blocks for the new
        nodes are set separately via set_neighbor_rows. Quantizer params
        (dmin/scale) stay fixed — the global grid from fit() keeps old codes
        valid; out-of-range inserts clip (SQ8-grade estimate degradation,
        exact rerank unaffected)."""
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
        data = self.data.at[slot].set(
            jnp.where(ok[:, None], v, self.data[slot]))
        sq = self.sq_norms.at[slot].set(
            jnp.where(ok, jnp.sum(v * v, axis=-1), self.sq_norms[slot]))
        valid = self.valid.at[slot].set(jnp.where(ok, True, self.valid[slot]))
        new_num = jnp.minimum(start + b, self.capacity).astype(jnp.int32)
        return (self.replace(data=data, sq_norms=sq, valid=valid,
                             num=new_num),
                jnp.where(ok, ids, -1))

    def set_neighbor_rows(self, node_ids, rows) -> "BQGSpace":
        """Set adjacency rows for arbitrary nodes and re-encode their packed
        blocks — the online-update analog of the reference's per-node
        update_nei (rabitq_space.hpp:138-161), SQ8 edition."""
        ids = jnp.atleast_1d(jnp.asarray(node_ids, dtype=jnp.int32))
        rows = jnp.asarray(rows, dtype=jnp.int32)
        r = self.degree
        if rows.shape[1] < r:
            rows = jnp.pad(rows, ((0, 0), (0, r - rows.shape[1])),
                           constant_values=-1)
        rows = rows[:, :r]
        codes, xsq = _encode_block(self.data, self.dmin, self.scale, rows,
                                   store_sq=self.metric == "l2")
        codes_buf, xsq_buf = self._blocks_alloc()
        return self.replace(
            nbr_ids=self.nbr_ids.at[ids].set(rows),
            nbr_codes=codes_buf.at[ids].set(codes),
            nbr_xsq=xsq_buf.at[ids].set(xsq))

    # ---- query-side (block-search protocol) ----
    @property
    def _dot_coef(self) -> float:
        # l2: d² = qconst − 2·(q∘s)·c_centered + |x̂|²; ip: −q·x̂ =
        # qconst − (q∘s)·c_centered (with |x̂|² stored as 0)
        return 2.0 if self.metric == "l2" else 1.0

    def _clamp(self, est: jax.Array) -> jax.Array:
        return jnp.maximum(est, 0.0) if self.metric == "l2" else est

    def query_ctx(self, q: jax.Array):
        """Per-batch precompute: (q, q∘scale bf16, qconst) where qconst is
        |q|² − 2·q·(m + 128 s) for L2 and −q·(m + 128 s) for IP.

        Codes are centered at 128 in estimate_for (bf16 cancellation — see
        SQSpace.gather_dists), so the 128·s offset folds in here."""
        qs = (q * self.scale[None, :]).astype(jnp.bfloat16)
        pad = self.code_dim - self.dim
        if pad:
            qs = jnp.pad(qs, ((0, 0), (0, pad)))  # pads face code byte 128
        shift = self.dmin[None, :] + 128.0 * self.scale[None, :]
        if self.metric == "ip":
            qconst = -jnp.sum(q * shift, axis=-1)
        else:
            qconst = (jnp.sum(q * q, axis=-1)
                      - 2.0 * jnp.sum(q * shift, axis=-1))
        return (q, qs, qconst)

    def estimate_for(self, ctx, u: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Estimated d² (L2) / −q·x̂ (IP) to the R neighbors of popped
        nodes u [B]."""
        q, qs, qconst = ctx
        safe = jnp.clip(u, 0, self.capacity - 1)
        codes = self.nbr_codes[safe]                       # [B, R, Dp] u8
        cf = (codes.astype(jnp.int16) - 128).astype(jnp.bfloat16)
        dot = jnp.einsum("brd,bd->br", cf, qs,
                         preferred_element_type=jnp.float32)
        est = qconst[:, None] - self._dot_coef * dot + self.nbr_xsq[safe]
        return self._clamp(est), self.nbr_ids[safe]

    def estimate_many(self, ctx, u: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Estimated d² to the neighbors of ALL popped nodes u [B, M] in one
        shot: [B, M*R] (est, ids). One fat gather + one fused decode+dot
        kernel (ops/pallas_block.py) instead of M vmapped einsums — the
        XLA path materializes a [B, M*R, D] bf16 decode (1.8 ms/hop at
        B=4096 on v5e); the kernel decodes in VMEM (0.21 ms)."""
        from ..ops.pallas_block import block_diagdot

        q, qs, qconst = ctx
        B, M = u.shape
        safe = jnp.clip(u, 0, self.capacity - 1)
        codes = self.nbr_codes[safe].reshape(B, M * self.degree,
                                             self.code_dim)
        dot = block_diagdot(codes, qs)
        est = (qconst[:, None] - self._dot_coef * dot
               + self.nbr_xsq[safe].reshape(B, M * self.degree))
        return (self._clamp(est),
                self.nbr_ids[safe].reshape(B, M * self.degree))

    def gather_dists(self, q: jax.Array, ids: jax.Array) -> jax.Array:
        """Exact raw-vector distances (seed scoring + final rerank)."""
        safe = jnp.clip(ids, 0, self.capacity - 1)
        vecs = self.data[safe]
        dot = jnp.einsum("bkd,bd->bk", vecs, q,
                         preferred_element_type=jnp.float32)
        if self.metric == "ip":
            return -dot
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        return jnp.maximum(q_sq + self.sq_norms[safe] - 2.0 * dot, 0.0)

    def remove(self, ids: jax.Array) -> "BQGSpace":
        ids = jnp.atleast_1d(jnp.asarray(ids, dtype=jnp.int32))
        safe = jnp.clip(ids, 0, self.capacity - 1)
        return self.replace(
            valid=self.valid.at[safe].set(
                jnp.where(ids >= 0, False, self.valid[safe])))

    # ---- persistence ----
    def save_arrays(self) -> dict:
        return {
            "data": np.asarray(self.data),
            "dmin": np.asarray(self.dmin),
            "scale": np.asarray(self.scale),
            "nbr_ids": np.asarray(self.nbr_ids),
            "nbr_codes": np.asarray(self.nbr_codes),
            "nbr_xsq": np.asarray(self.nbr_xsq),
            "valid": np.asarray(self.valid),
            "num": int(self.num),
            "metric": self.user_metric,
        }

    @staticmethod
    def load_arrays(d: dict) -> "BQGSpace":
        data = np.asarray(d["data"], dtype=np.float32)
        ids = np.asarray(d["nbr_ids"])
        sp = BQGSpace.create(data.shape[0], data.shape[1],
                             metric=str(d["metric"]), degree=ids.shape[1])
        return sp.replace(
            data=jnp.asarray(data),
            sq_norms=jnp.asarray((data * data).sum(-1), dtype=jnp.float32),
            dmin=jnp.asarray(d["dmin"], dtype=jnp.float32),
            scale=jnp.asarray(d["scale"], dtype=jnp.float32),
            nbr_ids=jnp.asarray(ids, dtype=jnp.int32),
            nbr_codes=jnp.asarray(d["nbr_codes"], dtype=jnp.uint8),
            nbr_xsq=jnp.asarray(d["nbr_xsq"], dtype=jnp.float32),
            valid=jnp.asarray(d["valid"], dtype=bool),
            num=jnp.asarray(int(d["num"]), dtype=jnp.int32),
        )


@functools.partial(jax.jit, donate_argnums=(0, 1),
                   static_argnames=("chunk", "store_sq"))
def _encode_block_into(codes_buf, xsq_buf, data: jax.Array, dmin: jax.Array,
                       scale: jax.Array, nbrs_dev: jax.Array, lo, chunk: int,
                       store_sq: bool = True):
    """SQ8-encode one chunk's neighbor blocks directly into the donated
    device buffers (in-place via donation — no 4 GB copies). ``store_sq``
    False (IP metric) stores 0 for valid slots — the estimator adds xsq
    unconditionally, so invalid pads still poison to inf."""
    nbrs = jax.lax.dynamic_slice_in_dim(nbrs_dev, lo, chunk)
    ok = nbrs >= 0
    vecs = data[jnp.where(ok, nbrs, 0)]                    # [C, R, D]
    c = jnp.clip(jnp.round((vecs - dmin) / scale), 0, 255)
    xhat = c * scale + dmin
    val = jnp.sum(xhat * xhat, axis=-1) if store_sq else 0.0
    xsq = jnp.where(ok, val, jnp.inf)
    pad = codes_buf.shape[2] - c.shape[2]
    if pad:
        c = jnp.pad(c, ((0, 0), (0, 0), (0, pad)), constant_values=128)
    codes_buf = jax.lax.dynamic_update_slice_in_dim(
        codes_buf, c.astype(jnp.uint8), lo, axis=0)
    xsq_buf = jax.lax.dynamic_update_slice_in_dim(xsq_buf, xsq, lo, axis=0)
    return codes_buf, xsq_buf


@functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                   static_argnames=("chunk", "store_sq"))
def shadow_blocks_update(nbr_ids, nbr_codes, nbr_xsq, data, dmin, scale,
                         graph_nbrs, ids, chunk: int, store_sq: bool = True):
    """Re-encode the neighbor blocks of arbitrary nodes ``ids`` [T] (-1
    pads drop) from the CURRENT adjacency ``graph_nbrs`` — the maintenance
    step of the insert shadow (engine._insert_impl): after fused_raw_connect
    rewrites the new + touched rows, their shadow blocks must match. Chunked
    in-jit scan bounds the [chunk, R, D] gather temp; buffers are donated so
    the ~4 GB code tensor updates in place."""
    w = nbr_ids.shape[1]
    c_cap = nbr_ids.shape[0]
    ids2 = ids.reshape(-1, chunk)

    def step(bufs, ids_c):
        ni, nc, nx = bufs
        safe = jnp.where(ids_c >= 0, ids_c, 0)
        rows = graph_nbrs[safe][:, :w]
        codes, xsq = _encode_block(data, dmin, scale, rows,
                                   store_sq=store_sq)
        wix = jnp.where(ids_c >= 0, ids_c, c_cap)  # pads write nowhere
        return (ni.at[wix].set(rows, mode="drop"),
                nc.at[wix].set(codes, mode="drop"),
                nx.at[wix].set(xsq, mode="drop")), None

    (ni, nc, nx), _ = jax.lax.scan(step, (nbr_ids, nbr_codes, nbr_xsq), ids2)
    return ni, nc, nx


@functools.partial(jax.jit, static_argnames=("store_sq",))
def _encode_block(data: jax.Array, dmin: jax.Array, scale: jax.Array,
                  nbrs: jax.Array, store_sq: bool = True):
    """SQ8-encode neighbor vectors: [C, R] ids → (codes u8 [C, R, Dp],
    |x̂|² — or 0 when ``store_sq`` is False, the IP path); codes padded to
    the lane multiple with the center byte."""
    ok = nbrs >= 0
    vecs = data[jnp.where(ok, nbrs, 0)]                    # [C, R, D]
    c = jnp.clip(jnp.round((vecs - dmin) / scale), 0, 255)
    xhat = c * scale + dmin
    val = jnp.sum(xhat * xhat, axis=-1) if store_sq else 0.0
    xsq = jnp.where(ok, val, jnp.inf)
    pad = -(-c.shape[2] // 128) * 128 - c.shape[2]
    if pad:
        c = jnp.pad(c, ((0, 0), (0, 0), (0, pad)), constant_values=128)
    return c.astype(jnp.uint8), xsq