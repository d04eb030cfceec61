"""RaBitQ quantized-graph space: 1-bit neighbor codes + correction factors.

TPU-native re-design of /root/reference/include/space/rabitq_space.hpp:40-428,
quant/rabitq.hpp:28-158 and utils/rabitq_utils/{rotator,fastscan,lut}.hpp.

The reference packs, per graph node u, a chunk: raw vector ‖ 32 neighbors'
1-bit codes (sign of rotated residual v−u) ‖ f_add[32] ‖ f_rescale[32] ‖
neighbor ids[32], and estimates neighbor distances with an AVX512 4-bit-LUT
fastscan over a scalar-quantized rotated query. On TPU both tricks dissolve:

  - rotation   : one orthonormal matrix P (QR of a Gaussian draw — the
                 MatrixRotator; the FhtKac O(D log D) variant exists to speed
                 up *CPU* rotation, but on the MXU a D×D matmul at D ≤ 2048 is
                 already sub-microsecond per query, so P·q is just a matmul).
  - fastscan   : the binary dot ⟨rot(q), bits⟩ is a [B,32,D]×[B,D] einsum in
                 bf16 on the MXU — no LUT, no query quantization, strictly
                 higher estimator precision than the reference's u8 LUT path.

Estimator math (matches quant/rabitq.hpp:64-97 exactly, reformulated):
with residual r = v − u, rotated r' = P r, code b = (r' > 0),
x̄ = (2b−1)/√D, and ⟨r̂', x̄⟩ the quality of the 1-bit fit,

    d²(q,v) ≈ d²(q,u) + f_add + f_rescale · ⟨P q, x̄⟩
    f_rescale = −2‖r‖ / ⟨r̂', x̄⟩
    f_add     = ‖r‖² − f_rescale · ⟨P u, x̄⟩

and ⟨P q, x̄⟩ = (2⟨P q, b⟩ − Σ_d (P q)_d)/√D comes off the binary matmul.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import normalize_rows

DEGREE = 32  # kDegreeBound analog (rabitq_space.hpp:94)


def make_rotation(dim: int, seed: int = 0) -> np.ndarray:
    """Random orthonormal rotation (MatrixRotator, rotator.hpp:85-125)."""
    rng = np.random.default_rng(seed)
    g = rng.normal(size=(dim, dim)).astype(np.float64)
    q, r = np.linalg.qr(g)
    q *= np.sign(np.diag(r))[None, :]
    return q.astype(np.float32)


def make_fht_kac_rotation(dim: int, seed: int = 0, rounds: int = 4) -> np.ndarray:
    """The FhtKac rotator (rotator.hpp:127-166) MATERIALIZED as its
    equivalent orthonormal matrix: ``rounds`` of (random ±1 sign flip,
    normalized Walsh-Hadamard transform) applied to the identity.

    Identical transform semantics to the reference's per-vector FhtKac; on
    TPU the one-off D x D materialization then rides the MXU as a plain
    matmul, which measures FASTER than per-call FWHT butterflies at
    D <= 2048 (DESIGN.md rotation study) — so this is how the FhtKac
    *option* is wired, not a fallback.

    Non-power-of-two dims follow the reference's pad-then-rotate rule
    (rotator.hpp:127-166 pads to the next power of two): the returned
    matrix is the [Dp, dim] column slice of the Dp x Dp transform, exactly
    ``FhtKac(pad(x))`` since the zero pad contributes nothing. Its columns
    are orthonormal, so norms are preserved and the estimator identity is
    unchanged; codes live in the Dp-dim rotated space (RaBitQSpace.code_dim).
    """
    from ..ops.hadamard import fwht_np

    dp = 1 << (dim - 1).bit_length()
    rng = np.random.default_rng(seed)
    m = np.eye(dp, dtype=np.float64)
    for _ in range(rounds):
        signs = rng.choice([-1.0, 1.0], size=dp)
        m = fwht_np(m * signs[None, :])   # flip input coords, then FWHT rows
    # m maps row-vector x via x @ m.T? We built column-transform: m[i, j] =
    # (FhtKac e_j)[i]; x @ m.T rotates like fht_kac_rotate(x). Keeping only
    # the first ``dim`` input coordinates implements the zero pad.
    return m.T.astype(np.float32)[:, :dim]


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """bool [..., D] → packed uint8 [..., D/8] (D must be a multiple of 8)."""
    return np.packbits(bits.astype(np.uint8), axis=-1, bitorder="little")


def _unpack_bits_jnp(packed: jax.Array, dim: int) -> jax.Array:
    """packed uint8 [..., D/8] → float {0,1} [..., D]."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    b = (packed[..., :, None] >> shifts) & 1          # [..., D/8, 8]
    return b.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :dim]


@flax.struct.dataclass
class RaBitQSpace:
    """Per-node neighbor-quantized space; the graph adjacency lives here
    (get_edges, rabitq_space.hpp:231-237) because codes are relative to u."""

    data: jax.Array        # [capacity, D] f32 raw vectors
    sq_norms: jax.Array    # [capacity] f32
    rot: jax.Array         # [D, D] f32 orthonormal rotation P
    nbr_ids: jax.Array     # [capacity, 32] i32 (-1 pad)
    # packed sign codes, flattened 2-D: [capacity, 32 * bits*D/8] u8.
    # 3-D [C, 32, bits*D/8] storage made XLA materialize a full layout-
    # conversion copy of the tensor inside every search program (the
    # 240-byte minor dim isn't 128-aligned; 7.6 GB HLO temp at 1M x 960
    # — OOM'd the chip). The flat minor dim is 128-aligned for every
    # D % 32 == 0; estimate_block reshapes AFTER the per-node gather.
    nbr_bits: jax.Array
    f_add: jax.Array       # [capacity, 32] f32
    f_rescale: jax.Array   # [capacity, 32] f32
    valid: jax.Array       # [capacity] bool
    num: jax.Array         # scalar i32
    metric: str = flax.struct.field(pytree_node=False, default="l2")
    user_metric: str = flax.struct.field(pytree_node=False, default="l2")
    # code bits per dim: 1 = reference RaBitQ; 2 = extended codes (two
    # bit-planes, y = c - 1.5) — the same estimator identity with a finer
    # residual direction, halving the estimate noise for 2x the code bytes
    bits: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def dim(self) -> int:
        return self.data.shape[1]

    @property
    def code_dim(self) -> int:
        """Rotated-space dim: == dim for square rotators, the next power of
        two for FhtKac at non-pow2 dims (pad-then-rotate, rotator.hpp:127)."""
        return self.rot.shape[0]

    # ---- construction ----
    @staticmethod
    def create(capacity: int, dim: int, metric: str = "l2",
               seed: int = 0, rotator: str = "matrix",
               bits: int = 1, rot=None, storage=None) -> "RaBitQSpace":
        """``storage``: optional (data, sq_norms, valid, num) arrays to adopt
        instead of allocating fresh zeros — engine.fit passes the raw
        space's slab so the f32 rows are never duplicated on device (3.8 GB
        at 1M x 960; jnp arrays are immutable, so aliasing is safe)."""
        metric = metric.lower()
        if metric not in ("l2", "cos"):
            # the estimator is an L2 residual construction
            # (rabitq_space.hpp:294-313); cos := normalize-then-L2. IP has
            # no such factorization at 1 bit — use bsq8 for ip (its SQ8
            # estimator carries IP with a sign change).
            raise ValueError("rabitq supports l2/cos metrics; "
                             "use quantization_type='bsq8' for ip")
        dpad = -(-dim // 8) * 8
        if dpad != dim:
            raise ValueError("rabitq requires dim to be a multiple of 8")
        if rotator not in ("matrix", "fht_kac"):
            raise ValueError(f"unknown rotator {rotator!r}")
        if rot is None:  # load path passes the saved rotation: skip the QR
            rot = (make_fht_kac_rotation(dim, seed) if rotator == "fht_kac"
                   else make_rotation(dim, seed))
        if bits not in (1, 2):
            raise ValueError("rabitq bits must be 1 or 2")
        cdim = int(np.asarray(rot).shape[0])  # rotated-space (code) dim
        if storage is not None:
            data, sq_norms, valid, num = storage
            if data.shape != (capacity, dim) or data.dtype != jnp.float32:
                raise ValueError("adopted storage must be f32 [capacity, dim]")
        else:
            data = jnp.zeros((capacity, dim), dtype=jnp.float32)
            sq_norms = jnp.zeros((capacity,), dtype=jnp.float32)
            valid = jnp.zeros((capacity,), dtype=bool)
            num = jnp.zeros((), dtype=jnp.int32)
        return RaBitQSpace(
            data=data,
            sq_norms=sq_norms,
            rot=jnp.asarray(rot),
            nbr_ids=jnp.full((capacity, DEGREE), -1, dtype=jnp.int32),
            # neighbor blocks allocate DEFERRED (0 rows): at 1M x 960 x
            # 2-bit the packed codes are 7.7 GB that would otherwise sit
            # idle through the whole NND/pool/prune build (the blocks are
            # only written by update_neighbors at the very end) — the
            # 1M x 960 rabitq2 build OOMs with them resident.
            # _blocks_alloc() materializes full-capacity buffers on first
            # use; every writer goes through it.
            nbr_bits=jnp.zeros((0, DEGREE * bits * cdim // 8),
                               dtype=jnp.uint8),
            f_add=jnp.zeros((0, DEGREE), dtype=jnp.float32),
            f_rescale=jnp.zeros((0, DEGREE), dtype=jnp.float32),
            valid=valid,
            num=num,
            metric="l2",
            user_metric=metric,
            bits=bits,
        )

    def _blocks_alloc(self):
        """Full-capacity (nbr_bits, f_add, f_rescale), materializing the
        create()-deferred zero-row placeholders on first write."""
        if self.nbr_bits.shape[0] == self.capacity:
            return self.nbr_bits, self.f_add, self.f_rescale
        nbytes = self.bits * self.code_dim // 8
        return (jnp.zeros((self.capacity, DEGREE * nbytes), dtype=jnp.uint8),
                jnp.zeros((self.capacity, DEGREE), dtype=jnp.float32),
                jnp.zeros((self.capacity, DEGREE), dtype=jnp.float32))

    def prep_query(self, q: jax.Array) -> jax.Array:
        q = jnp.asarray(q, dtype=jnp.float32)
        if self.user_metric == "cos":
            q = normalize_rows(q)
        return q

    def fit(self, vectors: jax.Array) -> "RaBitQSpace":
        """Load raw vectors (codes come later via update_nei once the graph
        exists — same two-phase flow as the reference's fit → update_nei)."""
        v = jnp.asarray(vectors, dtype=jnp.float32)
        if self.user_metric == "cos":
            v = normalize_rows(v)
        n = v.shape[0]
        return self.replace(
            data=self.data.at[:n].set(v),
            sq_norms=self.sq_norms.at[:n].set(jnp.sum(v * v, axis=-1)),
            valid=self.valid.at[:n].set(True),
            num=jnp.asarray(n, dtype=jnp.int32),
        )

    # ---- neighbor quantization (update_nei, rabitq_space.hpp:138-161) ----
    def update_neighbors(self, nbrs: np.ndarray,
                         chunk: int = 2048) -> "RaBitQSpace":
        """Quantize every node's neighbor block from adjacency [N, 32].
        Device-resident: bits pack on device (little-endian, matching
        _unpack_bits_jnp) and accumulate into donated buffers."""
        n = int(self.num)
        if n == 0:
            return self  # nothing stored yet: no blocks to encode
        if isinstance(nbrs, jax.Array):
            # device-resident adjacency (repair_connectivity_dev output):
            # slice/pad on device, skip the host roundtrip entirely
            nbrs = nbrs[:n, :DEGREE].astype(jnp.int32)
            if nbrs.shape[1] < DEGREE:
                nbrs = jnp.pad(nbrs, ((0, 0), (0, DEGREE - nbrs.shape[1])),
                               constant_values=-1)
        else:
            nbrs = np.asarray(nbrs[:n, :DEGREE], dtype=np.int32)
            if nbrs.shape[1] < DEGREE:
                nbrs = np.pad(nbrs, ((0, 0), (0, DEGREE - nbrs.shape[1])),
                              constant_values=-1)
        nbrs_dev = self.nbr_ids.at[:n].set(jnp.asarray(nbrs))
        bits_buf, fa_buf, fr_buf = self._blocks_alloc()
        c = min(chunk, n)
        starts = list(range(0, n - c + 1, c))
        if n % c and (not starts or starts[-1] + c < n):
            starts.append(n - c)
        for lo in starts:
            bits_buf, fa_buf, fr_buf = _quantize_block_into(
                bits_buf, fa_buf, fr_buf, self.data, self.rot, nbrs_dev,
                jnp.asarray(lo, jnp.int32), chunk=c, bits=self.bits)
        return self.replace(nbr_ids=nbrs_dev, nbr_bits=bits_buf,
                            f_add=fa_buf, f_rescale=fr_buf)

    @property
    def degree(self) -> int:
        return self.nbr_ids.shape[1]

    def insert_raw(self, vectors: jax.Array) -> Tuple["RaBitQSpace", jax.Array]:
        """Append raw vectors at the bump pointer (RawSpace.insert
        semantics); neighbor blocks come via set_neighbor_rows."""
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

    def set_neighbor_rows(self, node_ids, rows) -> "RaBitQSpace":
        """Set adjacency rows for arbitrary nodes and requantize their
        blocks — the reference's per-node update_nei
        (rabitq_space.hpp:138-161) as one batched device op."""
        ids = jnp.atleast_1d(jnp.asarray(node_ids, dtype=jnp.int32))
        rows = jnp.asarray(rows, dtype=jnp.int32)
        if rows.shape[1] < DEGREE:
            rows = jnp.pad(rows, ((0, 0), (0, DEGREE - rows.shape[1])),
                           constant_values=-1)
        rows = rows[:, :DEGREE]
        bits, fa, fr = _quantize_block(self.data, self.rot, ids, rows,
                                       bits=self.bits)
        bits_buf, fa_buf, fr_buf = self._blocks_alloc()
        packed = _pack_bits_jnp(bits)
        return self.replace(
            nbr_ids=self.nbr_ids.at[ids].set(rows),
            nbr_bits=bits_buf.at[ids].set(
                packed.reshape(packed.shape[0], -1)),
            f_add=fa_buf.at[ids].set(fa),
            f_rescale=fr_buf.at[ids].set(fr))

    def remove(self, ids: jax.Array) -> "RaBitQSpace":
        ids = jnp.atleast_1d(jnp.asarray(ids, dtype=jnp.int32))
        safe = jnp.clip(ids, 0, self.capacity - 1)
        return self.replace(
            valid=self.valid.at[safe].set(
                jnp.where(ids >= 0, False, self.valid[safe])))

    # ---- query-side ----
    def rotate_queries(self, q: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(P·q [B, D], Σ_d (P·q)_d [B]) — computed once per query batch
        (the Lut-build analog, lut.hpp:29-130)."""
        qrot = jnp.dot(q, self.rot.T, preferred_element_type=jnp.float32)
        return qrot, jnp.sum(qrot, axis=-1)

    def estimate_block(self, qrot: jax.Array, qsum: jax.Array,
                       d_center: jax.Array, u: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
        """Estimated distances to the 32 neighbors of popped nodes ``u``.

        qrot [B, D], qsum [B], d_center [B] = exact d²(q, u), u [B] i32.
        Returns (est [B, 32], nbr_ids [B, 32]) — batch_est_dist analog
        (rabitq_space.hpp:280-366) as one MXU contraction.
        """
        safe = jnp.clip(u, 0, self.capacity - 1)
        packed = self.nbr_bits[safe].reshape(u.shape[0], DEGREE, -1)
        qb = qrot.astype(jnp.bfloat16)
        cd = self.code_dim
        if self.bits == 1:
            b = _unpack_bits_jnp(packed, cd)                     # [B, 32, E]
            dot_b = jnp.einsum("bkd,bd->bk", b.astype(jnp.bfloat16), qb,
                               preferred_element_type=jnp.float32)
            proj = (2.0 * dot_b - qsum[:, None]) / jnp.sqrt(float(cd))
        else:
            # 2-bit: y = c - 1.5 with c = plane0 + 2*plane1; proj = <qrot, y>
            db = cd // 8
            p0 = _unpack_bits_jnp(packed[..., :db], cd)
            p1 = _unpack_bits_jnp(packed[..., db:], cd)
            d0 = jnp.einsum("bkd,bd->bk", p0.astype(jnp.bfloat16), qb,
                            preferred_element_type=jnp.float32)
            d1 = jnp.einsum("bkd,bd->bk", p1.astype(jnp.bfloat16), qb,
                            preferred_element_type=jnp.float32)
            proj = d0 + 2.0 * d1 - 1.5 * qsum[:, None]
        est = d_center[:, None] + self.f_add[safe] + self.f_rescale[safe] * proj
        return jnp.maximum(est, 0.0), self.nbr_ids[safe]

    def gather_dists(self, q: jax.Array, ids: jax.Array) -> jax.Array:
        """Exact distances (raw vectors) — the rerank / centroid path."""
        safe = jnp.clip(ids, 0, self.capacity - 1)
        vecs = self.data[safe]
        dot = jnp.einsum("bkd,bd->bk", vecs, q,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        return jnp.maximum(q_sq + self.sq_norms[safe] - 2.0 * dot, 0.0)

    # ---- persistence (rabitq_space.hpp:368-417) ----
    def save_arrays(self) -> dict:
        return {
            "data": np.asarray(self.data),
            "rot": np.asarray(self.rot),
            "nbr_ids": np.asarray(self.nbr_ids),
            "nbr_bits": np.asarray(self.nbr_bits),
            "f_add": np.asarray(self.f_add),
            "f_rescale": np.asarray(self.f_rescale),
            "valid": np.asarray(self.valid),
            "num": int(self.num),
            "metric": self.user_metric,
            "bits": self.bits,
        }

    @staticmethod
    def load_arrays(d: dict) -> "RaBitQSpace":
        data = np.asarray(d["data"], dtype=np.float32)
        sp = RaBitQSpace.create(data.shape[0], data.shape[1],
                                metric=str(d["metric"]),
                                bits=int(d.get("bits", 1)),
                                rot=np.asarray(d["rot"], dtype=np.float32))
        return sp.replace(
            data=jnp.asarray(data),
            sq_norms=jnp.asarray((data * data).sum(-1), dtype=jnp.float32),
            nbr_ids=jnp.asarray(d["nbr_ids"], dtype=jnp.int32),
            # accept both the current flat [C, 32*nbytes] layout and
            # pre-round-4 3-D [C, 32, nbytes] files
            nbr_bits=jnp.asarray(
                np.asarray(d["nbr_bits"], dtype=np.uint8)
                .reshape(data.shape[0], -1)),
            f_add=jnp.asarray(d["f_add"], dtype=jnp.float32),
            f_rescale=jnp.asarray(d["f_rescale"], dtype=jnp.float32),
            valid=jnp.asarray(d["valid"], dtype=bool),
            num=jnp.asarray(int(d["num"]), dtype=jnp.int32),
        )


def _pack_bits_jnp(bits: jax.Array) -> jax.Array:
    """bool [..., D] → packed uint8 [..., D/8], little-endian per byte
    (inverse of _unpack_bits_jnp)."""
    shape = bits.shape
    b = bits.reshape(*shape[:-1], shape[-1] // 8, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                   static_argnames=("chunk", "bits"))
def _quantize_block_into(bits_buf, fa_buf, fr_buf, data, rot, nbrs_dev, lo,
                         chunk: int, bits: int = 1):
    """Quantize one chunk of neighbor blocks into donated device buffers."""
    us = lo + jnp.arange(chunk, dtype=jnp.int32)
    nbrs = jax.lax.dynamic_slice_in_dim(nbrs_dev, lo, chunk)
    code, fa, fr = _quantize_block(data, rot, us, nbrs, bits=bits)
    packed = _pack_bits_jnp(code)
    bits_buf = jax.lax.dynamic_update_slice_in_dim(
        bits_buf, packed.reshape(chunk, -1), lo, 0)
    fa_buf = jax.lax.dynamic_update_slice_in_dim(fa_buf, fa, lo, 0)
    fr_buf = jax.lax.dynamic_update_slice_in_dim(fr_buf, fr, lo, 0)
    return bits_buf, fa_buf, fr_buf


@functools.partial(jax.jit, static_argnames=("bits",))
def _quantize_block(data: jax.Array, rot: jax.Array, us: jax.Array,
                    nbrs: jax.Array, bits: int = 1):
    """Quantize neighbor blocks for nodes ``us`` [C] with neighbors [C, 32].

    Returns (code planes [C, 32, bits*D] bool — plane p at [..., p*D:(p+1)*D],
    f_add [C, 32], f_rescale [C, 32]).
    Factor math per the module docstring (reference: quant/rabitq.hpp:64-97).
    The estimator identity est = d_center + f_add + f_rescale * <qrot, y>
    holds for ANY code direction y (its normalization cancels into the
    factors); bits=1 uses y = 2b - 1 (the reference code), bits=2 uses
    y = c - 1.5 with c a 4-level uniform quantization of the rotated
    residual (step 0.9957 sigma — the Lloyd-optimal uniform 2-bit grid for
    a Gaussian, which a rotated residual is to good approximation).
    """
    e = rot.shape[0]  # rotated-space dim (next pow2 of D for FhtKac)
    center = data[us]                                   # [C, D]
    ok = nbrs >= 0
    vecs = data[jnp.where(ok, nbrs, 0)]                 # [C, 32, D]
    r = vecs - center[:, None, :]                       # residuals
    rrot = jnp.einsum("ckd,ed->cke", r, rot,
                      preferred_element_type=jnp.float32)
    norm_r = jnp.sqrt(jnp.sum(r * r, axis=-1))          # [C, 32]
    if bits == 1:
        code = (rrot > 0)
        xbar = (2.0 * code.astype(jnp.float32) - 1.0) / jnp.sqrt(float(e))
        rhat_dot_x = jnp.sum(rrot * xbar, axis=-1) / jnp.maximum(norm_r,
                                                                 1e-30)
        # degenerate fit (r == 0 or orthogonal): fall back to d²(q,u)
        good = ok & (rhat_dot_x > 1e-6)
        f_rescale = jnp.where(
            good, -2.0 * norm_r / jnp.where(good, rhat_dot_x, 1.0), 0.0)
        crot = jnp.einsum("cd,ed->ce", center, rot,
                          preferred_element_type=jnp.float32)  # P·u
        c_dot_x = jnp.einsum("ckd,cd->ck", xbar, crot)
        f_add = jnp.where(good, jnp.sum(r * r, axis=-1) - f_rescale * c_dot_x,
                          0.0)
        return code, f_add, f_rescale
    # 2-bit planes
    sigma = norm_r[:, :, None] / jnp.sqrt(float(e))
    step = 0.9957 * jnp.maximum(sigma, 1e-30)
    c = jnp.clip(jnp.round(rrot / step + 1.5), 0, 3)
    y = c - 1.5                                          # [C, 32, D]
    t = jnp.sum(rrot * y, axis=-1)
    good = ok & (t > 1e-12)
    rsq = jnp.sum(r * r, axis=-1)
    f_rescale = jnp.where(good, -2.0 * rsq / jnp.where(good, t, 1.0), 0.0)
    crot = jnp.einsum("cd,ed->ce", center, rot,
                      preferred_element_type=jnp.float32)
    c_dot_y = jnp.einsum("ckd,cd->ck", y, crot)
    f_add = jnp.where(good, rsq - f_rescale * c_dot_y, 0.0)
    ci = c.astype(jnp.int32)
    planes = jnp.concatenate([(ci & 1) > 0, (ci >> 1) > 0], axis=-1)
    return planes, f_add, f_rescale


# ---- generic block-search protocol (shared with BQGSpace) ----
def _rabitq_query_ctx(self, q: jax.Array):
    qrot, qsum = self.rotate_queries(q)
    return (q, qrot, qsum)


def _rabitq_estimate_for(self, ctx, u: jax.Array):
    """estimate_block with the exact center distance folded in: the popped
    node's raw vector rides in its block in the reference layout
    (rabitq_space.hpp load_centroid); here it's one thin gather per pop."""
    q, qrot, qsum = ctx
    d_center = self.gather_dists(q, u[:, None])[:, 0]
    return self.estimate_block(qrot, qsum, d_center, u)


RaBitQSpace.query_ctx = _rabitq_query_ctx
RaBitQSpace.estimate_for = _rabitq_estimate_for
