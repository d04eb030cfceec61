"""Scalar-quantized spaces (SQ8 / SQ4) with MXU-fused asymmetric distances.

TPU-native re-design of /root/reference/include/space/quant/{sq8,sq4}.hpp and
{sq8,sq4}_space.hpp. Quantization math matches the reference exactly:
per-dimension min/max, ``code = round((v - min) / (max - min) * levels)``
with levels = 255 (SQ8, quant/sq8.hpp:120-132) or 15 (SQ4, quant/sq4.hpp:
139-149); SQ4 packs two codes per byte (even dim → low nibble, odd dim →
high nibble, same layout rule as the reference).

Distance evaluation is asymmetric (f32 query vs decoded codes) like the
reference's `l2_sqr_sq8` kernels, but factored for the MXU: with
``x̂ = c∘s + m``,

    q·x̂   = (q∘s)·c + q·m          (one matmul against the u8 codes)
    |x̂|²  precomputed at encode time

so L2² = |q|² − 2·q·x̂ + |x̂|² costs one [B,K,D] contraction in bf16 and no
per-element decode materialization.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distance import normalize_rows


@flax.struct.dataclass
class SQSpace:
    codes: jax.Array        # [capacity, dim] uint8 (sq8) or [capacity, dim/2] packed (sq4)
    dmin: jax.Array         # [dim] f32 per-dim minimum
    scale: jax.Array        # [dim] f32 per-dim (max-min)/levels
    xhat_sq: jax.Array      # [capacity] f32 — |decoded vector|²
    valid: jax.Array        # [capacity] bool
    num: jax.Array          # scalar int32
    metric: str = flax.struct.field(pytree_node=False)
    user_metric: str = flax.struct.field(pytree_node=False)
    bits: int = flax.struct.field(pytree_node=False, default=8)
    dim: int = flax.struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.codes.shape[0]

    @property
    def levels(self) -> int:
        return (1 << self.bits) - 1

    # ---- construction ----
    @staticmethod
    def create(capacity: int, dim: int, bits: int = 8,
               metric: str = "l2") -> "SQSpace":
        metric = metric.lower()
        compute = "ip" if metric in ("ip", "cos") else "l2"
        if bits == 8:
            cshape = (capacity, dim)
        elif bits == 4:
            cshape = (capacity, (dim + 1) // 2)
        else:
            raise ValueError("bits must be 4 or 8")
        return SQSpace(
            codes=jnp.zeros(cshape, dtype=jnp.uint8),
            dmin=jnp.zeros((dim,), dtype=jnp.float32),
            scale=jnp.ones((dim,), dtype=jnp.float32),
            xhat_sq=jnp.zeros((capacity,), dtype=jnp.float32),
            valid=jnp.zeros((capacity,), dtype=bool),
            num=jnp.zeros((), dtype=jnp.int32),
            metric=compute,
            user_metric=metric,
            bits=bits,
            dim=dim,
        )

    def prep_query(self, q: jax.Array) -> jax.Array:
        q = jnp.asarray(q, dtype=jnp.float32)
        if self.user_metric == "cos":
            q = normalize_rows(q)
        return q

    # ---- encode / decode ----
    def _encode(self, v: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Quantize rows → (codes, |x̂|²)."""
        lv = float(self.levels)
        c = jnp.clip(jnp.round((v - self.dmin[None, :]) /
                               jnp.maximum(self.scale[None, :], 1e-30)), 0, lv)
        xhat = c * self.scale[None, :] + self.dmin[None, :]
        xsq = jnp.sum(xhat * xhat, axis=-1)
        c = c.astype(jnp.uint8)
        if self.bits == 4:
            d = v.shape[1]
            if d % 2:
                c = jnp.pad(c, ((0, 0), (0, 1)))
            lo = c[:, 0::2]
            hi = c[:, 1::2]
            c = (lo | (hi << 4)).astype(jnp.uint8)
        return c, xsq

    def _decode_codes(self, packed: jax.Array) -> jax.Array:
        """packed [..., dim or dim/2] u8 → unpacked f32 codes [..., dim]."""
        if self.bits == 8:
            return packed.astype(jnp.float32)
        lo = (packed & 0x0F).astype(jnp.float32)
        hi = (packed >> 4).astype(jnp.float32)
        c = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1],
                                                 packed.shape[-1] * 2)
        return c[..., : self.dim]

    def decode(self, ids: jax.Array) -> jax.Array:
        """Reconstruct vectors (reference SQ8Quantizer::quantize inverse)."""
        c = self._decode_codes(self.codes[ids])
        return c * self.scale + self.dmin

    # ---- fit / insert / remove ----
    def fit(self, vectors: jax.Array) -> "SQSpace":
        v = jnp.asarray(vectors, dtype=jnp.float32)
        if self.user_metric == "cos":
            v = normalize_rows(v)
        n = v.shape[0]
        dmin = jnp.min(v, axis=0)
        dmax = jnp.max(v, axis=0)
        scale = (dmax - dmin) / float(self.levels)
        sp = self.replace(dmin=dmin, scale=jnp.maximum(scale, 1e-30))
        # chunked encode: one-shot materializes ~3 full-size f32 transients
        # (~11.5 GB at 1M x 960 next to the raw space — HBM exhaustion)
        codes, xhat_sq = sp.codes, sp.xhat_sq
        step = max(1, min(n, int(2e8 // max(v.shape[1], 1))))
        for lo in range(0, n, step):
            c, xsq = sp._encode(v[lo: lo + step])
            codes = codes.at[lo: lo + c.shape[0]].set(c)
            xhat_sq = xhat_sq.at[lo: lo + c.shape[0]].set(xsq)
        return sp.replace(
            codes=codes,
            xhat_sq=xhat_sq,
            valid=sp.valid.at[:n].set(True),
            num=jnp.asarray(n, dtype=jnp.int32),
        )

    def insert(self, vectors: jax.Array) -> Tuple["SQSpace", jax.Array]:
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
        c, xsq = self._encode(v)
        return (
            self.replace(
                codes=self.codes.at[slot].set(
                    jnp.where(ok[:, None], c, self.codes[slot])),
                xhat_sq=self.xhat_sq.at[slot].set(
                    jnp.where(ok, xsq, self.xhat_sq[slot])),
                valid=self.valid.at[slot].set(ok | self.valid[slot]),
                num=jnp.minimum(start + b, self.capacity).astype(jnp.int32),
            ),
            jnp.where(ok, ids, -1),
        )

    def remove(self, ids: jax.Array) -> "SQSpace":
        ids = jnp.atleast_1d(jnp.asarray(ids, dtype=jnp.int32))
        safe = jnp.clip(ids, 0, self.capacity - 1)
        return self.replace(
            valid=self.valid.at[safe].set(
                jnp.where(ids >= 0, False, self.valid[safe])))

    # ---- distances ----
    def gather_dists(self, q: jax.Array, ids: jax.Array) -> jax.Array:
        """f32 [B, K] asymmetric distances; q [B, D] raw (prep_query'd).

        Codes are centered (c − levels/2) before the bf16 contraction and the
        offset folded into the per-query constant: the uncentered form
        cancels a large positive dot against q·dmin, amplifying bf16 noise
        ~levels/2-fold.
        """
        safe = jnp.clip(ids, 0, self.capacity - 1)
        packed = self.codes[safe]                          # [B, K, dim or dim/2]
        qs = (q * self.scale[None, :]).astype(jnp.bfloat16)
        half = float((self.levels + 1) // 2)
        if self.bits == 8:
            cf = (packed.astype(jnp.int16) - int(half)).astype(jnp.bfloat16)
            dot_c = jnp.einsum("bkd,bd->bk", cf, qs,
                               preferred_element_type=jnp.float32)
        else:
            lo = ((packed & 0x0F).astype(jnp.int8) - int(half)).astype(jnp.bfloat16)
            hi = ((packed >> 4).astype(jnp.int8) - int(half)).astype(jnp.bfloat16)
            dot_c = (jnp.einsum("bkd,bd->bk", lo, qs[:, 0::2],
                                preferred_element_type=jnp.float32)
                     + jnp.einsum("bkd,bd->bk", hi,
                                  qs[:, 1::2] if self.dim % 2 == 0
                                  else jnp.pad(qs[:, 1::2], ((0, 0), (0, 1))),
                                  preferred_element_type=jnp.float32))
        # q·x̂ = (q∘s)·(c − h) + q·(m + h·s)
        shift = self.dmin[None, :] + half * self.scale[None, :]
        q_dot_m = jnp.sum(q * shift, axis=-1, keepdims=True)
        q_dot_x = dot_c + q_dot_m                         # [B, K]
        if self.metric == "ip":
            return -q_dot_x
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        d = q_sq - 2.0 * q_dot_x + self.xhat_sq[safe]
        return jnp.maximum(d, 0.0)

    # ---- persistence (reference: sq8.hpp:161-177, sq8_space.hpp:213-251) ----
    def save_arrays(self) -> dict:
        return {
            "codes": np.asarray(self.codes),
            "dmin": np.asarray(self.dmin),
            "scale": np.asarray(self.scale),
            "xhat_sq": np.asarray(self.xhat_sq),
            "valid": np.asarray(self.valid),
            "num": int(self.num),
            "metric": self.user_metric,
            "bits": self.bits,
            "dim": self.dim,
        }

    @staticmethod
    def load_arrays(d: dict) -> "SQSpace":
        dim = int(d["dim"])
        bits = int(d["bits"])
        codes = np.asarray(d["codes"])
        sp = SQSpace.create(codes.shape[0], dim, bits=bits,
                            metric=str(d["metric"]))
        return sp.replace(
            codes=jnp.asarray(codes),
            dmin=jnp.asarray(d["dmin"], dtype=jnp.float32),
            scale=jnp.asarray(d["scale"], dtype=jnp.float32),
            xhat_sq=jnp.asarray(d["xhat_sq"], dtype=jnp.float32),
            valid=jnp.asarray(d["valid"], dtype=bool),
            num=jnp.asarray(int(d["num"]), dtype=jnp.int32),
        )
