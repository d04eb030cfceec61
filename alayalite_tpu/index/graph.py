"""Graph index structures as JAX pytrees.

TPU-native re-design of /root/reference/include/index/graph/graph.hpp:44-255
and overlay_graph.hpp:36-195. The reference keeps a flat ``max_nodes ×
max_nbrs`` adjacency slab plus optional HNSW upper layers; here:

  - ``Graph.nbrs`` is a dense ``int32[capacity, R]`` device array (-1 padded),
    so one hop for a whole query batch is a single gather.
  - The overlay is a tuple of per-level dense subgraphs with *local* neighbor
    indices and a ``down`` map into the next level, so greedy descent
    (graph.hpp initialize_search) is a jitted while_loop per level.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class OverlayLevel:
    ids: jax.Array    # [Nl] int32 — global node id of each local slot
    nbrs: jax.Array   # [Nl, R2] int32 — local indices within this level (-1 pad)
    down: jax.Array   # [Nl] int32 — local index of the same node one level below
                      # (for the last overlay level: the global id itself)

    @property
    def size(self) -> int:
        return self.ids.shape[0]


@flax.struct.dataclass
class Graph:
    nbrs: jax.Array   # [capacity, R] int32, -1 padded
    eps: jax.Array    # [E] int32 entry points, -1 padded
    overlay: Tuple[OverlayLevel, ...] = ()

    @property
    def capacity(self) -> int:
        return self.nbrs.shape[0]

    @property
    def max_nbrs(self) -> int:
        return self.nbrs.shape[1]

    @staticmethod
    def create(capacity: int, max_nbrs: int, eps: Optional[np.ndarray] = None,
               num_eps: int = 8) -> "Graph":
        e = np.full(num_eps, -1, dtype=np.int32)
        if eps is not None:
            eps = np.asarray(eps, dtype=np.int32)[:num_eps]
            e[: len(eps)] = eps
        return Graph(
            nbrs=jnp.full((capacity, max_nbrs), -1, dtype=jnp.int32),
            eps=jnp.asarray(e),
            overlay=(),
        )

    @staticmethod
    def from_numpy(nbrs: np.ndarray, eps: np.ndarray,
                   overlay: Tuple[OverlayLevel, ...] = (),
                   capacity: Optional[int] = None) -> "Graph":
        if isinstance(nbrs, jax.Array):
            # device-resident adjacency (e.g. from repair_connectivity_dev)
            # is padded on device — no host roundtrip
            nbrs = nbrs.astype(jnp.int32)
            if capacity is not None and capacity > nbrs.shape[0]:
                nbrs = jnp.pad(nbrs, ((0, capacity - nbrs.shape[0]), (0, 0)),
                               constant_values=-1)
        else:
            nbrs = np.asarray(nbrs, dtype=np.int32)
            if capacity is not None and capacity > nbrs.shape[0]:
                pad = np.full((capacity - nbrs.shape[0], nbrs.shape[1]), -1,
                              np.int32)
                nbrs = np.concatenate([nbrs, pad], axis=0)
        return Graph(nbrs=jnp.asarray(nbrs), eps=jnp.asarray(np.asarray(eps, np.int32)),
                     overlay=overlay)

    # ---- persistence (mirrors graph.hpp:165-238 save/load semantics) ----
    def save_arrays(self) -> dict:
        out = {
            "nbrs": np.asarray(self.nbrs),
            "eps": np.asarray(self.eps),
            "n_overlay": len(self.overlay),
        }
        for li, lvl in enumerate(self.overlay):
            out[f"ov{li}_ids"] = np.asarray(lvl.ids)
            out[f"ov{li}_nbrs"] = np.asarray(lvl.nbrs)
            out[f"ov{li}_down"] = np.asarray(lvl.down)
        return out

    @staticmethod
    def load_arrays(d: dict) -> "Graph":
        n_ov = int(d["n_overlay"])
        overlay = tuple(
            OverlayLevel(
                ids=jnp.asarray(d[f"ov{li}_ids"], dtype=jnp.int32),
                nbrs=jnp.asarray(d[f"ov{li}_nbrs"], dtype=jnp.int32),
                down=jnp.asarray(d[f"ov{li}_down"], dtype=jnp.int32),
            )
            for li in range(n_ov)
        )
        return Graph(nbrs=jnp.asarray(d["nbrs"], dtype=jnp.int32),
                     eps=jnp.asarray(d["eps"], dtype=jnp.int32),
                     overlay=overlay)
