"""Multi-host (DCN) data loading for sharded indexes — SURVEY §7 step 8.

The reference is single-node (no multi-host layer exists there); this is
the first-class distributed-loading slot the TPU design adds on top
(SURVEY.md:319-320): on a multi-host pod, every process reads ONLY its own
row range of the on-disk dataset over DCN-attached storage, and the global
device array is assembled from those per-process locals — no host ever
materializes the full dataset, so 1M x 960-d (3.8 GB) loads with per-host
RSS of 3.8/num_hosts GB.

Three layers, each usable alone:

- ``maybe_distributed_init()``   — env-gated ``jax.distributed.initialize``
  (ALAYA_COORDINATOR, ALAYA_NUM_PROCESSES, ALAYA_PROCESS_ID); a no-op on
  single-process runs, so the same script works on a laptop and a pod.
- ``probe_vecs`` / ``load_vecs_rows`` — header-aware ranged reads of
  (f|i|b)vecs files via ``np.memmap`` (only the requested rows are paged
  in; the header layout matches utils/io.py::_load_vecs).
- ``load_vecs_global(path, mesh, axis)`` — per-process ranged read +
  ``jax.make_array_from_process_local_data`` into a row-sharded global
  ``jax.Array`` over the mesh axis.

``fit_shards_from_file`` is the ShardedEngine integration: each shard
fits from its own ranged read, peak host memory = one shard's rows.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

_VECS_DTYPES = {
    ".fvecs": np.dtype(np.float32),
    ".ivecs": np.dtype(np.int32),
    ".bvecs": np.dtype(np.uint8),
}


def maybe_distributed_init() -> bool:
    """Initialize ``jax.distributed`` from ALAYA_* env vars; returns True
    if a multi-process runtime was started. Safe to call repeatedly and in
    single-process runs (no env → no-op)."""
    coord = os.environ.get("ALAYA_COORDINATOR")
    if not coord:
        return False
    import jax

    nproc = int(os.environ.get("ALAYA_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("ALAYA_PROCESS_ID", "0"))
    try:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=nproc, process_id=pid)
    except RuntimeError:
        pass  # already initialized
    return True


def _vecs_dtype(path: str, dtype: Optional[np.dtype]) -> np.dtype:
    if dtype is not None:
        return np.dtype(dtype)
    ext = os.path.splitext(str(path))[1].lower()
    if ext not in _VECS_DTYPES:
        raise ValueError(f"cannot infer vecs dtype from {path!r}; pass dtype=")
    return _VECS_DTYPES[ext]


def probe_vecs(path: str, dtype: Optional[np.dtype] = None) -> Tuple[int, int]:
    """(n_rows, dim) of a vecs file from its header + size — no data read."""
    dt = _vecs_dtype(path, dtype)
    size = os.path.getsize(path)
    if size == 0:
        return 0, 0
    with open(path, "rb") as f:
        dim = int(np.frombuffer(f.read(4), dtype=np.int32)[0])
    record = 4 + dim * dt.itemsize
    if dim <= 0 or size % record != 0:
        raise ValueError(
            f"corrupt vecs file {path}: size {size}, header dim {dim}")
    return size // record, dim


def load_vecs_rows(path: str, start: int, stop: int,
                   dtype: Optional[np.dtype] = None) -> np.ndarray:
    """Rows [start, stop) of a vecs file via memmap — pages in only the
    requested byte range (the multi-host ranged read; each process calls
    this with its own range)."""
    dt = _vecs_dtype(path, dtype)
    n, dim = probe_vecs(path, dt)
    start, stop = max(0, int(start)), min(n, int(stop))
    if stop <= start:
        return np.empty((0, dim), dtype=dt)
    record = 4 + dim * dt.itemsize
    mm = np.memmap(path, dtype=np.uint8, mode="r",
                   offset=start * record, shape=((stop - start) * record,))
    rows = np.asarray(mm).reshape(stop - start, record)[:, 4:].copy()
    del mm
    return rows.view(dt).reshape(stop - start, dim)


def process_row_range(n: int, num_shards: int, index: int) -> Tuple[int, int]:
    """Contiguous balanced row range for shard ``index`` of ``num_shards``
    — identical split to ``np.array_split`` (ShardedEngine.fit uses
    array_split, so file-fed and array-fed shards line up row-for-row)."""
    base, extra = divmod(n, num_shards)
    start = index * base + min(index, extra)
    return start, start + base + (1 if index < extra else 0)


def load_vecs_global(path: str, mesh, axis: str = "db",
                     dtype: Optional[np.dtype] = None):
    """Row-sharded global ``jax.Array`` of a vecs file over ``mesh[axis]``.

    Every *process* reads only the row range covered by its addressable
    devices (over DCN-attached storage on a pod), then the global array is
    assembled with ``jax.make_array_from_process_local_data`` — XLA never
    moves the data again; searches shard-map straight over it. Rows are
    zero-padded to a multiple of the axis size; returns ``(array, n_rows)``.
    """
    import jax
    import jax.numpy as jnp  # noqa: F401  (backend init before device_put)
    from jax.sharding import NamedSharding, PartitionSpec

    dt = _vecs_dtype(path, dtype)
    n, dim = probe_vecs(path, dt)
    nsh = mesh.shape[axis]
    pad_n = -(-n // nsh) * nsh
    sharding = NamedSharding(mesh, PartitionSpec(axis, None))
    # this process owns the row blocks of its addressable mesh slots
    pid, nproc = jax.process_index(), jax.process_count()
    lo, hi = process_row_range(pad_n, nproc, pid)
    local = np.zeros((hi - lo, dim), dtype=dt)
    got = load_vecs_rows(path, lo, min(hi, n), dtype=dt)
    local[: got.shape[0]] = got
    arr = jax.make_array_from_process_local_data(sharding, local,
                                                 global_shape=(pad_n, dim))
    return arr, n


def fit_shards_from_file(engine, path: str,
                         dtype: Optional[np.dtype] = None,
                         ef_construction: Optional[int] = None) -> None:
    """Fit a ``ShardedEngine`` with each shard reading its own row range
    from disk — peak host memory is one shard's slice, and on a pod each
    host only fits (and only reads) its own shards."""
    dt = _vecs_dtype(path, dtype)
    n, _dim = probe_vecs(path, dt)
    ndb = engine.ndb
    if n < ndb:
        raise ValueError(f"fit of {n} vectors cannot fill db_shards={ndb}")
    if n > ndb * engine.per_cap:
        raise RuntimeError(
            f"file has {n} rows > capacity {ndb * engine.per_cap}")
    from .engine_sharded import _GidMap

    engine._gid_map = _GidMap(n)
    engine._l2g = [np.full(0, -1, np.int64) for _ in range(ndb)]
    off = 0
    for s in range(ndb):
        lo, hi = process_row_range(n, ndb, s)
        rows = load_vecs_rows(path, lo, hi, dtype=dt).astype(
            np.float32, copy=False)
        engine.shards[s].fit(rows, ef_construction=ef_construction)
        engine._register_fit_chunk(s, rows.shape[0], off)
        off += rows.shape[0]
    engine._next_gid = n
    engine._fitted = True
    engine._leaves = None
