"""ctypes bindings for the native host runtime (alaya_native.cpp).

Builds the shared library on first use (g++ -O3); everything degrades to
pure-Python fallbacks if no compiler is available, so the package never hard
-requires the native path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger("alayalite_tpu")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libalaya_native.so")
_SRC = os.path.join(_HERE, "alaya_native.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception as e:
        log.warning("native build failed (%s); using python fallbacks", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _SO if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC) else _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.al_vecs_probe.restype = ctypes.c_int
        lib.al_vecs_probe.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      ctypes.POINTER(ctypes.c_int64),
                                      ctypes.POINTER(ctypes.c_int64)]
        lib.al_vecs_load.restype = ctypes.c_int
        lib.al_vecs_load.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_int64, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int]
        lib.al_bq_create.restype = ctypes.c_void_p
        lib.al_bq_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int64]
        lib.al_bq_push.restype = ctypes.c_int
        lib.al_bq_push.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p]
        lib.al_bq_pop_batch.restype = ctypes.c_int
        lib.al_bq_pop_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_void_p]
        lib.al_bq_size.restype = ctypes.c_int
        lib.al_bq_size.argtypes = [ctypes.c_void_p]
        lib.al_bq_close.argtypes = [ctypes.c_void_p]
        lib.al_bq_destroy.argtypes = [ctypes.c_void_p]
        lib.al_arena_create.restype = ctypes.c_void_p
        lib.al_arena_alloc.restype = ctypes.c_void_p
        lib.al_arena_alloc.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                       ctypes.c_int64]
        lib.al_arena_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


_DTYPES = {4: np.float32}


def load_vecs_native(path: str, dtype=np.float32,
                     threads: int = 8) -> Optional[np.ndarray]:
    """mmap + parallel header-strip load of an (f|i|b)vecs file.
    Returns None if the native library is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    elem = np.dtype(dtype).itemsize
    n = ctypes.c_int64()
    dim = ctypes.c_int64()
    rc = lib.al_vecs_probe(path.encode(), elem, ctypes.byref(n),
                           ctypes.byref(dim))
    if rc != 0:
        raise ValueError(f"corrupt or unreadable vecs file {path} (rc={rc})")
    if n.value == 0:
        return np.empty((0, 0), dtype=dtype)
    out = np.empty((n.value, dim.value), dtype=dtype)
    rc = lib.al_vecs_load(path.encode(), elem, n.value, dim.value,
                          out.ctypes.data_as(ctypes.c_void_p), threads)
    if rc != 0:
        raise IOError(f"failed to load {path} (rc={rc})")
    return out


class BatchQueue:
    """Concurrent query coalescer (the Scheduler/Worker replacement for the
    serving path): producers push single queries from any thread; one
    dispatcher pops padded batches for the jitted search step."""

    def __init__(self, dim: int, capacity: int = 8192, max_batch: int = 1024,
                 timeout_us: int = 2000):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.dim = dim
        self.max_batch = max_batch
        self._q = lib.al_bq_create(capacity, dim, max_batch, timeout_us)
        self._out = np.empty((max_batch, dim), dtype=np.float32)
        self._tickets = np.empty(max_batch, dtype=np.int64)

    def push(self, ticket: int, vec: np.ndarray) -> None:
        v = np.ascontiguousarray(vec, dtype=np.float32)
        if v.shape != (self.dim,):
            # al_bq_push memcpy's dim*4 bytes from this buffer — a shorter
            # vector would be an out-of-bounds read in the native queue
            raise ValueError(
                f"query dimension mismatch: got shape {v.shape}, "
                f"expected ({self.dim},)")
        rc = self._lib.al_bq_push(self._q, ticket,
                                  v.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise RuntimeError("queue closed")

    def pop_batch(self):
        """Blocks for work; returns (queries [b, dim] f32 copy, tickets [b])
        or (None, None) when closed and drained."""
        n = self._lib.al_bq_pop_batch(
            self._q, self._out.ctypes.data_as(ctypes.c_void_p),
            self._tickets.ctypes.data_as(ctypes.c_void_p))
        if n == 0:
            return None, None
        return self._out[:n].copy(), self._tickets[:n].copy()

    def size(self) -> int:
        return self._lib.al_bq_size(self._q)

    def close(self) -> None:
        self._lib.al_bq_close(self._q)

    def __del__(self):
        try:
            self._lib.al_bq_close(self._q)
            self._lib.al_bq_destroy(self._q)
        except Exception:
            pass
