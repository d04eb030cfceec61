"""Vector file IO: fvecs/ivecs/bvecs loaders + md5.

Behavioral parity with /root/reference/python/src/alayalite/utils.py:27-76 and
include/utils/io_utils.hpp:40-80 (each record: int32 dim header followed by
``dim`` payload elements). Pure numpy — runs on host, feeding device arrays.
"""

from __future__ import annotations

import hashlib
import os
from typing import Union

import numpy as np


def _load_vecs(path: Union[str, os.PathLike], dtype: np.dtype) -> np.ndarray:
    data = np.fromfile(path, dtype=np.uint8)
    if data.size == 0:
        return np.empty((0, 0), dtype=dtype)
    dim = int(np.frombuffer(data[:4].tobytes(), dtype=np.int32)[0])
    itemsize = np.dtype(dtype).itemsize
    record = 4 + dim * itemsize
    if data.size % record != 0:
        raise ValueError(f"corrupt vecs file {path}: size {data.size} not a multiple of record {record}")
    n = data.size // record
    mat = data.reshape(n, record)[:, 4:].copy()
    return mat.view(dtype).reshape(n, dim)


def load_fvecs(path: Union[str, os.PathLike]) -> np.ndarray:
    try:  # native mmap+parallel-strip loader when the toolchain exists
        from ..native import load_vecs_native

        out = load_vecs_native(str(path))
        if out is not None:
            return out
    except ValueError:
        raise
    except Exception:
        pass
    return _load_vecs(path, np.dtype(np.float32))


def load_ivecs(path: Union[str, os.PathLike]) -> np.ndarray:
    return _load_vecs(path, np.dtype(np.int32))


def load_bvecs(path: Union[str, os.PathLike]) -> np.ndarray:
    data = np.fromfile(path, dtype=np.uint8)
    if data.size == 0:
        return np.empty((0, 0), dtype=np.uint8)
    dim = int(np.frombuffer(data[:4].tobytes(), dtype=np.int32)[0])
    record = 4 + dim
    n = data.size // record
    return data.reshape(n, record)[:, 4:].copy()


def save_fvecs(path: Union[str, os.PathLike], mat: np.ndarray) -> None:
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    n, d = mat.shape
    out = np.empty((n, d + 1), dtype=np.int32)
    out[:, 0] = d
    out[:, 1:] = mat.view(np.int32)
    out.tofile(path)


def save_ivecs(path: Union[str, os.PathLike], mat: np.ndarray) -> None:
    mat = np.ascontiguousarray(mat, dtype=np.int32)
    n, d = mat.shape
    out = np.empty((n, d + 1), dtype=np.int32)
    out[:, 0] = d
    out[:, 1:] = mat
    out.tofile(path)


def md5(path: Union[str, os.PathLike], chunk_size: int = 1 << 20) -> str:
    """md5 of a file (reference: utils.py:108-115)."""
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            chunk = f.read(chunk_size)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()
