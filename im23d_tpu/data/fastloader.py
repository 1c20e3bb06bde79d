"""ctypes bindings for the native npz decoder pool (native/fastloader.cpp).

Multithreaded zip+deflate+npy decoding outside the GIL, with a prefetch
window.  Falls back to numpy when the shared library is absent (build it
with ``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import io
import os
from typing import Sequence

import numpy as np

_LIB = None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "_fastloader.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.fl_create_pool.restype = ctypes.c_void_p
    lib.fl_create_pool.argtypes = [ctypes.c_int]
    lib.fl_destroy_pool.argtypes = [ctypes.c_void_p]
    lib.fl_submit.restype = ctypes.c_longlong
    lib.fl_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fl_wait.restype = ctypes.c_void_p
    lib.fl_wait.argtypes = [ctypes.c_void_p, ctypes.c_longlong]
    lib.fl_result_blob_size.restype = ctypes.c_longlong
    lib.fl_result_blob_size.argtypes = [ctypes.c_void_p]
    lib.fl_result_blob.restype = ctypes.c_void_p
    lib.fl_result_blob.argtypes = [ctypes.c_void_p]
    lib.fl_result_index.restype = ctypes.c_char_p
    lib.fl_result_index.argtypes = [ctypes.c_void_p]
    lib.fl_free_result.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def _parse_npy(raw: bytes):
    """Raw .npy bytes -> numpy array (handles pickled object arrays too)."""
    return np.load(io.BytesIO(raw), allow_pickle=True)


class NpzPool:
    """Thread-pool npz reader: submit paths, collect dict-of-arrays."""

    def __init__(self, n_threads: int = 4):
        self._lib = _load_lib()
        self._pool = (
            self._lib.fl_create_pool(n_threads) if self._lib is not None else None
        )

    def __del__(self):
        if getattr(self, "_pool", None):
            self._lib.fl_destroy_pool(self._pool)
            self._pool = None

    def submit(self, path: str) -> int:
        if self._pool is None:
            return -1
        return int(self._lib.fl_submit(self._pool, path.encode()))

    def get(self, ticket: int, path: str | None = None) -> dict:
        """Collect a submitted npz as {entry_name: array}."""
        if self._pool is None:
            assert path is not None
            data = np.load(path, allow_pickle=True)
            return {k: data[k] for k in data.files}
        res = self._lib.fl_wait(self._pool, ticket)
        if not res:
            # corrupted / unsupported: numpy fallback
            assert path is not None
            data = np.load(path, allow_pickle=True)
            return {k: data[k] for k in data.files}
        try:
            size = self._lib.fl_result_blob_size(res)
            blob_ptr = self._lib.fl_result_blob(res)
            blob = ctypes.string_at(blob_ptr, size)
            index = self._lib.fl_result_index(res).decode()
        finally:
            self._lib.fl_free_result(res)
        out = {}
        for line in index.strip().splitlines():
            name, off, sz = line.split("\t")
            arr = _parse_npy(blob[int(off) : int(off) + int(sz)])
            key = name[:-4] if name.endswith(".npy") else name
            out[key] = arr
        return out

    def load_many(self, paths: Sequence[str]) -> list[dict]:
        """Decode a batch of npz files concurrently."""
        tickets = [self.submit(p) for p in paths]
        return [self.get(t, p) for t, p in zip(tickets, paths)]
