"""Native (C++) token-stream loader with a bit-identical NumPy fallback.

``TokenFileLoader`` streams deterministic pseudo-random [batch, seq_len+1]
int32 windows from a binary token file for LM training (inputs [:, :-1],
targets [:, 1:]). On the native path, an mmap + worker-thread C++ library
(np_modeling_tpu/native/dataloader.cc, compiled on first use with g++ and
loaded via ctypes — no pybind needed) assembles batches off the Python GIL
so input prep overlaps the train step. If no compiler is available the
pure-NumPy fallback produces BIT-IDENTICAL batches (same splitmix64 window
sequence; tested).

The reference framework has no input pipeline at all (full-batch only,
/root/reference/train.py:20-39); this is the production-serving analogue
for the host side.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "dataloader.cc")
_LIB = None
_LIB_ERR = None


def _build_library() -> str:
    """Compile dataloader.cc into a cached .so; returns its path."""
    cache = os.path.join(tempfile.gettempdir(),
                         f"npm_tpu_native_{os.getuid()}")
    os.makedirs(cache, exist_ok=True)
    src_mtime = int(os.path.getmtime(_SRC))
    so_path = os.path.join(cache, f"dataloader_{src_mtime}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, so_path)
    return so_path


def _load_library():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    try:
        lib = ctypes.CDLL(_build_library())
        lib.dl_open.restype = ctypes.c_void_p
        lib.dl_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_uint64,
                                ctypes.c_int, ctypes.c_int]
        lib.dl_next.restype = ctypes.c_int
        lib.dl_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int32)]
        lib.dl_num_tokens.restype = ctypes.c_int64
        lib.dl_num_tokens.argtypes = [ctypes.c_void_p]
        lib.dl_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception as e:                     # no g++ / sandboxed build
        _LIB_ERR = e
        _LIB = None
    return _LIB


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the exact mixer in dataloader.cc."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30)))
         * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27)))
         * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


class TokenFileLoader:
    """Deterministic random-window batches from an int32 token file.

    ``native=None`` (default) uses the C++ loader when it builds, else the
    NumPy fallback; True/False force one side (True raises if unavailable).
    Iteration is infinite; batches are identical across backends.
    """

    def __init__(self, path: str, seq_len: int, batch: int, *,
                 seed: int = 0, n_threads: int = 2, prefetch: int = 4,
                 native: bool | None = None):
        self.path, self.seq_len, self.batch = path, seq_len, batch
        self.seed = seed
        self._index = 0
        lib = _load_library() if native in (None, True) else None
        if native is True and lib is None:
            raise RuntimeError(f"native loader unavailable: {_LIB_ERR}")
        self._lib = lib
        if lib is not None:
            self._handle = lib.dl_open(path.encode(), seq_len, batch,
                                       ctypes.c_uint64(seed), n_threads,
                                       prefetch)
            if not self._handle:
                raise OSError(f"dl_open failed for {path}")
            self.n_tokens = lib.dl_num_tokens(self._handle)
        else:
            self._tokens = np.memmap(path, dtype=np.int32, mode="r")
            self.n_tokens = len(self._tokens)
            if self.n_tokens < seq_len + 1:
                raise OSError(f"{path}: fewer than seq_len+1 tokens")

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty((self.batch, self.seq_len + 1), np.int32)
        if self._lib is not None:
            rc = self._lib.dl_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if rc != 0:
                raise StopIteration
        else:
            window = self.seq_len + 1
            n_windows = self.n_tokens - window + 1
            idx = (np.uint64(self.seed)
                   ^ np.arange(self._index * self.batch,
                               (self._index + 1) * self.batch,
                               dtype=np.uint64))
            starts = _splitmix64(idx) % np.uint64(n_windows)
            for i, s in enumerate(starts):
                out[i] = self._tokens[int(s):int(s) + window]
        self._index += 1
        return out

    def close(self) -> None:
        if self._lib is not None and self._handle:
            self._lib.dl_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
