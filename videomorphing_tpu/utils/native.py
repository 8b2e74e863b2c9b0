"""ctypes bindings to the native (C++) host streaming runtime.

``native/libvmio.so`` provides the mmap + worker-thread prefetch ring for
.vmc frame stores (SURVEY.md section 3 "Video I/O"; BASELINE.json config 5
"streaming decode"). Falls back gracefully: importers catch ImportError and
use the pure-NumPy path in io/clips.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libvmio.so"))

_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
    """Build libvmio.so if missing; returns True when the library exists."""
    if os.path.exists(_LIB_PATH):
        return True
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


def load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        raise ImportError("native libvmio.so not available (build failed)")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vmio_open.restype = ctypes.c_void_p
    lib.vmio_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.vmio_info.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int)] * 5
    lib.vmio_next.restype = ctypes.c_int
    lib.vmio_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vmio_close.argtypes = [ctypes.c_void_p]
    lib.vmio_u8_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
    ]
    _lib = lib
    return lib


class VmcStream:
    """Iterator of ``(start_frame, float32 block (K,H,W,C))`` backed by the
    native prefetching ring buffer."""

    def __init__(self, path: str, block: int = 8, n_threads: int = 4):
        self._lib = load_lib()
        self._h = self._lib.vmio_open(path.encode(), block, n_threads)
        if not self._h:
            raise IOError(f"vmio_open failed for {path}")
        t = ctypes.c_int()
        hh = ctypes.c_int()
        ww = ctypes.c_int()
        cc = ctypes.c_int()
        bb = ctypes.c_int()
        self._lib.vmio_info(self._h, t, hh, ww, cc, bb)
        self.shape: Tuple[int, int, int, int] = (t.value, hh.value, ww.value, cc.value)
        self.block = bb.value

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        _t, h, w, c = self.shape
        buf = np.empty((self.block, h, w, c), np.float32)
        start = ctypes.c_int()
        while True:
            n = self._lib.vmio_next(
                self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), start
            )
            if n == 0:
                break
            yield start.value, buf[:n].copy()

    def close(self) -> None:
        if self._h:
            self._lib.vmio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def u8_to_f32(arr: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """Native row-parallel uint8 -> float32 [0,1] conversion."""
    lib = load_lib()
    src = np.ascontiguousarray(arr)
    out = np.empty(src.shape, np.float32)
    lib.vmio_u8_to_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.size,
        n_threads,
    )
    return out
