"""Native fast COO text I/O (ctypes binding to native/fastcoo.cpp).

Builds the shared library on first use with the system g++ (cached under
native/build/); every call falls back to the numpy implementation when the
toolchain or library is unavailable, so the pipeline never hard-depends on the
native path. Format stays byte-compatible with the reference's txt caches.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["load_coo_txt", "save_coo_txt", "native_available"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "fastcoo.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libfastcoo.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            # a prebuilt .so without the source tree is fine — only rebuild
            # when the source is present and newer
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.fastcoo_parse.restype = ctypes.c_longlong
            lib.fastcoo_parse.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ]
            lib.fastcoo_write.restype = ctypes.c_int
            lib.fastcoo_write.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_longlong,
                ctypes.c_int,
            ]
            lib.fastcoo_free.restype = None
            lib.fastcoo_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def load_coo_txt(path: str) -> np.ndarray:
    """(n, 3) float64 triplets from a whitespace-separated text file."""
    lib = _load()
    if lib is None:
        arr = np.loadtxt(path)
        return arr.reshape(-1, 3) if arr.size else arr.reshape(0, 3)
    ptr = ctypes.POINTER(ctypes.c_double)()
    n = lib.fastcoo_parse(path.encode(), ctypes.byref(ptr))
    if n < 0:
        raise IOError(f"fastcoo_parse failed for {path}")
    try:
        if n == 0:
            return np.zeros((0, 3))
        arr = np.ctypeslib.as_array(ptr, shape=(int(n), 3)).copy()
    finally:
        if n >= 0:
            lib.fastcoo_free(ptr)
    return arr


def save_coo_txt(path: str, data: np.ndarray, int_value: bool = False):
    """Write (n, 3) triplets as 'a\\tb\\tv' lines (reference txt format)."""
    data = np.ascontiguousarray(data, dtype=np.float64).reshape(-1, 3)
    lib = _load()
    if lib is None:
        fmt = ["%d", "%d", "%d"] if int_value else ["%d", "%d", "%.18g"]
        np.savetxt(path, data, fmt=fmt, delimiter="\t")
        return
    rc = lib.fastcoo_write(
        path.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        data.shape[0],
        1 if int_value else 0,
    )
    if rc != 0:
        raise IOError(f"fastcoo_write failed for {path}")
