"""ctypes bindings for the native host-side loader (loader.cpp).

Lazy build-on-first-use with a pure-numpy fallback, so the package works
before/without the toolchain. `available()` reports whether the shared
library could be built/loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libinsmos_loader.so")
_SRC = os.path.join(_DIR, "loader.cpp")

_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC,
        "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.load_scan_transformed.restype = ctypes.c_int
        lib.load_scan_transformed.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.range_mask_xy.restype = ctypes.c_int
        lib.load_window.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_scan_transformed(path: str, tf: np.ndarray, cap: int):
    """Read + pose-align one scan into a (cap, 4) buffer; returns (buf, n).

    Falls back to numpy when the native library is unavailable.
    """
    lib = _load()
    tf = np.ascontiguousarray(tf, dtype=np.float32).reshape(16)
    out = np.zeros((cap, 4), np.float32)
    if lib is not None:
        n = lib.load_scan_transformed(
            path.encode(),
            tf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap,
        )
        if n >= 0:
            return out, int(n)
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:cap]
    m = tf.reshape(4, 4)
    out[: len(pts), :3] = pts[:, :3] @ m[:3, :3].T + m[:3, 3]
    out[: len(pts), 3] = pts[:, 3]
    return out, len(pts)


def load_window(paths: list[str], tfs: np.ndarray, cap: int):
    """Parallel whole-window load: returns ((W, cap, 4) buffer, (W,) counts)."""
    lib = _load()
    W = len(paths)
    tfs = np.ascontiguousarray(tfs, dtype=np.float32).reshape(W, 16)
    out = np.zeros((W, cap, 4), np.float32)
    counts = np.zeros(W, np.int32)
    if lib is not None:
        arr = (ctypes.c_char_p * W)(*[p.encode() for p in paths])
        lib.load_window(
            arr,
            W,
            tfs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            cap,
        )
        if (counts >= 0).all():
            return out, counts
    for i, p in enumerate(paths):
        out[i], counts[i] = load_scan_transformed(p, tfs[i], cap)
    return out, counts
