"""ctypes bindings for the native C++ batch assembler (native/batcher.cc).

Builds the shared library on first use (g++ -O3, cached next to the
source); falls back gracefully — callers check :func:`available` and keep
the pure-numpy path as default.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "batcher.cc")
_SO = os.path.join(os.path.dirname(_SRC), "libbatcher.so")

_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build() -> str | None:
    """Compile the .so if missing/stale; returns an error string or None."""
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   "-o", _SO, _SRC, "-lpthread"]
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=120)
            if proc.returncode != 0:
                return f"build failed: {proc.stderr[-500:]}"
        return None
    except Exception as e:  # g++ missing, fs readonly, ...
        return f"build failed: {e}"


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        err = _build()
        if err:
            _build_error = err
            return
        lib = ctypes.CDLL(_SO)
        lib.assemble_batch.restype = ctypes.c_int
        lib.assemble_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.npy_rows.restype = ctypes.c_int64
        lib.npy_rows.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib = lib


def available() -> bool:
    _load()
    return _lib is not None


def build_error() -> str | None:
    _load()
    return _build_error


def npy_rows(path: str, cols: int) -> int:
    _load()
    assert _lib is not None
    return int(_lib.npy_rows(path.encode(), cols))


def assemble_batch(paths: list[str], t_cap: int, cols: int,
                   num_threads: int = 4) -> tuple[np.ndarray, np.ndarray]:
    """Load ``len(paths)`` f32 [T, cols] .npy files into a zero-padded
    [B, t_cap, cols] batch + true lengths [B] — in parallel, off the GIL."""
    _load()
    assert _lib is not None, _build_error
    n = len(paths)
    batch = np.empty((n, t_cap, cols), np.float32)
    lengths = np.empty((n,), np.int64)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = _lib.assemble_batch(
        c_paths, n,
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        t_cap, cols, num_threads)
    if failures:
        bad = [paths[i] for i in range(n) if lengths[i] < 0]
        raise IOError(f"native batcher failed on {failures} files: {bad[:3]}")
    return batch, lengths.astype(np.int32)
