"""Native host components: AOT C++ decoder engine (ctypes bindings).

The reference's host compute layer is numba-JIT Python (``ldpc.py`` CPU
decoder, ``@jit`` kernels).  This framework's host layer is ahead-of-time
C++ (``minsum.cpp``) built once with g++ into a shared library and loaded
through ctypes (pybind11 is unavailable in this environment; the C ABI +
ctypes is the supported binding path).

Build is lazy and cached next to the sources; ``available()`` reports
whether a toolchain exists so tests can skip gracefully.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

__all__ = ["available", "native_min_sum_decode", "build"]

_DIR = pathlib.Path(__file__).resolve().parent
_SO = _DIR / "libldpc_native.so"
_LIB = None
_BUILD_ERROR: str | None = None


def build(force: bool = False) -> pathlib.Path:
    """Compile minsum.cpp -> libldpc_native.so (cached)."""
    src = _DIR / "minsum.cpp"
    if _SO.exists() and not force and \
            _SO.stat().st_mtime >= src.stat().st_mtime:
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(_SO), str(src)]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _SO


def _lib():
    global _LIB, _BUILD_ERROR
    if _LIB is not None:
        return _LIB
    if _BUILD_ERROR is not None:
        raise RuntimeError(f"native build failed earlier: {_BUILD_ERROR}")
    try:
        so = build()
        lib = ctypes.CDLL(str(so))
    except Exception as e:  # toolchain missing / compile error
        _BUILD_ERROR = str(e)
        raise RuntimeError(f"cannot build native library: {e}") from e
    lib.ldpc_min_sum_decode_batch.restype = None
    lib.ldpc_min_sum_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def _csr(h: np.ndarray):
    m, n = h.shape
    row_ptr = np.zeros(m + 1, np.int32)
    cols = []
    for r in range(m):
        idx = np.flatnonzero(h[r])
        cols.append(idx.astype(np.int32))
        row_ptr[r + 1] = row_ptr[r] + idx.size
    return row_ptr, np.concatenate(cols) if cols else np.zeros(0, np.int32)


def native_min_sum_decode(h: np.ndarray, channel: np.ndarray,
                          max_iters: int = 50):
    """Batch decode with the native engine.

    Same contract as ``ops.oracle.dense_min_sum_decode`` but batched:
    channel [B, n] (or [n]); returns (hard [B, n] int64, soft [B, n]
    float64, iterations [B] int32, success [B] bool).
    """
    lib = _lib()
    h = np.ascontiguousarray(h)
    channel = np.atleast_2d(np.ascontiguousarray(channel, np.float64))
    b, n = channel.shape
    m = h.shape[0]
    row_ptr, col_idx = _csr(h)
    hard = np.zeros((b, n), np.int64)
    soft = np.zeros((b, n), np.float64)
    iters = np.zeros(b, np.int32)
    ok = np.zeros(b, np.int32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.ldpc_min_sum_decode_batch(
        p(channel, ctypes.c_double), b, n, m, p(row_ptr, ctypes.c_int32),
        p(col_idx, ctypes.c_int32), max_iters, p(hard, ctypes.c_int64),
        p(soft, ctypes.c_double), p(iters, ctypes.c_int32),
        p(ok, ctypes.c_int32))
    return hard, soft, iters, ok.astype(bool)
