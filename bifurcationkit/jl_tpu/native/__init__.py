"""Native (C++) runtime utilities, loaded via ctypes.

Compiled lazily with g++ on first use (`libbktpu.so` cached next to the
source); every entry point has a pure-Python fallback so the framework works
without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "bktpu_native.cpp")
_LIB = os.path.join(_HERE, "libbktpu.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", _LIB],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.bk_csr_max_row.restype = ctypes.c_int64
        lib.bk_csr_max_row.argtypes = [i64p, ctypes.c_int64]
        lib.bk_csr_to_ell.restype = None
        lib.bk_csr_to_ell.argtypes = [ctypes.c_int64, i64p, i64p, f64p,
                                      ctypes.c_int64, f64p, i32p]
        lib.bk_csr_diagonals.restype = ctypes.c_int64
        lib.bk_csr_diagonals.argtypes = [ctypes.c_int64, i64p, i64p, i64p,
                                         ctypes.c_int64]
        lib.bk_csr_to_dia.restype = None
        lib.bk_csr_to_dia.argtypes = [ctypes.c_int64, i64p, i64p, f64p,
                                      i64p, ctypes.c_int64, f64p]
        lib.bk_log_open.restype = ctypes.c_void_p
        lib.bk_log_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.bk_log_append.restype = ctypes.c_int
        lib.bk_log_append.argtypes = [ctypes.c_void_p, ctypes.c_int64, f64p]
        lib.bk_log_close.restype = None
        lib.bk_log_close.argtypes = [ctypes.c_void_p]
        lib.bk_log_read.restype = ctypes.c_int64
        lib.bk_log_read.argtypes = [ctypes.c_char_p, ctypes.c_int64, i64p,
                                    f64p, ctypes.c_int64]
        _lib = lib
    except Exception as e:  # pragma: no cover
        warnings.warn(f"native library unavailable ({e}); using Python "
                      "fallbacks")
        _lib = None
    return _lib


def _i64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def csr_to_ell_arrays(indptr, indices, data):
    """CSR arrays -> (ell_data (n,k), ell_cols (n,k)); native when possible.
    """
    indptr = _i64(indptr)
    indices = _i64(indices)
    data = np.ascontiguousarray(data, dtype=np.float64)
    n = len(indptr) - 1
    lib = _load()
    if lib is not None:
        k = int(lib.bk_csr_max_row(
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n))
        out_data = np.zeros((n, k))
        out_cols = np.full((n, k), -1, np.int32)
        lib.bk_csr_to_ell(
            n, indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), k,
            out_data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out_cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out_data, out_cols
    # fallback
    k = int(np.diff(indptr).max())
    out_data = np.zeros((n, k))
    out_cols = np.full((n, k), -1, np.int32)
    for i in range(n):
        w = indptr[i + 1] - indptr[i]
        out_data[i, :w] = data[indptr[i]:indptr[i + 1]]
        out_cols[i, :w] = indices[indptr[i]:indptr[i + 1]]
    return out_data, out_cols


def csr_to_dia_arrays(indptr, indices, data):
    """CSR arrays -> (dia_data (ndiags, n), offsets tuple)."""
    indptr = _i64(indptr)
    indices = _i64(indices)
    data = np.ascontiguousarray(data, dtype=np.float64)
    n = len(indptr) - 1
    lib = _load()
    if lib is not None:
        offs = np.zeros(2 * n + 1, np.int64)
        cnt = int(lib.bk_csr_diagonals(
            n, indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            2 * n + 1))
        offs = offs[:cnt]
        out = np.zeros((cnt, n))
        lib.bk_csr_to_dia(
            n, indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), cnt,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out, tuple(int(o) for o in offs)
    # fallback
    offsets = sorted({int(indices[p] - i) for i in range(n)
                      for p in range(indptr[i], indptr[i + 1])})
    out = np.zeros((len(offsets), n))
    slot = {o: d for d, o in enumerate(offsets)}
    for i in range(n):
        for p in range(indptr[i], indptr[i + 1]):
            out[slot[int(indices[p] - i)], i] = data[p]
    return out, tuple(offsets)


class BranchLog:
    """Append-only binary continuation log (native streaming writer).

    Record = (step, fixed-size float64 vector); survives crashes (each append
    is flushed) and supports resume via `read`.
    """

    def __init__(self, path: str, n_values: int):
        self.path = path
        self.n_values = n_values
        self._lib = _load()
        if self._lib is not None:
            self._h = self._lib.bk_log_open(path.encode(), n_values)
            if not self._h:
                raise OSError(f"cannot open {path}")
        else:
            self._f = open(path, "ab")

    def append(self, step: int, values):
        values = np.ascontiguousarray(values, dtype=np.float64)
        assert values.size == self.n_values
        if self._lib is not None:
            rc = self._lib.bk_log_append(
                self._h, int(step),
                values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            if rc != 0:
                raise OSError(f"log append failed rc={rc}")
        else:
            np.array([step, self.n_values], np.int64).tofile(self._f)
            values.tofile(self._f)
            self._f.flush()

    def close(self):
        if self._lib is not None and self._h:
            self._lib.bk_log_close(self._h)
            self._h = None
        elif getattr(self, "_f", None):
            self._f.close()
            self._f = None

    @classmethod
    def read(cls, path: str, n_values: int):
        lib = _load()
        if lib is not None:
            # first pass to count
            cnt = int(lib.bk_log_read(path.encode(), n_values,
                                      np.zeros(1, np.int64).ctypes.data_as(
                                          ctypes.POINTER(ctypes.c_int64)),
                                      np.zeros(n_values).ctypes.data_as(
                                          ctypes.POINTER(ctypes.c_double)),
                                      0))
            if cnt < 0:
                raise OSError(f"cannot read {path}")
            steps = np.zeros(cnt, np.int64)
            values = np.zeros((cnt, n_values))
            lib.bk_log_read(path.encode(), n_values,
                            steps.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int64)),
                            values.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_double)), cnt)
            return steps, values
        # fallback
        raw = np.fromfile(path, dtype=np.uint8)
        rec = 16 + 8 * n_values
        cnt = len(raw) // rec
        steps = np.zeros(cnt, np.int64)
        values = np.zeros((cnt, n_values))
        for i in range(cnt):
            chunk = raw[i * rec:(i + 1) * rec]
            steps[i] = np.frombuffer(chunk[:8], np.int64)[0]
            values[i] = np.frombuffer(chunk[16:], np.float64)
        return steps, values
