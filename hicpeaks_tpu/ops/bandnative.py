"""ctypes bridge to the native band builder (native/bandbuild.cpp).

One threaded C++ pass replaces the numpy fancy-index copies + bincounts
of ops/band.build_bands at genome scale (the dominant host cost in
benchmarks/STAGE_PROFILE_r02.json).  Falls back to None (numpy path) when
the shared library is missing and cannot be built.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_LIB = None
_TRIED = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_f64p = ctypes.POINTER(ctypes.c_double)
_f32p = ctypes.POINTER(ctypes.c_float)


def _load_library():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, 'libbandbuild.so')
    if not os.path.exists(so):
        try:
            subprocess.run(['make', '-C', _NATIVE_DIR, 'libbandbuild.so'],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.band_build.restype = ctypes.c_int64
        lib.band_build.argtypes = [
            _i64p, _i64p, _f64p, ctypes.c_int64,    # bin1, bin2, count, n
            _f64p,                                  # weights
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # L, num, num_p
            ctypes.c_int64, ctypes.c_int64,         # Lp, ww_min
            _f32p, _f64p, _i64p, _f64p,             # raw, csum, nan, colsum
            _i64p, _i64p, _f64p, _f64p,             # dd, b1, cvals, ct
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def band_build_native(bin1, bin2, count, weights, L, num, num_p, Lp, ww_min):
    """-> (raw f32[num_p,Lp], csum f64[num_p], nan_counts i64[num_p],
    colsum f64[Lp], dd, b1, cvals, ct) or None when the native library is
    unavailable.  Semantics match the numpy path of ops/band.build_bands."""
    lib = _load_library()
    if lib is None:
        return None
    bin1 = np.ascontiguousarray(bin1, np.int64)
    bin2 = np.ascontiguousarray(bin2, np.int64)
    count = np.ascontiguousarray(count, np.float64)
    weights = np.ascontiguousarray(weights, np.float64)
    n = bin1.size
    raw = np.zeros((num_p, Lp), np.float32)
    csum = np.zeros(num_p, np.float64)
    nan_counts = np.zeros(num_p, np.int64)
    colsum = np.zeros(Lp, np.float64)
    dd = np.empty(n, np.int64)
    b1 = np.empty(n, np.int64)
    cvals = np.empty(n, np.float64)
    ct = np.empty(n, np.float64)
    m = lib.band_build(
        bin1.ctypes.data_as(_i64p), bin2.ctypes.data_as(_i64p),
        count.ctypes.data_as(_f64p), n, weights.ctypes.data_as(_f64p),
        L, num, num_p, Lp, ww_min,
        raw.ctypes.data_as(_f32p), csum.ctypes.data_as(_f64p),
        nan_counts.ctypes.data_as(_i64p), colsum.ctypes.data_as(_f64p),
        dd.ctypes.data_as(_i64p), b1.ctypes.data_as(_i64p),
        cvals.ctypes.data_as(_f64p), ct.ctypes.data_as(_f64p))
    if m < 0:
        return None
    return raw, csum, nan_counts, colsum, dd[:m], b1[:m], cvals[:m], ct[:m]
