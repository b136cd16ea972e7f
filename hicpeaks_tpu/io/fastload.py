"""ctypes bridge to the native TXT parser (native/fastload.cpp).

The reference spends most of its toCooler wall-clock in np.loadtxt
(utilities.py:286; README.rst:287-291).  The native parser mmaps the file
and scans it with one thread per slice; this wrapper builds the shared
library on demand and falls back to numpy when a toolchain is missing.
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


def _load_library():
    global _LIB, _TRIED
    if os.environ.get('HICPEAKS_NO_NATIVE') == '1':
        return None
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, 'libfastload.so')
    if not os.path.exists(so):
        try:
            subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.fastload_count.restype = ctypes.c_int64
        lib.fastload_count.argtypes = [ctypes.c_char_p]
        lib.fastload_parse.restype = ctypes.c_int64
        lib.fastload_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def load_txt(path):
    """-> (bin1 int64[], bin2 int64[], count float64[]) from a 3-column
    text file; native fast path with numpy fallback."""
    lib = _load_library()
    if lib is not None:
        cap = lib.fastload_count(path.encode())
        if cap >= 0:
            b1 = np.empty(cap, np.int64)
            b2 = np.empty(cap, np.int64)
            ct = np.empty(cap, np.float64)
            n = lib.fastload_parse(
                path.encode(),
                b1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                b2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ct.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                cap)
            if n >= 0:
                return b1[:n], b2[:n], ct[:n]
    data = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if data.size == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.float64))
    return (data[:, 0].astype(np.int64), data[:, 1].astype(np.int64),
            data[:, 2].astype(np.float64))
