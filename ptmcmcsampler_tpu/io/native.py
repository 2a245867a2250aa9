"""ctypes bindings for the native chain-file formatter (csrc/chainio.cpp).

The reference spends its I/O time in Python %-formatting of %22.22f rows
(PTMCMCSampler.py:741-745); at high sample rates that becomes a real
bottleneck for the host thread that drains device buffers. The C++ formatter
is ~30x faster. Falls back silently to the numpy path when the shared library
hasn't been built (build with `make native` or
`python -m ptmcmcsampler_tpu.io.build_native`).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "csrc", "libchainio.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.isfile(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ptmcmc_format_rows.restype = ctypes.c_longlong
        lib.ptmcmc_format_rows.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # params [n, ndim]
            ctypes.POINTER(ctypes.c_double),  # lnprob [n]
            ctypes.POINTER(ctypes.c_double),  # lnlike [n]
            ctypes.POINTER(ctypes.c_double),  # accept [n]
            ctypes.POINTER(ctypes.c_double),  # pt_accept [n]
            ctypes.c_longlong,  # n
            ctypes.c_longlong,  # ndim
            ctypes.c_char_p,  # out buffer
            ctypes.c_longlong,  # out capacity
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def format_rows_native(params, lnprob, lnlike, accept_rate, pt_accept_rate):
    """Return the formatted text, or None if the native library is absent."""
    lib = _load()
    if lib is None:
        return None
    params = np.ascontiguousarray(params, dtype=np.float64)
    n, ndim = params.shape
    lnprob = np.ascontiguousarray(np.broadcast_to(lnprob, (n,)), dtype=np.float64)
    lnlike = np.ascontiguousarray(np.broadcast_to(lnlike, (n,)), dtype=np.float64)
    acc = np.ascontiguousarray(np.broadcast_to(accept_rate, (n,)), dtype=np.float64)
    pt = np.ascontiguousarray(np.broadcast_to(pt_accept_rate, (n,)), dtype=np.float64)
    # %22.22f of values up to ~1e3 is < 48 chars; headroom for big magnitudes.
    cap = int(n * (ndim * 352 + 4 * 64 + 16)) + 64
    buf = ctypes.create_string_buffer(cap)
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))  # noqa: E731
    written = lib.ptmcmc_format_rows(
        dptr(params), dptr(lnprob), dptr(lnlike), dptr(acc), dptr(pt), n, ndim, buf, cap
    )
    if written < 0:
        return None
    return buf.raw[:written].decode("ascii")
