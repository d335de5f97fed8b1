"""ctypes bindings for the native host kernels (csrc/pgdrome_native.cpp).

Covers the host-runtime niche the reference fills with DOLFIN's C++ core
(SURVEY.md §2.3): assembly scatter-add, tridiagonal solves, FD operator
construction.  The library auto-builds from source on first import when a
compiler is available; every entry point has a numpy fallback, so nothing
breaks without it.  Disable with PGDROME_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


_PKG_DIR = os.path.dirname(os.path.dirname(__file__))  # pgdrome_tpu/


def _lib_path():
    return os.path.join(_PKG_DIR, "_libpgdrome_native.so")


def _src_dir():
    return os.path.join(os.path.dirname(_PKG_DIR), "csrc")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("PGDROME_NATIVE", "1") == "0":
        return None
    path = _lib_path()
    if not os.path.exists(path):
        src = os.path.join(_src_dir(), "pgdrome_native.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", path, src],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        else:
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.scatter_add_dense.argtypes = [f64p, ctypes.c_int64, i64p, i64p, f64p, ctypes.c_int64]
    lib.scatter_add_vector.argtypes = [f64p, i64p, f64p, ctypes.c_int64]
    lib.thomas_solve.argtypes = [f64p, f64p, f64p, f64p, f64p, ctypes.c_int64]
    lib.thomas_solve.restype = ctypes.c_int
    lib.fd_matrices.argtypes = [f64p, ctypes.c_int64, f64p, f64p, f64p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def scatter_add_dense(A: np.ndarray, rows, cols, vals) -> np.ndarray:
    """A[rows, cols] += vals (in place).  Native when available."""
    lib = _load()
    rows = np.ascontiguousarray(rows, dtype=np.int64).ravel()
    cols = np.ascontiguousarray(cols, dtype=np.int64).ravel()
    vals = np.ascontiguousarray(vals, dtype=np.float64).ravel()
    if lib is not None and A.flags["C_CONTIGUOUS"] and A.dtype == np.float64:
        lib.scatter_add_dense(A, A.shape[0], rows, cols, vals, len(vals))
        return A
    np.add.at(A, (rows, cols), vals)
    return A


def scatter_add_vector(b: np.ndarray, idx, vals) -> np.ndarray:
    lib = _load()
    idx = np.ascontiguousarray(idx, dtype=np.int64).ravel()
    vals = np.ascontiguousarray(vals, dtype=np.float64).ravel()
    if lib is not None and b.flags["C_CONTIGUOUS"] and b.dtype == np.float64:
        lib.scatter_add_vector(b, idx, vals, len(vals))
        return b
    np.add.at(b, idx, vals)
    return b


def thomas_solve(dl, d, du, b) -> np.ndarray:
    """Tridiagonal solve (host).  Native Thomas when available, else a
    numpy implementation."""
    dl = np.ascontiguousarray(dl, dtype=np.float64)
    d = np.ascontiguousarray(d, dtype=np.float64)
    du = np.ascontiguousarray(du, dtype=np.float64)
    b = np.ascontiguousarray(b, dtype=np.float64)
    n = len(d)
    lib = _load()
    if lib is not None:
        x = np.empty(n, dtype=np.float64)
        if lib.thomas_solve(dl, d, du, b, x, n) == 0:
            return x
    # numpy fallback
    cp = np.empty(n)
    dp = np.empty(n)
    cp[0] = du[0] / d[0]
    dp[0] = b[0] / d[0]
    for i in range(1, n):
        m = d[i] - dl[i] * cp[i - 1]
        cp[i] = du[i] / m
        dp[i] = (b[i] - dl[i] * dp[i - 1]) / m
    x = np.empty(n)
    x[-1] = dp[-1]
    for i in range(n - 2, -1, -1):
        x[i] = dp[i] - cp[i] * x[i + 1]
    return x


def fd_matrices(xg) -> tuple:
    """Native FD operator builder (same semantics as ops.fd.FD_matrices)."""
    xg = np.ascontiguousarray(xg, dtype=np.float64).ravel()
    n = len(xg)
    lib = _load()
    if lib is None:
        from pgdrome_tpu.ops.fd import FD_matrices

        return FD_matrices(xg)
    M = np.empty((n, n))
    D2 = np.empty((n, n))
    D1 = np.empty((n, n))
    lib.fd_matrices(xg, n, M, D2, D1)
    return M, D2, D1
