"""ctypes binding to the native C oracle (auto-builds on first use).

The oracle is the bit-level semantic reference for the sliding-panel MMQR
algorithm (see oracle_impl.h); tests compare the TPU path's factorizations
against it the way the reference compares its GPU kernels against qr.c.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libqroracle.so")


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    if not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < max(
            os.path.getmtime(os.path.join(_DIR, f))
            for f in ("qr_oracle.c", "oracle_impl.h"))):
        subprocess.run(["make", "-C", _DIR, "libqroracle.so"], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO)
    dp = ctypes.POINTER(ctypes.c_double)
    sp = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.mmqr_d.argtypes = [dp, dp, i, i, i, i]
    lib.mmqr_s.argtypes = [sp, sp, i, i, i, i]
    lib.explicit_qr_d.argtypes = [dp, dp, dp, dp, i, i, i, i]
    lib.explicit_qr_s.argtypes = [sp, sp, sp, sp, i, i, i, i]
    lib.qr_check_d.argtypes = [dp, dp, dp, i, i, dp, dp]
    lib.qr_check_s.argtypes = [sp, sp, sp, i, i, dp, dp]
    lib.panel_dims.argtypes = [i, i, i, i, ctypes.POINTER(i), ctypes.POINTER(i)]
    return lib


def _as_fortran(A: np.ndarray, dtype) -> np.ndarray:
    return np.asfortranarray(np.asarray(A, dtype=dtype))


def mmqr(A: np.ndarray, pr: int, pc: int):
    """Sliding-panel QR via the C oracle.  Returns (packed, tau)."""
    lib = _lib()
    dtype = np.float32 if np.asarray(A).dtype == np.float32 else np.float64
    m, n = A.shape
    rp = ctypes.c_int()
    cp = ctypes.c_int()
    lib.panel_dims(m, n, pr, pc, ctypes.byref(rp), ctypes.byref(cp))
    packed = _as_fortran(A, dtype)
    tau = np.zeros(rp.value * cp.value * pc, dtype=dtype)
    fn = lib.mmqr_d if dtype == np.float64 else lib.mmqr_s
    ptr = ctypes.POINTER(ctypes.c_double if dtype == np.float64 else ctypes.c_float)
    rc = fn(packed.ctypes.data_as(ptr), tau.ctypes.data_as(ptr), m, n, pr, pc)
    if rc:
        raise ValueError(
            f"oracle mmqr rejected m={m} n={n} pr={pr} pc={pc} (rc={rc}): "
            "misaligned sizes (the oracle enforces the reference's "
            "alignment precondition instead of corrupting, SURVEY.md S4)")
    return packed, tau


def explicit_qr(packed: np.ndarray, tau: np.ndarray, pr: int, pc: int):
    """Dense Q (m x m), R (m x n) from oracle packed factors."""
    lib = _lib()
    dtype = packed.dtype.type
    m, n = packed.shape
    Q = np.zeros((m, m), dtype=dtype, order="F")
    R = np.zeros((m, n), dtype=dtype, order="F")
    packed = _as_fortran(packed, dtype)
    tau = np.ascontiguousarray(tau, dtype=dtype)
    if dtype == np.float64:
        fn, ct = lib.explicit_qr_d, ctypes.c_double
    else:
        fn, ct = lib.explicit_qr_s, ctypes.c_float
    ptr = ctypes.POINTER(ct)
    fn(packed.ctypes.data_as(ptr), tau.ctypes.data_as(ptr),
       Q.ctypes.data_as(ptr), R.ctypes.data_as(ptr), m, n, pr, pc)
    return Q, R


def qr_check(A: np.ndarray, Q: np.ndarray, R: np.ndarray):
    """(residual, orthogonality) computed natively."""
    lib = _lib()
    dtype = Q.dtype.type
    m, n = A.shape
    resid = ctypes.c_double()
    orth = ctypes.c_double()
    A = _as_fortran(A, dtype)
    Q = _as_fortran(Q, dtype)
    R = _as_fortran(R, dtype)
    if dtype == np.float64:
        fn, ct = lib.qr_check_d, ctypes.c_double
    else:
        fn, ct = lib.qr_check_s, ctypes.c_float
    ptr = ctypes.POINTER(ct)
    fn(A.ctypes.data_as(ptr), Q.ctypes.data_as(ptr), R.ctypes.data_as(ptr),
       m, n, ctypes.byref(resid), ctypes.byref(orth))
    return resid.value, orth.value


def factor_and_check(A: np.ndarray, pr: int, pc: int):
    packed, tau = mmqr(A, pr, pc)
    Q, R = explicit_qr(packed, tau, pr, pc)
    return qr_check(np.asarray(A, dtype=packed.dtype.type), Q, R)
