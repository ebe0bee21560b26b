"""Debug utilities: matrix printing and env-gated trace mode.

The reference's CPU oracle doubles as a golden-trace debugger -- printf of
every panel, reflector, and tau (qr.c:88-90,153-156,238-251) -- and ships a
__host__ __device__ printMat (qr.cu:35-47).  Equivalents here:

  * ``print_mat``: column-major-style aligned matrix print (host side).
  * ``trace_print``: jax.debug.print gated on CUDA_QR_TRACE=1 -- usable
    inside jitted code, including the panel scan body, with zero cost when
    the flag is off (the call is simply not traced in).
  * ``assert_finite``: checkify-free NaN/inf guard for tests and drivers.

Race detection has no TPU analog (XLA/Pallas are data-race-free by
construction, SURVEY.md S5); the corresponding debugging mode here is
Pallas interpreter execution, enabled via QRConfig(interpret=True).
"""

from __future__ import annotations

import os

import jax
import numpy as np


def trace_enabled() -> bool:
    return os.environ.get("CUDA_QR_TRACE", "0") == "1"


def print_mat(A, name: str = "", max_dim: int = 16) -> None:
    """Aligned print of a (possibly truncated) matrix (printMat analog)."""
    A = np.asarray(A)
    if name:
        print(f"{name} ({A.shape[0]}x{A.shape[1]}):")
    r, c = min(A.shape[0], max_dim), min(A.shape[1], max_dim)
    for i in range(r):
        print(" ".join(f"{A[i, j]:9f}" for j in range(c))
              + (" ..." if c < A.shape[1] else ""))
    if r < A.shape[0]:
        print("...")


def trace_print(fmt: str, *args) -> None:
    """jax.debug.print when CUDA_QR_TRACE=1; no-op (untraced) otherwise."""
    if trace_enabled():
        jax.debug.print(fmt, *args)


def assert_finite(x, what: str = "array") -> None:
    """Host-side finiteness check with a structured error."""
    from .errors import QRNumericalError
    arr = np.asarray(x)
    if not np.all(np.isfinite(arr)):
        bad = int(np.sum(~np.isfinite(arr)))
        raise QRNumericalError(
            f"{what}: {bad}/{arr.size} non-finite entries "
            f"(first at {tuple(np.argwhere(~np.isfinite(arr))[0])})")
