"""Least-squares solve via QR: min ||Ax - b||_2 (BASELINE config 4).

Pipeline: blocked factorization (qr_blocked) -> Q^T b without forming Q
(ormqr, the production replacement for the reference's verification-only
explicitQR path, qr.cu:582-686) -> back-substitution R x = (Q^T b)[:n].
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..ops.blocked import extract_r, ormqr, qr_blocked
from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.hostio import to_device


class LstsqResult(NamedTuple):
    x: jnp.ndarray           # (n,) or (n, k) solution
    residual_norm: jnp.ndarray  # ||Ax - b||_2 per rhs (from the Q^T b tail)


def lstsq(A: jnp.ndarray, b: jnp.ndarray,
          config: QRConfig = DEFAULT_CONFIG) -> LstsqResult:
    """Solve min_x ||A x - b|| for m >= n full-rank A; b is (m,) or (m, k).

    The residual norm comes for free as ||(Q^T b)[n:]|| -- no extra GEMM.
    """
    # Route host inputs through to_device BEFORE jit's own device_put:
    # complex numpy operands must not cross the tunnel raw (utils/hostio.py).
    return _lstsq_jit(to_device(A), to_device(b), config)


@partial(jax.jit, static_argnames=("config",))
def _lstsq_jit(A: jnp.ndarray, b: jnp.ndarray,
               config: QRConfig = DEFAULT_CONFIG) -> LstsqResult:
    m, n = A.shape
    if m < n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"lstsq requires m >= n, got {m}x{n}")
    vec = b.ndim == 1
    B = b[:, None] if vec else b

    fac = qr_blocked(A, config)
    B = B.astype(fac.packed.dtype)  # follows A for complex inputs
    QtB = ormqr(fac, jnp.pad(B, ((0, fac.packed.shape[0] - m), (0, 0))),
                transpose=True, config=config)
    R = extract_r(fac, n)
    x = jsl.solve_triangular(R, QtB[:n], lower=False)
    resid = jnp.linalg.norm(QtB[n:m], axis=0)
    if vec:
        x, resid = x[:, 0], resid[0]
    return LstsqResult(x=x, residual_norm=resid)


def solve(A: jnp.ndarray, b: jnp.ndarray,
          config: QRConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Solve the square system A x = b via QR (backward-stable alternative
    to LU for moderately-sized dense systems)."""
    m, n = A.shape
    if m != n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"solve requires square A, got {m}x{n}")
    return lstsq(A, b, config).x
