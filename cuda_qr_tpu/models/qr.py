"""High-level QR API: the library's flagship "model".

``qr(A)`` is the user-facing entry point (the role of the reference's
``mmqr`` host call, qr.cu:475) returning either explicit thin (Q, R) or the
packed factor object for later orgqr/ormqr/solve use.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.blocked import PackedQR, extract_r, orgqr, ormqr, qr_blocked
from ..utils.config import DEFAULT_CONFIG, QRConfig


class QRResult:
    """Factorization handle: lazy Q/R extraction over packed factors."""

    def __init__(self, factors: PackedQR, m: int, n: int, config: QRConfig):
        self.factors = factors
        self.m, self.n = m, n
        self.config = config

    @property
    def Q(self) -> jnp.ndarray:
        return orgqr(self.factors, self.m, self.n, self.config)

    @property
    def R(self) -> jnp.ndarray:
        return extract_r(self.factors, self.n)

    def apply_qt(self, B: jnp.ndarray) -> jnp.ndarray:
        return ormqr(self.factors, B, transpose=True, config=self.config)

    def apply_q(self, B: jnp.ndarray) -> jnp.ndarray:
        return ormqr(self.factors, B, transpose=False, config=self.config)


def qr_factor(A, config: QRConfig = DEFAULT_CONFIG) -> QRResult:
    A = jnp.asarray(A)
    m, n = A.shape
    return QRResult(qr_blocked(A, config), m, n, config)


def qr(A, config: QRConfig = DEFAULT_CONFIG, mode: str = "reduced"):
    """Thin QR: returns (Q (m x n), R (n x n)); mode='r' returns R only."""
    res = qr_factor(A, config)
    if mode == "r":
        return res.R
    return res.Q, res.R
