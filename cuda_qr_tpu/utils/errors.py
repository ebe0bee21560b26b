"""Structured errors.

The reference's entire error-handling story is an exit(1) macro
(HANDLE_ERROR, qr.cu:467-471) plus silent corruption on misaligned sizes
(SURVEY.md S4).  Here shape/alignment problems raise typed exceptions with
actionable messages, and numerical breakdown inside jitted code degrades
gracefully (tau=0 identity reflectors for zero columns; lax.cond fallback
from CholeskyQR2 to Householder) rather than producing NaN.
"""

from __future__ import annotations


class QRError(Exception):
    """Base class for cuda_qr_tpu errors."""


class QRShapeError(QRError, ValueError):
    """Invalid or incompatible matrix/mesh shapes."""


class QRNumericalError(QRError, ArithmeticError):
    """Non-finite values or numerical breakdown detected."""
