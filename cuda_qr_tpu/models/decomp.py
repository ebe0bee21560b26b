"""Triangular-orthogonal decomposition family derived from QR.

scipy.linalg ships the full family (lq/rq/ql/qr_multiply) on top of one
geqrf core; the reference prototype has only the QR direction
(qr.cu:475-553).  Each variant here is an O(1)-overhead reduction onto the
blocked TPU QR path -- transposes and row/column reversals are free layout
changes under XLA, so every member inherits the MXU-bound kernels, the
numerical guards, and the differentiability of ``qr``.

Conventions match scipy.linalg:
  lq: A = L Q          L (m x k) lower-trapezoidal, Q (k x n) orthonormal rows
  rq: A = R Q          R (m x k) upper-trapezoidal (k = n when m >= n)
  ql: A = Q L          Q (m x k) orthonormal cols,  L (k x n) lower
with k = min(m, n) in economic ("reduced") mode.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.hostio import to_device
from .qr import qr, qr_factor


def _ct(A):
    """Conjugate transpose (plain transpose for real dtypes)."""
    return A.conj().T if jnp.iscomplexobj(A) else A.T


def lq(A, config: QRConfig = DEFAULT_CONFIG, mode: str = "reduced"):
    """LQ decomposition: A = L @ Q with Q's rows orthonormal.

    Computed as the conjugate transpose of qr(A^H): A^H = Q~ R~ implies
    A = R~^H Q~^H.  mode='reduced' gives L (m x k), Q (k x n); mode='l'
    returns L only; mode='complete' gives Q (n x n), L (m x n).
    """
    A = to_device(A)
    if mode == "l":
        Rt = qr(_ct(A), config, mode="r")
        return _ct(Rt)
    qmode = "complete" if mode == "complete" else "reduced"
    Qt, Rt = qr(_ct(A), config, mode=qmode)
    return _ct(Rt), _ct(Qt)


def rq(A, config: QRConfig = DEFAULT_CONFIG, mode: str = "reduced"):
    """RQ decomposition: A = R @ Q with Q's rows orthonormal, R upper.

    Row/column-reversal reduction: with J the exchange matrix,
    (J_m A)^H = Q~ R~  =>  A = (J R~^H J)(J Q~^H), and J L J of a
    lower-triangular factor is upper-triangular.  mode='r' returns R only;
    mode='complete' gives R (m x n), Q (n x n).
    """
    A = to_device(A)
    B = _ct(A[::-1, :])  # (J_m A)^H, n x m
    if mode == "r":
        Rt = qr(B, config, mode="r")
        return _ct(Rt)[::-1, ::-1]
    qmode = "complete" if mode == "complete" else "reduced"
    Qt, Rt = qr(B, config, mode=qmode)
    R = _ct(Rt)[::-1, ::-1]  # J R~^H J: upper-trapezoidal (m x k)
    Q = _ct(Qt)[::-1, :]     # J Q~^H: orthonormal rows (k x n)
    return R, Q


def ql(A, config: QRConfig = DEFAULT_CONFIG, mode: str = "reduced"):
    """QL decomposition: A = Q @ L with Q's columns orthonormal, L lower.

    Column/row-reversal reduction: A J_n = Q~ R~ implies
    A = (Q~ J)(J R~ J) with J R~ J lower-triangular.  mode='l' returns L
    only; mode='complete' gives Q (m x m), L (m x n).
    """
    A = to_device(A)
    B = A[:, ::-1]  # A J_n
    if mode == "l":
        Rt = qr(B, config, mode="r")
        return Rt[::-1, ::-1]
    qmode = "complete" if mode == "complete" else "reduced"
    Qt, Rt = qr(B, config, mode=qmode)
    return Qt[:, ::-1], Rt[::-1, ::-1]


def qr_multiply(A, C, mode: str = "left", transpose: bool = False,
                config: QRConfig = DEFAULT_CONFIG):
    """Factor A = Q R and multiply C by the thin Q without forming it.

    Returns (QC, R) for mode='left' (C is (k x p); (m x p) out) or
    (CQ, R) for mode='right' (C is (p x m); (p x k) out), k = min(m, n).
    transpose=True applies Q^H instead of Q (then mode='left' takes C
    (m x p) -> (k x p), mode='right' takes C (p x k) -> (p x m)).

    Everything routes through the compact ormqr panel sweep
    (ops/blocked.py) -- three GEMMs per panel, no m x m intermediate --
    the production replacement for the reference's dense per-reflector
    Q-multiply (qr.cu:663-677).
    """
    A, C = to_device(A), to_device(C)
    m, n = A.shape
    k = min(m, n)
    if m < n:  # factor the square left block; R gets the Q^H A2 tail
        res = qr_factor(A[:, :m], config)
        R12 = res.apply_qt(A[:, m:].astype(res.factors.packed.dtype))[:m]
        R = jnp.concatenate([res.R, R12], axis=1)
    else:
        res = qr_factor(A, config)
        R = res.R
    C2 = C if C.ndim == 2 else C[:, None]

    if mode == "left":
        if transpose:
            out = res.apply_qt(C2)[:k]
        else:
            if C2.shape[0] != k:
                from ..utils.errors import QRShapeError
                raise QRShapeError(
                    f"mode='left' expects C with {k} rows, got {C2.shape}")
            out = res.apply_q(jnp.pad(C2, ((0, m - k), (0, 0))))
    elif mode == "right":
        if transpose:
            out = _ct(res.apply_q(jnp.pad(_ct(C2), ((0, m - k), (0, 0)))))
        else:
            out = _ct(res.apply_qt(_ct(C2))[:k])
    else:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"mode must be 'left' or 'right', got {mode!r}")
    if C.ndim == 1:
        out = out[:, 0] if mode == "left" else out[0, :]
    return out, R
