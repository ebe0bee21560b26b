"""Rank-revealing solvers on top of column-pivoted QR (LAPACK gelsy class).

The reference stops at full-rank factorization; these close the standard
dense-linear-algebra surface a QR library is expected to carry: numerical
rank, minimum-norm rank-deficient least squares via a complete orthogonal
decomposition (COD), pseudoinverse, and null-space basis.

Rank determination is data-dependent, so these entry points are host-side
conveniences (NOT jittable): they run the jitted QRCP kernel
(ops/qrcp.py), fetch the nb-per-panel R diagonal (a tiny transfer), decide
the effective rank r on the host, and then run statically-shaped jitted
algebra for that r.  This mirrors how LAPACK's gelsy itself is structured
(factor, inspect, truncate) and keeps every device computation
static-shape.

COD: A P = Q [R1; 0] with R1 (r x n), then the LQ step R1 = T Z
(via QR of R1^T: R1^T = Z^T_cols T^T) gives A P = Q1 T Z with T (r x r)
lower-triangular and Z (r x n) orthonormal rows; the minimum-norm solution
of min ||Ax - b|| is x = P Z^T T^{-1} Q1^T b.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..ops.blocked import extract_r, orgqr, ormqr
from ..ops.qrcp import qrcp_blocked
from ..utils.config import DEFAULT_CONFIG, QRConfig


def _complexify(config: QRConfig, A) -> QRConfig:
    """Complex input: Householder panels + complex dtype (same routing as
    qr_blocked / qrcp_blocked); identity for real input."""
    if jnp.iscomplexobj(A):
        return config.replace(dtype=A.dtype, use_pallas=False,
                              use_chol_kernel=False, use_select_kernel=False)
    return config


def _qrcp_with_rank(A, config: QRConfig, rcond):
    """Shared front half: QRCP factor + host-side rank decision.

    Returns (factors, piv (n_pad,), Rfull (kb x n_pad), r, config) with
    config already complex-adjusted.
    """
    A = jnp.asarray(A)
    config = _complexify(config, A)
    m, n = A.shape
    factors, jpvt, R12 = qrcp_blocked(A, config)
    kb = factors.packed.shape[1]
    R = jnp.concatenate([extract_r(factors, kb), R12], axis=1)  # (kb, n_pad)
    d = np.abs(np.asarray(jnp.diagonal(R)))[:n]
    if rcond is None:
        rcond = max(m, n) * float(jnp.finfo(R.dtype).eps)
    r = int((d > rcond * (d[0] if d.size else 0.0)).sum())
    return factors, jpvt, R, r, config


def matrix_rank(A, rcond: float | None = None,
                config: QRConfig = DEFAULT_CONFIG) -> int:
    """Numerical rank of A (m >= n) from the QRCP R diagonal.

    rcond defaults to max(m, n) * eps(dtype) relative to |R_00| -- the
    numpy.linalg.matrix_rank convention, but O(mn^2) QR instead of SVD.
    """
    _, _, _, r, _ = _qrcp_with_rank(A, config, rcond)
    return r


def lstsq_rr(A, b, rcond: float | None = None,
             config: QRConfig = DEFAULT_CONFIG):
    """Minimum-norm least squares for possibly rank-deficient A (m >= n).

    Returns (x, residual_norm, rank, piv).  Full-rank systems should prefer
    models.lstsq.lstsq (jittable, no COD step).
    """
    A = jnp.asarray(A)
    m, n = A.shape
    factors, jpvt, R, r, config = _qrcp_with_rank(A, config, rcond)
    vec = b.ndim == 1
    B = jnp.asarray(b)
    B = (B[:, None] if vec else B).astype(config.dtype)
    nrhs = B.shape[1]

    m_pad = factors.packed.shape[0]
    QtB = ormqr(factors, jnp.pad(B, ((0, m_pad - m), (0, 0))),
                transpose=True, config=config)
    if r == 0:
        x = jnp.zeros((n, nrhs), config.dtype)
        resid = jnp.linalg.norm(B, axis=0)
        return (x[:, 0] if vec else x), (resid[0] if vec else resid), 0, jpvt[:n]

    R1 = R[:r, :n]                                    # (r, n), permuted cols
    # LQ of R1 via QR of R1^T: R1^T = Z^T T^T with Z^T (n, r) orthonormal
    # columns, T (r, r) lower-triangular.
    from .qr import qr_factor
    lq = qr_factor(R1.conj().T, config)
    Zt = lq.Q                                         # (n, r) = Z^H
    T_low = lq.R.conj().T                             # (r, r) lower
    y = jsl.solve_triangular(T_low, QtB[:r], lower=True)
    xz = Zt @ y                                       # (n, nrhs), permuted
    x = jnp.zeros((n, nrhs), xz.dtype).at[jpvt[:n]].set(xz)
    resid = jnp.linalg.norm(QtB[r:m], axis=0)
    if vec:
        x, resid = x[:, 0], resid[0]
    return x, resid, r, jpvt[:n]


def pinv(A, rcond: float | None = None,
         config: QRConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Moore-Penrose pseudoinverse of A (m >= n) via the COD:
    A^+ = P Z^T T^{-1} Q1^T -- O(mn^2), no SVD."""
    A = jnp.asarray(A)
    m, n = A.shape
    factors, jpvt, R, r, config = _qrcp_with_rank(A, config, rcond)
    if r == 0:
        return jnp.zeros((n, m), config.dtype)
    R1 = R[:r, :n]
    from .qr import qr_factor
    lq = qr_factor(R1.conj().T, config)
    Zt, T_low = lq.Q, lq.R.conj().T
    Q1 = orgqr(factors, m, factors.packed.shape[1], config)[:, :r]  # (m, r)
    W = jsl.solve_triangular(T_low, Q1.conj().T, lower=True)        # (r, m)
    return jnp.zeros((n, m), Zt.dtype).at[jpvt[:n]].set(Zt @ W)


def null_space(A, rcond: float | None = None,
               config: QRConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Orthonormal basis (n, n - rank) of the null space of A (m >= n):
    the trailing complete-Q columns of the COD's LQ step, unpermuted."""
    A = jnp.asarray(A)
    m, n = A.shape
    factors, jpvt, R, r, config = _qrcp_with_rank(A, config, rcond)
    if r >= n:
        return jnp.zeros((n, 0), config.dtype)
    if r == 0:
        return jnp.eye(n, dtype=config.dtype)
    R1 = R[:r, :n]
    from .qr import qr_factor
    lq = qr_factor(R1.conj().T, config)
    Zfull = orgqr(lq.factors, n, n, config)           # complete (n, n)
    N = Zfull[:, r:]
    return jnp.zeros_like(N).at[jpvt[:n]].set(N)


def slogdet(A, config: QRConfig = DEFAULT_CONFIG):
    """(sign, logabsdet) of a square real matrix via QR.

    |det A| = prod |diag R|; sign(det A) = sign(prod diag R) * det Q with
    det Q = (-1)^(number of nontrivial reflectors) -- every Householder
    H = I - tau v v^T with tau != 0 is a reflection (det -1), and the
    zero-column guard's tau = 0 contributes identity.  Requires
    Householder-convention panels, so the basis-kernel default is swapped
    for the Householder-reconstruction path (same factorization contract,
    genuine (v, tau) pairs).  Zero diagonal => sign 0 (singular), matching
    numpy.linalg.slogdet.
    """
    from ..ops.blocked import qr_blocked
    A = jnp.asarray(A)
    m, n = A.shape
    if m != n or jnp.iscomplexobj(A):
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"slogdet needs a square real matrix, got {A.shape}")
    cfg = config if config.panel_method != "cholqr2_bk" \
        else config.replace(panel_method="cholqr2_hr")
    fac = qr_blocked(A, cfg)
    d = jnp.diagonal(fac.packed)[:n]
    taus = fac.taus.reshape(-1)[:n]
    refl = jnp.sum((taus != 0).astype(jnp.int32))
    sign_q = jnp.where(refl % 2 == 0, 1.0, -1.0).astype(d.dtype)
    sign = jnp.where(jnp.any(d == 0), 0.0, jnp.prod(jnp.sign(d)) * sign_q)
    logabs = jnp.sum(jnp.log(jnp.abs(d)))
    return sign, logabs
