"""High-level QR API: the library's flagship "model".

``qr(A)`` is the user-facing entry point (the role of the reference's
``mmqr`` host call, qr.cu:475) returning either explicit thin (Q, R) or the
packed factor object for later orgqr/ormqr/solve use.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.blocked import PackedQR, extract_r, orgqr, ormqr, qr_blocked
from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.hostio import to_device


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
    A = to_device(A)  # complex host input must not cross the wire raw
    m, n = A.shape
    return QRResult(qr_blocked(A, config), m, n, config)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _qr_diff(A, config: QRConfig):
    res = qr_factor(A, config)
    return res.Q, res.R


def _qr_diff_fwd(A, config):
    Q, R = _qr_diff(A, config)
    return (Q, R), (Q, R)


def thin_qr_vjp(Q, R, dQ, dR, precision):
    """Reverse rule for any thin QR, m >= n (the standard copyltu formula):
        M = R dR^T - dQ^T Q
        dA = (dQ + Q (tril(M,-1) + tril(M,-1)^T + diag(M))) R^{-T}
    Depends only on the primal outputs, so every thin-QR algorithm in the
    library (blocked Householder, TSQR tree, direct CholeskyQR2) shares it.
    Two GEMMs + one triangular solve -- cheaper than differentiating
    through any of the factorizations.
    """
    import jax.scipy.linalg as jsl
    M = (jnp.einsum("ij,kj->ik", R, dR, precision=precision)
         - jnp.einsum("ji,jk->ik", dQ, Q, precision=precision))
    tri = jnp.tril(M, -1)
    copyltu = tri + tri.T + jnp.diag(jnp.diagonal(M))
    rhs = dQ + jnp.einsum("ij,jk->ik", Q, copyltu, precision=precision)
    return jsl.solve_triangular(R, rhs.T, lower=False).T


def _qr_diff_bwd(config, residuals, cotangents):
    """The drivers' fori/while loops are not reverse-differentiable, so QR
    is exposed as a custom-VJP primitive over ``thin_qr_vjp``."""
    Q, R = residuals
    dQ, dR = cotangents
    return (thin_qr_vjp(Q, R, dQ, dR, config.precision),)


_qr_diff.defvjp(_qr_diff_fwd, _qr_diff_bwd)


def qr_pivoted(A, config: QRConfig = DEFAULT_CONFIG, rank: int | None = None,
               key=None):
    """Column-pivoted (rank-revealing) QR: A[:, piv] = Q @ R.

    Randomized blocked QRCP (ops/qrcp.py -- Duersch & Gu 2017 shaped for
    the MXU; the reference and XLA's TPU lowering have no pivoted QR).

    rank=None: full factorization -- Q (m x n), R (n x n) upper-triangular,
      piv (n,) with A[:, piv] = Q R.
    rank=r: truncated rank-revealing factorization after ceil(r/nb) panel
      blocks -- Q (m x r), R (r x n), piv (n,) with A[:, piv] ~= Q R up to
      the neglected singular values.
    """
    from ..ops.qrcp import qrcp_blocked
    from ..utils.geometry import round_up
    A = to_device(A)
    if jnp.iscomplexobj(A):
        # complex: Householder panels + jnp pivot selection (ops/qrcp.py
        # routes this); pivots are chosen on |column|^2 sketch norms.
        config = config.replace(dtype=A.dtype, use_pallas=False,
                                use_chol_kernel=False,
                                use_select_kernel=False)
    m, n = A.shape
    nb = config.panel_width
    num_panels = None
    if rank is not None:
        if not 1 <= rank <= n:
            from ..utils.errors import QRShapeError
            raise QRShapeError(f"rank must be in [1, {n}], got {rank}")
        num_panels = -(-rank // nb)
    factors, jpvt, R12 = qrcp_blocked(A, config, key, num_panels)
    kb = factors.packed.shape[1]
    Q = orgqr(factors, m, kb, config)
    R = jnp.concatenate([extract_r(factors, kb), R12], axis=1)
    r = min(n, kb) if rank is None else rank
    return Q[:, :r], R[:r, :n], jpvt[:n]


def qr(A, config: QRConfig = DEFAULT_CONFIG, mode: str = "reduced"):
    """QR factorization with numpy.linalg.qr-style modes.

    mode='reduced': (Q (m x k), R (k x n)), k = min(m, n) -- wide matrices
      (m < n, which the reference forbids outright, qr.c:465) are handled by
      factoring the left m x m block and applying Q^T to the rest.
    mode='complete': (Q (m x m), R (m x n)).
    mode='r': R only.
    mode='raw': (h (n x m), tau (k,)) -- LAPACK geqrf packed storage,
      transposed like numpy's raw mode; Householder-convention panels are
      forced (the basis-kernel default stores a non-LAPACK V block).
      2-D m >= n input only.
    """
    A = to_device(A)
    if mode == "raw":
        from ..utils.errors import QRShapeError
        if A.ndim != 2 or A.shape[0] < A.shape[1]:
            raise QRShapeError(
                f"mode='raw' needs a single m >= n matrix, got {A.shape}")
        m, n = A.shape
        cfg = config if config.panel_method != "cholqr2_bk" \
            else config.replace(panel_method="cholqr2_hr")
        fac = qr_blocked(A, cfg)
        return fac.packed[:m, :n].T, fac.taus.reshape(-1)[:n]
    if A.ndim > 2:  # leading batch dims via vmap, honoring the requested mode
        batch = A.shape[:-2]
        flat = A.reshape((-1,) + A.shape[-2:])
        if mode == "r":
            Rs = jax.vmap(lambda a: qr(a, config, mode="r"))(flat)
            return Rs.reshape(batch + Rs.shape[-2:])
        Qs, Rs = jax.vmap(lambda a: qr(a, config, mode=mode))(flat)
        return (Qs.reshape(batch + Qs.shape[-2:]),
                Rs.reshape(batch + Rs.shape[-2:]))
    m, n = A.shape
    k = min(m, n)
    if m >= n:
        if mode == "reduced" and not jnp.iscomplexobj(A):
            return _qr_diff(A, config)  # differentiable (custom VJP)
        if mode == "reduced":
            res = qr_factor(A, config)  # complex: VJP formula is real-only
            return res.Q, res.R
        res = qr_factor(A, config)
        if mode == "r":
            return res.R
        if mode == "complete":
            from ..ops.blocked import orgqr
            Q = orgqr(res.factors, m, m, config)
            R = jnp.pad(res.R, ((0, m - n), (0, 0)))
            return Q, R
        return res.Q, res.R
    # wide: A = [A1 | A2], A1 = Q R11, R12 = Q^T A2
    res = qr_factor(A[:, :m], config)
    R12 = res.apply_qt(A[:, m:].astype(res.factors.packed.dtype))[:m]
    R = jnp.concatenate([res.R, R12], axis=1)
    if mode == "r":
        return R
    if mode == "complete":
        from ..ops.blocked import orgqr
        return orgqr(res.factors, m, m, config), R
    return res.Q, R
