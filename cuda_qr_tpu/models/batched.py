"""Batched small-matrix QR: thin Q/R for stacks of (m, n) problems.

Capability extension beyond the reference (whose driver factors exactly one
matrix per process, qr.cu:475-553).  ``qr(A)`` already supports leading batch
dims by vmapping the blocked driver, but for the *many-small-matrices* regime
(B x m x n with n <= a few hundred) that shape is wrong on TPU: each vmapped
element drags the panel scan's sequential chain along, and the per-element
matrices are too small to fill the MXU.

``qr_batched`` instead runs shifted CholeskyQR3 (Fukaya, Kannan, Nakatsukasa,
Yamamoto, Yanagisawa, SIAM J. Sci. Comput. 2020) across the whole stack at
once: every step is a batched einsum -- Gram matrices, triangular solves as
GEMMs against fused L/L^-1 inverses (ops/smalllinalg.py vmapped) -- so the
MXU sees (B*m, n)-scale work regardless of how small each element is, and the
only sequential chain is the one log-depth Cholesky recursion shared by the
entire batch.

Numerical envelope (documented, not hidden): the shift guarantees the
round-1 Cholesky succeeds for numerically full-rank elements with
cond(X) <~ 1/(8 sqrt(eps)) after which two refinement rounds (the third run
only when the batch needs it) restore O(eps) orthogonality.  R has a
*positive* diagonal -- the canonical CholeskyQR convention, differing from
the Householder paths' -sign(a1) convention (SURVEY.md App. A) by a column
sign flip.  Exactly rank-deficient elements produce NaNs (detectable), not
silently wrong factors; use ``qr(A)`` (vmapped Householder) for those.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.smalllinalg import cholesky_with_inv
from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.errors import QRShapeError

Precision = jax.lax.Precision


def _chol_round(X, prec):
    """(Q, R, emax): one CholeskyQR round of a (B, m, n) stack.

    emax = max over the batch of |X^T X - I| -- the callers' gate for
    whether another refinement round is needed.
    """
    n = X.shape[-1]
    G = jnp.einsum("bri,brj->bij", X, X, precision=prec)
    emax = jnp.max(jnp.abs(G - jnp.eye(n, dtype=X.dtype)))
    L, Li = jax.vmap(lambda g: cholesky_with_inv(g, prec))(G)
    Q = jnp.einsum("bri,bji->brj", X, Li, precision=prec)     # X L^-T
    R = jnp.transpose(L, (0, 2, 1))
    return Q, R, emax


@partial(jax.jit, static_argnames=("config", "mode"))
def qr_batched(A: jnp.ndarray, config: QRConfig = DEFAULT_CONFIG,
               mode: str = "reduced"):
    """Thin QR of a stack: A (..., m, n) with m >= n -> Q (..., m, n),
    R (..., n, n) upper triangular with positive diagonal.

    mode='reduced' returns (Q, R); mode='r' returns R only (same flops --
    the refinement rounds need Q -- but saves the output).

    Differentiable via the shared thin-QR custom VJP, vmapped over the
    batch (models/qr.py::thin_qr_vjp).
    """
    A = jnp.asarray(A)
    if A.ndim < 2:
        raise QRShapeError(f"qr_batched needs at least 2 dims, got {A.ndim}")
    if jnp.iscomplexobj(A):
        raise QRShapeError(
            "qr_batched is real-only (CholeskyQR rounds); use qr() for "
            "complex batches")
    if mode not in ("reduced", "r"):
        raise QRShapeError(f"mode must be 'reduced' or 'r', got {mode!r}")
    *batch, m, n = A.shape
    if m < n:
        raise QRShapeError(f"qr_batched requires m >= n, got {m}x{n}")
    dtype = A.dtype if A.dtype in (jnp.float32, jnp.float64) else config.dtype
    X = A.reshape((-1, m, n)).astype(dtype)
    Q, R = _qr_batched_diff(X, config)
    out_shape = tuple(batch)
    Q = Q.reshape(out_shape + (m, n))
    R = R.reshape(out_shape + (n, n))
    if mode == "r":
        return R
    return Q, R


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _qr_batched_diff(X, config: QRConfig):
    return _qr_batched_math(X, config)


def _qr_batched_fwd(X, config):
    Q, R = _qr_batched_math(X, config)
    return (Q, R), (Q, R)


def _qr_batched_bwd(config, residuals, cotangents):
    from .qr import thin_qr_vjp
    Q, R = residuals
    dQ, dR = cotangents
    dA = jax.vmap(lambda q, r, dq, dr:
                  thin_qr_vjp(q, r, dq, dr, config.precision))(Q, R, dQ, dR)
    return (dA,)


_qr_batched_diff.defvjp(_qr_batched_fwd, _qr_batched_bwd)


def _qr_batched_math(X: jnp.ndarray, config: QRConfig):
    """sCholQR3 of a flattened (B, m, n) stack -> (Q, R)."""
    _, m, n = X.shape
    dtype = X.dtype
    prec = config.precision
    eps = jnp.finfo(dtype).eps

    # Shifted round 1 (sCholQR3): the shift keeps G + sI positive definite
    # through rounding for cond(X) up to ~1/(8 sqrt(eps)); ||X||_2^2 is upper
    # bounded by the Frobenius norm squared.
    fro2 = jnp.sum(X.astype(jnp.float64 if dtype == jnp.float64 else
                            jnp.float32) ** 2, axis=(-2, -1))
    shift = (11.0 * (m * n + n * (n + 1)) * eps * fro2).astype(dtype)
    shift = shift + jnp.finfo(dtype).tiny
    G = jnp.einsum("bri,brj->bij", X, X, precision=prec)
    G = G + shift[:, None, None] * jnp.eye(n, dtype=dtype)
    L1, L1i = jax.vmap(lambda g: cholesky_with_inv(g, prec))(G)
    Q1 = jnp.einsum("bri,bji->brj", X, L1i, precision=prec)
    R1 = jnp.transpose(L1, (0, 2, 1))

    # Round 2 always (CholeskyQR2); emax2 measures Q1's Gram error, which is
    # ~ eps * cond(X)^2 + shift-induced error.
    Q2, R2, emax2 = _chol_round(Q1, prec)
    R21 = jnp.einsum("bij,bjk->bik", R2, R1, precision=prec)

    # Round 3 only when round 1+2 cannot have reached O(eps) orthogonality
    # (large shift or ill conditioning).  One cond for the WHOLE batch: a
    # per-element gate would run both branches under vmap anyway.
    tol = jnp.asarray(3e-4 if dtype == jnp.float32 else 3e-8, dtype)

    def refine(args):
        Q2, R21 = args
        Q3, R3, _ = _chol_round(Q2, prec)
        return Q3, jnp.einsum("bij,bjk->bik", R3, R21, precision=prec)

    Q, R = jax.lax.cond(emax2 > tol, refine, lambda a: a, (Q2, R21))
    return Q, jnp.triu(R)  # exact zeros below the diagonal
