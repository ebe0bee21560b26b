"""Least-squares solve via QR: min ||Ax - b||_2 (BASELINE config 4).

Pipeline: blocked factorization (qr_blocked) -> Q^T b without forming Q
(ormqr, the production replacement for the reference's verification-only
explicitQR path, qr.cu:582-686) -> back-substitution R x = (Q^T b)[:n].

Differentiation: real inputs use an implicit-function custom VJP (the
adjoint of the normal equations) -- two n x n triangular solves and three
GEMMs, instead of unrolling AD through the blocked factorization's scan
carries (which stores every panel intermediate for the backward pass).
With z solving A^T A z = xbar and rhat the unit residual:
  bbar = A z + rhat diag(rhobar)
  Abar = r z^T - (A z) x^T - rhat diag(rhobar) x^T
(the A dx coupling in d||r|| vanishes because A^T r = 0 at the solution).
Complex inputs take the plain-AD path.
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
          config: QRConfig = DEFAULT_CONFIG, damp: float = 0.0) -> LstsqResult:
    """Solve min_x ||A x - b|| for m >= n full-rank A; b is (m,) or (m, k).

    damp > 0 solves the ridge problem min ||A x - b||^2 + damp^2 ||x||^2
    (scipy lsqr's damp) by factoring the stacked [A; damp*I] system --
    backward-stable regularization without forming A^T A; the reported
    residual_norm is then the *augmented* norm, which includes the
    damp*||x|| term.

    The residual norm comes for free as ||(Q^T b)[n:]|| -- no extra GEMM.
    Differentiable in (A, b); see the module docstring for the VJP (the
    damped path composes the same VJP through the stack's slice adjoint).
    """
    # Route host inputs through to_device BEFORE jit's own device_put:
    # complex numpy operands must not cross the tunnel raw (utils/hostio.py).
    A, b = to_device(A), to_device(b)
    if damp:
        n = A.shape[1]
        As = jnp.concatenate(
            [A, damp * jnp.eye(n, dtype=A.dtype)], axis=0)
        pad = jnp.zeros((n,) + b.shape[1:], dtype=b.dtype)
        return _lstsq_jit(As, jnp.concatenate([b, pad], axis=0), config)
    return _lstsq_jit(A, b, config)


def _lstsq_math(A: jnp.ndarray, B: jnp.ndarray, config: QRConfig):
    """(x, resid, R) for 2-D B; the shared forward computation."""
    m, n = A.shape
    fac = qr_blocked(A, config)
    B = B.astype(fac.packed.dtype)  # follows A for complex inputs
    QtB = ormqr(fac, jnp.pad(B, ((0, fac.packed.shape[0] - m), (0, 0))),
                transpose=True, config=config)
    R = extract_r(fac, n)
    x = jsl.solve_triangular(R, QtB[:n], lower=False)
    resid = jnp.linalg.norm(QtB[n:m], axis=0)
    return x, resid, R


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _lstsq_core(A, B, config):
    x, resid, _ = _lstsq_math(A, B, config)
    return x, resid


def _lstsq_fwd(A, B, config):
    prec = config.precision
    x, resid, R = _lstsq_math(A, B, config)
    r = B.astype(x.dtype) - jnp.einsum("ij,jk->ik", A.astype(x.dtype), x,
                                       precision=prec)
    return (x, resid), (A.astype(x.dtype), x, R, r, resid)


def _lstsq_bwd(config, saved, cts):
    A, x, R, r, resid = saved
    xbar, rhobar = cts
    prec = config.precision
    # z solves A^T A z = xbar via the cached R: z = R^-1 R^-T xbar.
    w = jsl.solve_triangular(R, xbar, lower=False, trans=1)
    z = jsl.solve_triangular(R, w, lower=False)
    safe = resid > 0
    rhat = r / jnp.where(safe, resid, 1)[None, :]
    scaled = rhat * (jnp.where(safe, rhobar, 0))[None, :]
    Az = jnp.einsum("ij,jk->ik", A, z, precision=prec)
    bbar = Az + scaled
    Abar = (jnp.einsum("ik,jk->ij", r, z, precision=prec)
            - jnp.einsum("ik,jk->ij", Az, x, precision=prec)
            - jnp.einsum("ik,jk->ij", scaled, x, precision=prec))
    return Abar, bbar


_lstsq_core.defvjp(_lstsq_fwd, _lstsq_bwd)


@partial(jax.jit, static_argnames=("config",))
def _lstsq_jit(A: jnp.ndarray, b: jnp.ndarray,
               config: QRConfig = DEFAULT_CONFIG) -> LstsqResult:
    m, n = A.shape
    if m < n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"lstsq requires m >= n, got {m}x{n}")
    vec = b.ndim == 1
    B = b[:, None] if vec else b
    if jnp.iscomplexobj(A) or jnp.iscomplexobj(B):
        # Complex: plain AD path (the custom VJP's cotangent algebra is
        # written for the real case).
        x, resid, _ = _lstsq_math(A, B, config)
    else:
        x, resid = _lstsq_core(A, B, config)
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


def lstsq_dist(A, b, mesh, config: QRConfig = DEFAULT_CONFIG,
               combine: str = "bk") -> LstsqResult:
    """Distributed least squares over a row mesh: min ||A x - b||.

    Augmented-matrix CAQR: one R-only communication-avoiding factorization
    of [A | b] yields R_aug = [[R, Q^T b], [0, rho]], so the solve needs no
    distributed Q application at all -- x = R^{-1} R_aug[:n, n:] and the
    per-rhs residual norm is the column norm of the rho block.  (x and the
    norms are invariant to TSQR's row-sign ambiguity: a diagonal sign flip
    D cancels in (D R)^{-1} (D Z).)  Communication: the same two nb x nb
    psums per panel as caqr_r -- b never moves between shards.

    A: (m, n) with m >= n, full rank; b: (m,) or (m, k).  The distributed
    counterpart of the reference-parity lstsq above (BASELINE config 4 at
    mesh scale).
    """
    A, b = jnp.asarray(A), jnp.asarray(b)
    m, n = A.shape
    B = b[:, None] if b.ndim == 1 else b
    if B.shape[0] != m:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"b rows {B.shape[0]} != A rows {m}")
    from .caqr import caqr_r
    k = B.shape[1]
    Raug = caqr_r(jnp.concatenate([A, B.astype(A.dtype)], axis=1),
                  mesh, config, combine=combine)
    R = Raug[:n, :n]
    Z = Raug[:n, n:]
    x = jsl.solve_triangular(R, Z, lower=False)
    resid = jnp.linalg.norm(Raug[n:, n:], axis=0)
    if b.ndim == 1:
        return LstsqResult(x[:, 0], resid[0])
    return LstsqResult(x, resid)
