"""Fast panel factorization: CholeskyQR2 + Householder reconstruction.

The TPU-shaped answer to the panel bottleneck.  Column-by-column Householder
generation is a length-nb dependency chain of cross-lane reductions -- on a
TPU that is ~15 us of overhead per column no matter how the kernel is
written (measured on the Pallas geqrt kernel: ~2 ms per 128-wide panel).
This path replaces the chain with:

  1. CholeskyQR2: Q R = X via two rounds of Gram + Cholesky + triangular
     inverse -- all MXU GEMMs plus a log-depth nb x nb recursion;
  2. Householder reconstruction (Ballard, Demmel, Grigori, Knight, Nguyen,
     Solomonik, IPDPS 2014): recover the packed V/tau/T factors from the
     explicit Q so downstream code (larfb, orgqr, ormqr, CAQR) sees exactly
     the same compact-WY representation as the geqrt path:
         S = -sign(diag_J(Q));  Y = E_J - Q S;  Y = V W (unpivoted LU,
         stable because |Y_jj| = 1 + |Q_jj|);  T = W (V_J^T)^{-1};
         R_house = S R_pos;  tau = diag(T).
  3. A lax.cond fallback to masked per-column Householder (geqr2_dyn) when
     Cholesky breaks down (rank-deficient or cond(X) >~ 1/sqrt(eps) panel)
     -- detected by non-finite output, costing nothing in the common case.

The result: a 8192x128 panel factors in ~GEMM time (~0.1 ms) instead of
~4 ms, the whole blocked QR becomes MXU-bound, and -- because there is no
Pallas instance in this path -- the driver can unroll or scan panels without
per-instance Mosaic compiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import QRConfig
from .householder import geqr2_dyn, larft
from .smalllinalg import cholesky_with_inv, lu_with_inv, newton_inverse


def _unpack_v_dyn(packed, off):
    m, n = packed.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1) + jnp.asarray(off, jnp.int32)
    return jnp.where(r > c, packed, jnp.where(r == c, 1, 0).astype(packed.dtype))


def _cholqr2(X, nb, dtype, prec, config=None):
    """CholeskyQR2 of a zero-masked full-height panel: (Q, Rpos, emax).

    Round 2's Cholesky chain is Taylor-bypassed when its Gram matrix is
    already I + O(sqrt(eps)) -- the common case after round 1.  The nb x nb
    Cholesky+inverse runs as ONE fused Mosaic kernel when eligible
    (pallas_chol; ~0.1 ms vs ~0.33 ms as an XLA op chain at nb=128).

    emax = max|Q1^T Q1 - I| after round 1 ~= eps * cond(X)^2: callers gate
    on it because CholeskyQR2 silently loses orthogonality (NO NaN) once
    cond(X)^2 * eps approaches 1 -- round 2 only restores O(eps)
    orthogonality while emax is small.  Observed in the wild: the last
    panels of a square Gaussian 8192^2 at nb=256 factor to orth ~ 78
    without tripping any finiteness check.
    """
    chol = cholesky_with_inv
    if config is not None and config.use_pallas and config.use_chol_kernel:
        from .pallas_chol import chol_with_inv_pallas, supported
        if supported((nb, nb), dtype):
            interp = config.resolved_interpret()
            chol = lambda g, _prec=prec: chol_with_inv_pallas(g, interp)  # noqa: E731
    G = jnp.einsum("ri,rj->ij", X, X, precision=prec)
    L1, L1i = chol(G, prec)
    Q1 = jnp.einsum("ri,ji->rj", X, L1i, precision=prec)     # X L1^-T
    G2 = jnp.einsum("ri,rj->ij", Q1, Q1, precision=prec)
    E = G2 - jnp.eye(nb, dtype=dtype)
    emax = jnp.max(jnp.abs(E))
    tol = 3e-4 if dtype == jnp.float32 else 3e-8

    def taylor(E):
        C = jnp.tril(E, -1) + 0.5 * jnp.diag(jnp.diagonal(E))
        eye = jnp.eye(nb, dtype=dtype)
        return eye + C, eye - C

    L2, L2i = jax.lax.cond(emax < tol, taylor,
                           lambda E: chol(E + jnp.eye(nb, dtype=dtype), prec),
                           E)
    Q = jnp.einsum("ri,ji->rj", Q1, L2i, precision=prec)
    Rpos = jnp.einsum("ji,kj->ik", L2, L1, precision=prec)   # R2 R1
    return Q, Rpos, emax


# Above this round-1 Gram error, round 2 cannot restore O(eps)
# orthogonality (needs eps*cond(X)^2 << 1); callers fall back to the
# masked-Householder panel.  Dimensionless, so one gate serves f32/f64.
_EMAX_GATE = 0.05


def _hr_construct(Q, Rpos, panel, off, prec):
    """Householder reconstruction (packed, tau, T, VJ) from CholeskyQR2's
    explicit Q / positive-diagonal R (Ballard et al., IPDPS 2014).

    Shared by panel_factor_cholqr2hr and the basis-kernel path's
    ill-conditioned-M fallback.  Stable for ANY orthonormal Q: the LU it
    performs is of Y_J = I - Q_J S with |diag| = 1 + |q_jj| >= 1 (proven
    growth bound), unlike the basis kernel's N = (I - S Q_J)^{-1} whose
    conditioning is unbounded for near-square live panels.
    Returns VJ as the exact unit-lower diagonal V block.
    """
    m, nb = panel.shape
    dtype = panel.dtype
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    QJ = jax.lax.dynamic_slice(Q, (off, jnp.int32(0)), (nb, nb))
    qd = jnp.diagonal(QJ)
    s = jnp.where(qd >= 0, -1, 1).astype(dtype)              # = -sign conv
    YJ = jnp.eye(nb, dtype=dtype) - QJ * s[None, :]
    VJl, W, VJi, Wi = lu_with_inv(YJ, prec)
    # V = (E_J - Q S) Wi = place(Wi at rows J) - Q (S Wi)
    Wi_s = s[:, None] * Wi
    Z = jnp.einsum("rj,jk->rk", Q, Wi_s, precision=prec)     # (m, nb)
    ZJ = jax.lax.dynamic_slice(Z, (off, jnp.int32(0)), (nb, nb))
    V = jax.lax.dynamic_update_slice(-Z, Wi - ZJ, (off, jnp.int32(0)))
    T = jnp.einsum("ij,kj->ik", W, VJi, precision=prec)      # W VJ^-T
    tau = jnp.diagonal(T)
    R_house = s[:, None] * Rpos
    col = jax.lax.broadcasted_iota(jnp.int32, (m, nb), 1)
    R_placed = jax.lax.dynamic_update_slice(
        jnp.zeros((m, nb), dtype), R_house, (off, jnp.int32(0)))
    d = off + col
    packed = jnp.where(r_iota < off, panel,
                       jnp.where(r_iota <= d, R_placed, V))
    VJ = jnp.tril(VJl, -1) + jnp.eye(nb, dtype=dtype)
    return packed, tau, T, VJ


def panel_factor_cholqr2hr(panel: jnp.ndarray, off, config: QRConfig):
    """Factor rows >= off of a full-height (m x nb) panel.

    Returns (packed, tau, T) exactly like the geqrt paths.  ``off`` may be
    traced.  Requires m - off >= nb (guaranteed by the blocked driver's
    padding).
    """
    m, nb = panel.shape
    prec = config.precision
    cast_back = None
    if panel.dtype == jnp.bfloat16:
        cast_back = jnp.bfloat16
        panel = panel.astype(jnp.float32)
    dtype = panel.dtype
    off = jnp.asarray(off, jnp.int32)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    live = r_iota >= off
    X = jnp.where(live, panel, 0)

    def cholqr2hr(X):
        Q, Rpos, emax = _cholqr2(X, nb, dtype, prec, config)
        # Householder reconstruction: all small quantities come from the
        # nb x nb diagonal block of Q; the only full-height work is ONE GEMM
        # (V = -Q (S Wi) with the rows-J correction).
        packed, tau, T, _ = _hr_construct(Q, Rpos, panel, off, prec)
        return packed, tau, T, emax

    def householder_fallback(X):
        packed, tau = geqr2_dyn(panel, off, precision=prec)
        T = larft(_unpack_v_dyn(packed, off), tau, precision=prec)
        return packed, tau, T

    packed, tau, T, emax = cholqr2hr(X)
    bad = (~jnp.isfinite(jnp.sum(packed) + jnp.sum(T))) | (emax > _EMAX_GATE)
    packed, tau, T = jax.lax.cond(bad, householder_fallback,
                                  lambda _: (packed, tau, T), X)
    if cast_back is not None:
        packed = packed.astype(cast_back)
    return packed, tau, T


def panel_factor_cholqr2bk(panel: jnp.ndarray, off, config: QRConfig):
    """Basis-kernel panel factorization: CholeskyQR2 + Yamamoto's N.

    Like panel_factor_cholqr2hr, but instead of RECONSTRUCTING unit-lower
    Householder vectors (whose LU is a second nb-step sequential chain), the
    panel's orthogonal transform is carried directly in basis-kernel form
    (Yamamoto et al., "Constructing Householder-type transformations from
    TSQR output"):

        Y = Q - E_J S,   N = (I - S Q_J)^{-1},   H = I - Y N Y^T,

    with S = diag(-sign(diag Q_J)).  Then H Q = E_J S exactly when Q is
    orthonormal, so H A = E_J (S Rpos) -- H is the panel's block reflector
    with V := Y and T := N^T in the driver's Q_panel = I - V T V^T
    convention.  N is computed by Newton-Schulz (newton_inverse):
    ~2 log2(cond) dependent GEMMs instead of an nb-step LU chain, which
    halves the sequential depth of every panel.  Ill-conditioned I - S Q_J
    (rare; Newton residual check) falls back to the exact LU-chain inverse;
    Cholesky breakdown falls back to masked Householder like the HR path.

    Returns (packed, tau, T, VJ): packed has R (upper-triangular, HR sign
    convention) in rows [off, off+nb) and Y's DENSE tail (= Q's tail) below;
    VJ = Q_J - S is Y's dense diagonal block, carried in PackedQR.VJs.
    tau := diag(T) nominally (there are no per-column Householder taus in
    this representation).
    """
    m, nb = panel.shape
    prec = config.precision
    cast_back = None
    if panel.dtype == jnp.bfloat16:
        cast_back = jnp.bfloat16
        panel = panel.astype(jnp.float32)
    dtype = panel.dtype
    off = jnp.asarray(off, jnp.int32)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    live = r_iota >= off
    X = jnp.where(live, panel, 0)

    def cholqr2bk(X):
        Q, Rpos, emax = _cholqr2(X, nb, dtype, prec, config)
        QJ = jax.lax.dynamic_slice(Q, (off, jnp.int32(0)), (nb, nb))
        qd = jnp.diagonal(QJ)
        s = jnp.where(qd >= 0, -1, 1).astype(dtype)   # diag(I - S QJ) >= 1
        M = jnp.eye(nb, dtype=dtype) - s[:, None] * QJ
        # No in-graph LU fallback for a failed Newton iteration: a
        # non-converged N fails the a-posteriori certificate below (errN
        # stays large), which routes the panel to the provably-stable
        # Householder reconstruction -- the same destination an exact
        # inverse of an ill-conditioned M would need anyway.  Dropping the
        # dead lax.cond(lu_with_inv) branch removes ~1/4 of the optimized
        # panel graph, which the staged driver instantiates per stage.
        N, _ = newton_inverse(M, prec)

        def bk_assemble(_):
            T = N.T
            tau = jnp.diagonal(T)
            R_house = s[:, None] * Rpos
            VJ = QJ - jnp.diag(s)
            R_placed = jax.lax.dynamic_update_slice(
                jnp.zeros((m, nb), dtype), jnp.triu(R_house),
                (off, jnp.int32(0)))
            packed = jnp.where(r_iota < off, panel,
                               jnp.where(r_iota < off + nb, R_placed, Q))
            return packed, tau, T, VJ

        # A-posteriori certificate for the basis-kernel representation.
        # H = I - Y N^ Y^T deviates from orthogonality by
        # <= 16 ||N||^2 ||I - M N^||  (first order in Delta N), and kappa(M)
        # is UNBOUNDED for near-square live panels (spec(S Q_J) approaches
        # the unit circle's +1) regardless of cond(X) -- observed: the final
        # 256x256-live panel of a square Gaussian yields ||H^T H - I|| = 1.65
        # while emax = 1.8e-3 sails under every other gate.  When the
        # certificate fails, rebuild the panel via the provably-stable
        # Householder reconstruction, reusing this CholeskyQR2's Q/Rpos.
        errN = jnp.max(jnp.abs(
            jnp.eye(nb, dtype=dtype)
            - jnp.einsum("ij,jk->ik", M, N, precision=prec)))
        nrmN = jnp.max(jnp.abs(N))
        cert = nrmN * nrmN * errN
        bad_m = ~(cert <= 100 * jnp.finfo(dtype).eps)   # NaN-safe: NaN -> HR
        packed, tau, T, VJ = jax.lax.cond(
            bad_m, lambda _: _hr_construct(Q, Rpos, panel, off, prec),
            bk_assemble, None)
        return packed, tau, T, VJ, emax

    def householder_fallback(X):
        packed, tau = geqr2_dyn(panel, off, precision=prec)
        T = larft(_unpack_v_dyn(packed, off), tau, precision=prec)
        blockJ = jax.lax.dynamic_slice(packed, (off, jnp.int32(0)), (nb, nb))
        VJ = jnp.tril(blockJ, -1) + jnp.eye(nb, dtype=packed.dtype)
        return packed, tau, T, VJ

    packed, tau, T, VJ, emax = cholqr2bk(X)
    bad = (~jnp.isfinite(jnp.sum(packed) + jnp.sum(T))) | (emax > _EMAX_GATE)
    packed, tau, T, VJ = jax.lax.cond(bad, householder_fallback,
                                      lambda _: (packed, tau, T, VJ), X)
    if cast_back is not None:
        packed = packed.astype(cast_back)
    return packed, tau, T, VJ
