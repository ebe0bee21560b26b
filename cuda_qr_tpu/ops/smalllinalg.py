"""Small-matrix primitives for the fast panel path: log-depth, GEMM-only.

TPU-native replacements for the per-column recurrences a CPU/GPU library
would use on nb x nb problems: triangular inversion by recursive block
doubling, unpivoted LU by 2-way recursion, Cholesky by 2-way recursion.
Every level is a constant number of small MXU GEMMs; only the tiny base
case (width <= _BASE) runs a sequential fori loop.  Depth log2(nb/_BASE),
so a 128x128 factorization is ~4 GEMM rounds instead of 128 dependent
column steps -- the difference between ~2 ms and ~0.05 ms panels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Precision = jax.lax.Precision
_H = Precision.HIGHEST
_BASE = 16


def _inv_upper_base(U: jnp.ndarray) -> jnp.ndarray:
    """Back-substitution inverse of a small upper-triangular block."""
    n = U.shape[0]
    X = jnp.zeros_like(U)

    def body(jj, X):
        j = n - 1 - jj
        e = (jnp.arange(n) == j).astype(U.dtype)
        ujj = U[j, j]
        # X[j, :] = (e - U[j, j+1:] @ X[j+1:, :]) / ujj ; mask does the slicing
        mask = (jnp.arange(n) > j).astype(U.dtype)
        row = (e - (U[j] * mask) @ X) / ujj
        return X.at[j].set(row)

    return jax.lax.fori_loop(0, n, body, X)


def inv_upper(U: jnp.ndarray, precision: Precision = _H) -> jnp.ndarray:
    """Inverse of upper-triangular U.

    Power-of-two sizes use fully-BATCHED block doubling: level s inverts all
    n/2s diagonal 2s-blocks at once from their s-block inverses,
        inv([[A, B], [0, C]]) = [[Ai, -Ai B Ci], [0, Ci]],
    as one batched einsum per level -- log2(n) levels, no sequential scalar
    loop anywhere (the per-column chain is exactly what a TPU cannot hide).
    Other sizes fall back to 2-way recursion with a fori base.
    """
    n = U.shape[0]
    if n & (n - 1):  # not a power of two
        return _inv_upper_rec(U, precision)
    M = (1.0 / jnp.diagonal(U)).reshape(n, 1, 1)
    s = 1
    while s < n:
        nblk = n // (2 * s)
        view = U.reshape(nblk, 2 * s, nblk, 2 * s)
        idx = jnp.arange(nblk)
        dblk = view[idx, :, idx, :]                    # (nblk, 2s, 2s)
        B = dblk[:, :s, s:]
        Ai, Ci = M[0::2], M[1::2]
        top = -jnp.einsum("bij,bjk,bkl->bil", Ai, B, Ci, precision=precision)
        z = jnp.zeros((nblk, s, s), U.dtype)
        M = jnp.concatenate([jnp.concatenate([Ai, top], 2),
                             jnp.concatenate([z, Ci], 2)], 1)
        s *= 2
    return M[0]


def _inv_upper_rec(U: jnp.ndarray, precision: Precision) -> jnp.ndarray:
    n = U.shape[0]
    if n <= _BASE:
        return _inv_upper_base(U)
    h = n // 2
    Ai = _inv_upper_rec(U[:h, :h], precision)
    Ci = _inv_upper_rec(U[h:, h:], precision)
    B = U[:h, h:]
    top = -jnp.einsum("ij,jk,kl->il", Ai, B, Ci, precision=precision)
    z = jnp.zeros((n - h, h), U.dtype)
    return jnp.block([[Ai, top], [z, Ci]])


def inv_lower(L: jnp.ndarray, precision: Precision = _H) -> jnp.ndarray:
    """Inverse of lower-triangular L (unit or general diagonal), via the
    upper routine on L^T."""
    return inv_upper(L.T, precision).T


def cholesky_recursive(G: jnp.ndarray, precision: Precision = _H) -> jnp.ndarray:
    """Lower Cholesky factor of SPD G by 2-way recursion.

    chol([[A, B^T], [B, C]]) = [[L1, 0], [B L1^-T, chol(C - (B L1^-T)(.)^T)]].
    Returns NaNs (no raise) for a non-PD input -- callers lax.cond on that
    to trigger the Householder fallback.
    """
    n = G.shape[0]
    if n <= _BASE:
        return _chol_base(G)
    h = n // 2
    L1 = cholesky_recursive(G[:h, :h], precision)
    L1it = inv_lower(L1, precision)
    B = G[h:, :h]
    L21 = jnp.einsum("ij,kj->ik", B, L1it, precision=precision)  # B L1^-T
    S = G[h:, h:] - jnp.einsum("ij,kj->ik", L21, L21, precision=precision)
    L2 = cholesky_recursive(S, precision)
    z = jnp.zeros((h, n - h), G.dtype)
    return jnp.block([[L1, z], [L21, L2]])


def _chol_base(G: jnp.ndarray) -> jnp.ndarray:
    """Statically-unrolled base Cholesky (n <= _BASE): the column chain is
    unavoidable, but unrolling removes per-iteration loop overhead, which at
    this size is larger than the arithmetic itself."""
    n = G.shape[0]
    cols = []
    idx = jnp.arange(n)
    for j in range(n):
        d = jnp.sqrt(G[j, j])
        col = jnp.where(idx >= j, G[:, j], 0) / d
        cols.append(col)
        G = G - jnp.outer(col, col)
    return jnp.stack(cols, axis=1)


def cholesky_with_inv(G: jnp.ndarray, precision: Precision = _H):
    """(L, L^{-1}) of SPD G in one recursion.

    The inverse falls out of the same block recursion that needs partial
    inverses anyway (L21 = G21 L1^{-T}), so fusing it removes every
    standalone inversion tree from the CholeskyQR rounds:
        inv([[L1, 0], [L21, L2]]) = [[L1i, 0], [-L2i L21 L1i, L2i]].
    """
    n = G.shape[0]
    if n <= _BASE:
        L = _chol_base(G)
        return L, inv_lower(L, precision)
    h = n // 2
    L1, L1i = cholesky_with_inv(G[:h, :h], precision)
    L21 = jnp.einsum("ij,kj->ik", G[h:, :h], L1i, precision=precision)
    S = G[h:, h:] - jnp.einsum("ij,kj->ik", L21, L21, precision=precision)
    L2, L2i = cholesky_with_inv(S, precision)
    bot = -jnp.einsum("ij,jk,kl->il", L2i, L21, L1i, precision=precision)
    z = jnp.zeros((h, n - h), G.dtype)
    L = jnp.block([[L1, z], [L21, L2]])
    Li = jnp.block([[L1i, z], [bot, L2i]])
    return L, Li


def chol_with_inv_auto(G: jnp.ndarray, precision: Precision = _H,
                       config=None):
    """cholesky_with_inv, routed through the fused Mosaic kernel when it
    is eligible AND compiled (real TPU): one resident Pallas program
    instead of ~0.33 ms of dependent XLA ops per 128x128, and ~0.7 MB less
    optimized HLO per inlined call site.  Interpret mode (CPU tests) stays
    on the jnp recursion -- interpreting the kernel is slower and bloats
    the executable; kernel coverage on CPU lives in the panel path and the
    kernel's own tests."""
    if (config is not None and config.use_pallas and config.use_chol_kernel
            and not config.resolved_interpret()):
        from .pallas_chol import chol_with_inv_pallas, supported
        if supported(G.shape, G.dtype):
            return chol_with_inv_pallas(G, False)
    return cholesky_with_inv(G, precision)


def newton_inverse(M: jnp.ndarray, precision: Precision = _H,
                   tol: float | None = None, max_iters: int = 48):
    """Dense inverse of a well-conditioned square M by Newton-Schulz.

    X_{k+1} = X_k (2I - M X_k), X_0 = M^T / (||M||_1 ||M||_inf) -- globally
    convergent, and every step is two nb x nb MXU GEMMs, so the whole inverse
    is ~2 log2(cond(M)^2 n) dependent matmuls instead of an O(nb)-step LU
    chain.  This is what makes the basis-kernel panel representation cheap:
    the only non-GEMM work left per panel is the (unavoidable) Cholesky of
    the Gram matrix.

    Returns (X, err) where err = ||I - M X_prev||_max from the last accepted
    iterate: err <= tol certifies convergence (the returned X is one
    quadratic step better); err > tol (or NaN) means M was too
    ill-conditioned and the caller must fall back (lu_with_inv).
    """
    n = M.shape[0]
    dt = M.dtype
    if tol is None:
        tol = 2e-4 if dt == jnp.float32 else 3e-8
    eye = jnp.eye(n, dtype=dt)
    # Start: Neumann X0 = 2I - M when M is near I (one Newton step from I;
    # residual (I-M)^2 -- the common case for basis-kernel panels, where
    # I - M = S Q_J has O(1/sqrt(m)) entries and the loop then converges in
    # ~3 iterations).  Otherwise the safe scaled-transpose start.
    a = jnp.max(jnp.sum(jnp.abs(M), axis=0))
    b = jnp.max(jnp.sum(jnp.abs(M), axis=1))
    denom = jnp.maximum(a * b, jnp.asarray(jnp.finfo(dt).tiny, dt))
    E = eye - M
    e2 = jnp.sqrt(jnp.sum(jnp.abs(E), 0).max() * jnp.sum(jnp.abs(E), 1).max())
    X0 = jnp.where(e2 < 0.5, eye + E, (M / denom).T)

    def cond(c):
        _, err, it = c
        return jnp.logical_and(err > tol, it < max_iters)

    def body(c):
        X, _, it = c
        P = jnp.einsum("ij,jk->ik", M, X, precision=precision)
        err = jnp.max(jnp.abs(eye - P))
        X = jnp.einsum("ij,jk->ik", X, 2 * eye - P, precision=precision)
        return X, err, it + 1

    X, err, _ = jax.lax.while_loop(
        cond, body, (X0, jnp.asarray(jnp.inf, dt), jnp.int32(0)))
    return X, err


def lu_with_inv(Y: jnp.ndarray, precision: Precision = _H):
    """(L, U, L^{-1}, U^{-1}) of an unpivoted-LU-safe Y in one recursion."""
    n = Y.shape[0]
    if n <= _BASE:
        L, U = _lu_base(Y)
        return L, U, inv_lower(L, precision), inv_upper(U, precision)
    h = n // 2
    L11, U11, L11i, U11i = lu_with_inv(Y[:h, :h], precision)
    U12 = jnp.einsum("ij,jk->ik", L11i, Y[:h, h:], precision=precision)
    L21 = jnp.einsum("ij,jk->ik", Y[h:, :h], U11i, precision=precision)
    S = Y[h:, h:] - jnp.einsum("ij,jk->ik", L21, U12, precision=precision)
    L22, U22, L22i, U22i = lu_with_inv(S, precision)
    zl = jnp.zeros((h, n - h), Y.dtype)
    zu = jnp.zeros((n - h, h), Y.dtype)
    Lbot = -jnp.einsum("ij,jk,kl->il", L22i, L21, L11i, precision=precision)
    Utop = -jnp.einsum("ij,jk,kl->il", U11i, U12, U22i, precision=precision)
    return (jnp.block([[L11, zl], [L21, L22]]),
            jnp.block([[U11, U12], [zu, U22]]),
            jnp.block([[L11i, zl], [Lbot, L22i]]),
            jnp.block([[U11i, Utop], [zu, U22i]]))


def lu_unpivoted(Y: jnp.ndarray, precision: Precision = _H):
    """Unpivoted LU: Y = L U, L unit-lower, U upper.  2-way recursion:
    U12 = L11^-1 A12, L21 = A21 U11^-1, Schur complement recursion.

    Safe without pivoting only for diagonally-dominant-ish inputs -- which
    the Householder-reconstruction Y = E - Q S guarantees by choosing
    S = -sign(diag(Q)) (|Y_jj| >= 1, Ballard et al. 2014).
    """
    n = Y.shape[0]
    if n <= _BASE:
        return _lu_base(Y)
    h = n // 2
    L11, U11 = lu_unpivoted(Y[:h, :h], precision)
    L11i = inv_lower(L11, precision)
    U11i = inv_upper(U11, precision)
    U12 = jnp.einsum("ij,jk->ik", L11i, Y[:h, h:], precision=precision)
    L21 = jnp.einsum("ij,jk->ik", Y[h:, :h], U11i, precision=precision)
    S = Y[h:, h:] - jnp.einsum("ij,jk->ik", L21, U12, precision=precision)
    L22, U22 = lu_unpivoted(S, precision)
    zl = jnp.zeros((h, n - h), Y.dtype)
    zu = jnp.zeros((n - h, h), Y.dtype)
    L = jnp.block([[L11, zl], [L21, L22]])
    U = jnp.block([[U11, U12], [zu, U22]])
    return L, U


def _lu_base(Y: jnp.ndarray):
    """Statically-unrolled base unpivoted LU (n <= _BASE)."""
    n = Y.shape[0]
    idx = jnp.arange(n)
    for j in range(n):
        piv = Y[j, j]
        col = jnp.where(idx > j, Y[:, j] / piv, 0.0)
        Y = Y - jnp.outer(col, jnp.where(idx > j, Y[j], 0.0))
        Y = Y.at[:, j].set(jnp.where(idx > j, col, Y[:, j]))
    r = jax.lax.broadcasted_iota(jnp.int32, Y.shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, Y.shape, 1)
    L = jnp.where(r > c, Y, 0) + jnp.eye(n, dtype=Y.dtype)
    U = jnp.where(r <= c, Y, 0)
    return L, U
