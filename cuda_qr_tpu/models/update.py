"""QR factorization updating: rank-1 update, row/column insert and delete.

Capability extension beyond the reference (which factors once and stops,
qr.cu:475-553): given a thin factorization A = Q R, produce the factorization
of a modified A in O(mn) -- O(mn + n^2) work instead of the O(mn^2) refactor,
via Givens-rotation chains (Golub & Van Loan SS12.5; Bjorck SS3.2).

TPU shape of the computation: each chain is a ``lax.fori_loop`` whose body
rotates one row pair of the small (n+1) x n working matrix and one column
pair of Q -- O(n) or O(m) VPU work per step, no MXU involvement.  Updating
only beats refactoring when the sequential chain (n steps at ~1 us/XLA op)
is shorter than the refactor's GEMM time, i.e. for modest n or very tall m;
both paths are exact, so callers can choose by measurement.

All functions are jit-compatible and differentiable (pure jnp ops), take and
return *explicit* thin factors (Q: m x n orthonormal columns, R: n x n upper
triangular), and preserve dtype.  Complex factors are supported: rotations
follow the LAPACK clartg convention G = [[c, -s], [conj(s), c]] with real c,
applied as M <- G M / Q <- Q G^H, and ``qr_rank1_update`` computes
A + u v^H (scipy.linalg.qr_update's convention; v^H == v^T for real).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.householder import _h

Precision = jax.lax.Precision


def _givens(a, b):
    """(c, s, r) annihilating b into a: G @ [a, b] = [r, 0] for the unitary
    G = [[c, -s], [conj(s), c]] (c real).  Safe at a = b = 0.

    Real inputs keep the historical convention c = a/r, s = -b/r, r >= 0;
    complex follows clartg: c = |a|/h, s = -(a/|a|) conj(b)/h, r = (a/|a|) h
    with h = sqrt(|a|^2 + |b|^2) -- r carries a's phase.
    """
    if not (jnp.iscomplexobj(a) or jnp.iscomplexobj(b)):
        r = jnp.hypot(a, b)
        safe = r > 0
        rs = jnp.where(safe, r, 1)
        c = jnp.where(safe, a / rs, 1)
        s = jnp.where(safe, -b / rs, 0)
        return c, s, jnp.where(safe, r, a)
    absa = jnp.abs(a)
    h = jnp.sqrt(absa * absa + jnp.abs(b) ** 2)
    safe = h > 0
    hs = jnp.where(safe, h, 1)
    siga = jnp.where(absa > 0, a / jnp.where(absa > 0, absa, 1), 1)
    c = jnp.where(safe, absa / hs, 1)          # real
    s = jnp.where(safe, -siga * jnp.conj(b) / hs, 0)
    return c, s, jnp.where(safe, siga * h, a)


def _rot_rows(M, i, j, c, s):
    """Left-apply G to rows (i, j) of M (i, j may be traced)."""
    ri = jax.lax.dynamic_slice_in_dim(M, i, 1, 0)
    rj = jax.lax.dynamic_slice_in_dim(M, j, 1, 0)
    M = jax.lax.dynamic_update_slice_in_dim(M, c * ri - s * rj, i, 0)
    return jax.lax.dynamic_update_slice_in_dim(M, _h(s) * ri + c * rj, j, 0)


def _rot_cols(Q, i, j, c, s):
    """Right-apply (Q <- Q G^H) to columns (i, j) of Q."""
    qi = jax.lax.dynamic_slice_in_dim(Q, i, 1, 1)
    qj = jax.lax.dynamic_slice_in_dim(Q, j, 1, 1)
    Q = jax.lax.dynamic_update_slice_in_dim(Q, c * qi - _h(s) * qj, i, 1)
    return jax.lax.dynamic_update_slice_in_dim(Q, s * qi + c * qj, j, 1)


def _at(v, i):
    return jax.lax.dynamic_index_in_dim(v, i, keepdims=False)


def _orthogonal_complement(Q, u, precision):
    """(w, Q^H u, ||residual||): w is the unit residual of u against span(Q)
    (zero when u already lies in the span -- the chains below then never mix
    the dead column in, because its Givens weight is zero)."""
    w = jnp.einsum("ij,i->j", _h(Q), u, precision=precision)
    r = u - jnp.einsum("ij,j->i", Q, w, precision=precision)
    rho = jnp.linalg.norm(r)
    safe = rho > 0
    q = jnp.where(safe, r / jnp.where(safe, rho, 1), 0)
    return q, w, jnp.where(safe, rho, 0)


@partial(jax.jit, static_argnames=("precision",))
def qr_rank1_update(Q: jnp.ndarray, R: jnp.ndarray, u: jnp.ndarray,
                    v: jnp.ndarray,
                    precision: Precision = Precision.HIGHEST):
    """Thin QR of A + u v^H (v^H == v^T for real) from the thin QR of A
    (m x n, m >= n).

    Algorithm (G&VL 12.5.1): with w = Q^H u, q the unit residual and
    rho its norm, A + u v^H = [Q q] ([[R], [0]] + [w; rho] v^H).  A bottom-up
    Givens chain maps [w; rho] to tau e_0 and [[R], [0]] to upper
    Hessenberg; adding (tau e_0) v^H touches row 0 only; a top-down chain
    restores triangularity.  2n rotations, O(mn + n^2) total.
    """
    m, n = Q.shape
    q, w, rho = _orthogonal_complement(Q, u.astype(Q.dtype), precision)
    Q1 = jnp.concatenate([Q, q[:, None]], axis=1)
    M = jnp.concatenate([R, jnp.zeros((1, n), R.dtype)], axis=0)
    we = jnp.concatenate([w, rho.astype(w.dtype)[None]])

    def up(t, carry):
        M, Q1, we = carry
        i = jnp.int32(n - 1) - jnp.asarray(t, jnp.int32)
        c, s, r = _givens(_at(we, i), _at(we, i + 1))
        we = jax.lax.dynamic_update_slice_in_dim(we, r[None], i, 0)
        we = jax.lax.dynamic_update_slice_in_dim(
            we, jnp.zeros((1,), we.dtype), i + 1, 0)
        return _rot_rows(M, i, i + 1, c, s), _rot_cols(Q1, i, i + 1, c, s), we

    M, Q1, we = jax.lax.fori_loop(0, n, up, (M, Q1, we))
    M = M.at[0].add(we[0] * _h(v.astype(M.dtype)))

    def down(i, carry):
        M, Q1 = carry
        i = jnp.asarray(i, jnp.int32)
        a = _at(_at(M, i), i)
        b = _at(_at(M, i + 1), i)
        c, s, _ = _givens(a, b)
        return _rot_rows(M, i, i + 1, c, s), _rot_cols(Q1, i, i + 1, c, s)

    M, Q1 = jax.lax.fori_loop(0, n, down, (M, Q1))
    return Q1[:, :n], jnp.triu(M[:n])


@partial(jax.jit, static_argnames=("precision",))
def qr_update(Q: jnp.ndarray, R: jnp.ndarray, u: jnp.ndarray,
              v: jnp.ndarray, precision: Precision = Precision.HIGHEST):
    """Thin QR of A + u v^H (rank-1) or A + U V^H (rank-k, U (m, k),
    V (n, k)) -- scipy.linalg.qr_update's surface.

    Rank-k runs k sequential rank-1 chains under lax.scan: the O(k n)
    rotation chain is the same work as the blocked algorithm and keeps one
    code path; for k approaching n/2 a refactor of Q R + U V^H is cheaper.
    """
    if u.ndim == 1:
        return qr_rank1_update(Q, R, u, v, precision)
    if u.ndim != 2 or v.ndim != 2 or u.shape[1] != v.shape[1]:
        raise ValueError(
            f"rank-k update needs U (m, k), V (n, k); got {u.shape} {v.shape}")

    def step(carry, uv):
        Q, R = carry
        ui, vi = uv
        Q, R = qr_rank1_update(Q, R, ui, vi, precision)
        return (Q, R), None

    (Q, R), _ = jax.lax.scan(step, (Q, R), (u.T, v.T))
    return Q, R


@partial(jax.jit, static_argnames=("k",))
def qr_row_insert(Q: jnp.ndarray, R: jnp.ndarray, a: jnp.ndarray,
                  k: int | None = None):
    """Thin QR of A with row ``a`` inserted before row k (default: appended).

    Append first -- [[A], [a]] = diag(Q, 1) @ [[R], [a]] -- then one
    left-to-right Givens chain folds the full bottom row into R (n rotations);
    the insertion position only permutes rows of Q afterwards.
    """
    m, n = Q.shape
    if k is None:
        k = m
    Q1 = jnp.pad(Q, ((0, 1), (0, 1)))
    Q1 = Q1.at[m, n].set(jnp.ones((), Q.dtype))
    M = jnp.concatenate([R, a.astype(R.dtype)[None]], axis=0)

    def body(i, carry):
        M, Q1 = carry
        i = jnp.asarray(i, jnp.int32)
        c, s, _ = _givens(_at(_at(M, i), i), _at(_at(M, n), i))
        return _rot_rows(M, i, jnp.int32(n), c, s), \
            _rot_cols(Q1, i, jnp.int32(n), c, s)

    M, Q1 = jax.lax.fori_loop(0, n, body, (M, Q1))
    Qn = Q1[:, :n]
    perm = jnp.concatenate(
        [jnp.arange(k), jnp.array([m]), jnp.arange(k, m)])
    return Qn[perm], jnp.triu(M[:n])


@partial(jax.jit, static_argnames=("k", "precision"))
def qr_row_delete(Q: jnp.ndarray, R: jnp.ndarray, k: int,
                  precision: Precision = Precision.HIGHEST):
    """Thin QR of A with row k removed (downdating); requires m > n.

    Bjorck 3.2.4: extend Q with the unit residual w of e_k (so the extended
    row k is [q, gamma] with unit norm); a right-to-left Givens chain rotates
    that row onto e_n, after which column n of the rotated basis is exactly
    e_k, row k of the shrunken Q is zero, and dropping both leaves the
    orthonormal factor of the deleted-row matrix.
    """
    m, n = Q.shape
    if m <= n:
        raise ValueError(
            f"row_delete needs m > n (thin QR after deletion), got {m}x{n}")
    ek = jnp.zeros((m,), Q.dtype).at[k].set(1)
    w, q, _rho = _orthogonal_complement(Q, ek, precision)
    Qe = jnp.concatenate([Q, w[:, None]], axis=1)
    M = jnp.concatenate([R, jnp.zeros((1, n), R.dtype)], axis=0)
    # gamma^2 = 1 - ||q||^2 (real also for complex Q: rho = w[k], see Bjorck)
    gamma = jnp.sqrt(jnp.maximum(1 - jnp.sum(jnp.abs(q) ** 2), 0))
    qe = jnp.concatenate([q, gamma.astype(q.dtype)[None]])

    def body(t, carry):
        M, Qe, qe = carry
        i = jnp.int32(n - 1) - jnp.asarray(t, jnp.int32)
        c, s, r = _givens(_at(qe, n), _at(qe, i))
        qe = jax.lax.dynamic_update_slice_in_dim(qe, r[None], jnp.int32(n), 0)
        qe = jax.lax.dynamic_update_slice_in_dim(
            qe, jnp.zeros((1,), qe.dtype), i, 0)
        return _rot_rows(M, jnp.int32(n), i, c, s), \
            _rot_cols(Qe, jnp.int32(n), i, c, s), qe

    M, Qe, qe = jax.lax.fori_loop(0, n, body, (M, Qe, qe))
    keep = jnp.concatenate([jnp.arange(k), jnp.arange(k + 1, m)])
    return Qe[keep, :n], jnp.triu(M[:n])


@partial(jax.jit, static_argnames=("k", "precision"))
def qr_col_insert(Q: jnp.ndarray, R: jnp.ndarray, a: jnp.ndarray, k: int,
                  precision: Precision = Precision.HIGHEST):
    """Thin QR of A with column ``a`` inserted before column k; needs m > n.

    The new column contributes [Q^T a; rho] in the extended basis; columns
    right of k are upper Hessenberg after the shift, and a single bottom-up
    chain of n - k rotations on column k restores triangularity for all of
    them at once.
    """
    m, n = Q.shape
    if m <= n:
        raise ValueError(
            f"col_insert needs m > n to extend the basis, got {m}x{n}")
    q, w, rho = _orthogonal_complement(Q, a.astype(Q.dtype), precision)
    Q1 = jnp.concatenate([Q, q[:, None]], axis=1)
    Rp = jnp.pad(R, ((0, 1), (0, 0)))
    newcol = jnp.concatenate([w, rho.astype(w.dtype)[None]])[:, None]
    M = jnp.concatenate([Rp[:, :k], newcol, Rp[:, k:]], axis=1)

    def body(t, carry):
        M, Q1 = carry
        i = jnp.int32(n - 1) - jnp.asarray(t, jnp.int32)
        a_ = _at(_at(M, i), k)
        b_ = _at(_at(M, i + 1), k)
        c, s, _ = _givens(a_, b_)
        return _rot_rows(M, i, i + 1, c, s), _rot_cols(Q1, i, i + 1, c, s)

    M, Q1 = jax.lax.fori_loop(0, n - k, body, (M, Q1))
    return Q1, jnp.triu(M)


@partial(jax.jit, static_argnames=("k",))
def qr_col_delete(Q: jnp.ndarray, R: jnp.ndarray, k: int):
    """Thin QR of A with column k removed.

    Dropping column k of R leaves an upper Hessenberg matrix in columns
    k..n-2; one left-to-right chain of n - 1 - k rotations re-triangularizes,
    and the last column/row pair of the factors falls away.
    """
    m, n = Q.shape
    M = jnp.concatenate([R[:, :k], R[:, k + 1:]], axis=1)

    def body(j, carry):
        M, Q = carry
        j = jnp.asarray(j, jnp.int32)
        c, s, _ = _givens(_at(_at(M, j), j), _at(_at(M, j + 1), j))
        return _rot_rows(M, j, j + 1, c, s), _rot_cols(Q, j, j + 1, c, s)

    M, Q = jax.lax.fori_loop(k, n - 1, body, (M, Q))
    return Q[:, :n - 1], jnp.triu(M[:n - 1])
