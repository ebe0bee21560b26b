"""QR-powered spectral tools: orth / randomized SVD / randomized norm.

The reference stops at the factorization; everything here is what a QR
library is *for* on TPU: the randomized range finder (Halko, Martinsson &
Tropp 2011) is two tall GEMMs plus thin QRs -- exactly the shapes the
TSQR/CholeskyQR2 paths (models/tsqr.py) drive at MXU speed, and the only
dense SVD ever taken is of a small (k+p) square core on the host-precision
path XLA already lowers well.

  orth(A)          orthonormal basis of range(A) (thin Q; rank-revealing
                   truncation via QRCP when rcond is given)
  rsvd(A, k)       rank-k randomized SVD: A ~= U @ diag(s) @ Vt
  norm2_est(A)     randomized spectral-norm estimate (power iteration on
                   A^T A with QR re-orthonormalization)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.hostio import to_device
from .qr import qr
from .tsqr import tsqr


def _thin_qr(Y, config: QRConfig):
    """Thin Q of a tall block: TSQR when it fits the tall-skinny path,
    blocked Householder otherwise."""
    m, n = Y.shape
    if n <= config.panel_width and m >= 2 * n:
        return tsqr(Y, config)[0]
    return qr(Y, config, mode="reduced")[0]


def orth(A, rcond: float | None = None, config: QRConfig = DEFAULT_CONFIG):
    """Orthonormal basis of range(A) (scipy.linalg.orth analog, QR-based).

    rcond=None: thin Q of A (full column count, requires m >= n).
    rcond given: rank-revealing basis -- QRCP runs until the first diagonal
    of R falls below rcond * |R[0,0]|, and only those columns of Q return.
    """
    A = to_device(A)
    if rcond is None:
        return _thin_qr(A, config)
    from ..ops.blocked import orgqr
    from .rank import _qrcp_with_rank
    factors, _, _, r, config = _qrcp_with_rank(A, config, rcond)
    r = max(r, 1)  # a zero matrix still has a (trivial) 1-col basis slot
    kb = factors.packed.shape[1]
    return orgqr(factors, A.shape[0], kb, config)[:, :r]


def rsvd(A, k: int, p: int = 8, n_iter: int = 2, key=None,
         config: QRConfig = DEFAULT_CONFIG):
    """Randomized rank-k SVD (HMT 2011, Alg. 4.4 + 5.1): returns (U, s, Vt)
    with U (m x k), s (k,), Vt (k x n) and A ~= U @ diag(s) @ Vt.

    Sketch width k+p; n_iter power iterations with QR re-orthonormalization
    between applications (stabilized subspace iteration) sharpen the
    spectral decay.  All large ops are (m x n)(n x k)-shaped GEMMs and thin
    QRs; the dense SVD is of the (k+p) x n projection's small core only.

    Works for m >= n and m < n alike (the wide case factors through A^T at
    the GEMM level, not by transposing storage).
    """
    A = to_device(A)
    m, n = A.shape
    ell = min(k + p, min(m, n))
    if not 1 <= k <= min(m, n):
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"rank k must be in [1, {min(m, n)}], got {k}")
    if key is None:
        key = jax.random.PRNGKey(12)  # the reference's srand(12), qr.cu:765
    prec = config.precision
    real_dtype = jnp.float64 if A.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32

    def mm(X, Y):
        return jnp.einsum("ij,jk->ik", X, Y, precision=prec)

    ct = (lambda X: X.conj().T) if jnp.iscomplexobj(A) else (lambda X: X.T)

    Om = jax.random.normal(key, (n, ell), dtype=real_dtype).astype(A.dtype)
    Y = mm(A, Om)
    Q = _thin_qr(Y, config)
    for _ in range(n_iter):
        Q = _thin_qr(mm(ct(A), Q), config)
        Q = _thin_qr(mm(A, Q), config)
    B = mm(ct(Q), A)                       # (ell x n) projection
    # small-core SVD: XLA lowers (ell x n) SVD via its own bidiagonal path;
    # ell << n keeps it cheap relative to the sketch GEMMs
    Ub, s, Vt = jnp.linalg.svd(B, full_matrices=False)
    U = mm(Q, Ub)
    return U[:, :k], s[:k], Vt[:k]


def eigh_rand(A, k: int, p: int = 8, n_iter: int = 2, key=None,
              config: QRConfig = DEFAULT_CONFIG):
    """Randomized rank-k eigendecomposition of a symmetric/Hermitian A.

    Returns (w (k,), V (m x k)) with A ~= V @ diag(w) @ V^H, eigenpairs
    ordered by descending |w| (the dominant pairs the sketch captures --
    works for indefinite A, unlike a Nystrom approximation).

    Range finder as in rsvd() -- for symmetric A each power step is one
    GEMM + thin QR, not two -- followed by Rayleigh-Ritz on the (ell x ell)
    compression T = Q^H A Q: the only dense eigensolve is of the small
    core.  All large ops are (m x m)(m x ell) GEMMs and thin QRs on the
    TSQR/CholeskyQR2 path.

    NOTE on n_iter semantics: here n_iter counts SINGLE applications of A
    (n_iter + 1 total, exploiting symmetry), whereas rsvd(n_iter=q) on the
    same symmetric input applies A effectively 2q + 1 times.  For
    comparable spectral sharpening on slowly decaying spectra, pass roughly
    double the n_iter you would give rsvd -- each application still costs
    half as much.
    """
    A = to_device(A)
    m, n = A.shape
    if m != n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"eigh_rand needs a square matrix, got {A.shape}")
    ell = min(k + p, m)
    if not 1 <= k <= m:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"rank k must be in [1, {m}], got {k}")
    if key is None:
        key = jax.random.PRNGKey(12)  # the reference's srand(12), qr.cu:765
    prec = config.precision
    real_dtype = jnp.float64 if A.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32

    def mm(X, Y):
        return jnp.einsum("ij,jk->ik", X, Y, precision=prec)

    ct = (lambda X: X.conj().T) if jnp.iscomplexobj(A) else (lambda X: X.T)

    Om = jax.random.normal(key, (m, ell), dtype=real_dtype).astype(A.dtype)
    Q = _thin_qr(mm(A, Om), config)
    for _ in range(n_iter):                 # A = A^H: one GEMM per step
        Q = _thin_qr(mm(A, Q), config)
    AQ = mm(A, Q)
    T = mm(ct(Q), AQ)                       # (ell x ell) Rayleigh quotient
    T = 0.5 * (T + ct(T))                   # re-symmetrize roundoff
    w, S = jnp.linalg.eigh(T)               # ascending, real w
    order = jnp.argsort(-jnp.abs(w))[:k]
    return w[order], mm(Q, S[:, order])


def norm2_est(A, n_iter: int = 8, key=None,
              config: QRConfig = DEFAULT_CONFIG):
    """Randomized spectral-norm estimate via block power iteration (block
    size 4) with QR re-orthonormalization; a lower bound converging at
    rate (s2/s1)^(2*n_iter)."""
    A = to_device(A)
    m, n = A.shape
    b = min(4, n)
    if key is None:
        key = jax.random.PRNGKey(12)
    prec = config.precision
    ct = (lambda X: X.conj().T) if jnp.iscomplexobj(A) else (lambda X: X.T)
    real_dtype = jnp.float64 if A.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    X = jax.random.normal(key, (n, b), dtype=real_dtype).astype(A.dtype)

    def body(_, X):
        Y = jnp.einsum("ij,jk->ik", A, X, precision=prec)
        Z = jnp.einsum("ij,jk->ik", ct(A), Y, precision=prec)
        # re-orthonormalize via the Gram Cholesky (b is tiny)
        G = jnp.einsum("ij,ik->jk", Z.conj(), Z, precision=prec)
        L = jnp.linalg.cholesky(G + jnp.finfo(real_dtype).tiny * jnp.eye(
            b, dtype=G.dtype))
        # Q = Z L^{-H}  =>  Q^T = solve(conj(L), Z^T)
        return jax.scipy.linalg.solve_triangular(
            L.conj(), Z.T, lower=True).T.astype(A.dtype)

    X = jax.lax.fori_loop(0, n_iter, body, X)
    Y = jnp.einsum("ij,jk->ik", A, X, precision=prec)
    s = jnp.linalg.norm(Y, axis=0) / jnp.maximum(
        jnp.linalg.norm(X, axis=0), jnp.finfo(real_dtype).tiny)
    return jnp.max(s.real)


def rsvd_dist(A, k: int, mesh, p: int = 8, n_iter: int = 2, key=None,
              config: QRConfig = DEFAULT_CONFIG):
    """Distributed randomized rank-k SVD of a row-sharded tall matrix.

    Same algorithm as rsvd(), with the tall factors living on the mesh:
    the sketch/projection GEMMs are shard-local, the thin QRs of tall
    blocks go through tsqr_dist (allreduce-CholeskyQR2 combine), and the
    small n x ell / ell x n intermediates are replicated via psum -- per
    power iteration the wire carries O(n*ell + ell^2) words, never a row
    of A.  Returns (U (m x k) row-sharded, s (k,), Vt (k x n) replicated).

    Needs m % P == 0.  Complex input routes the thin QRs to tsqr_dist's
    allgather (Householder) combine; the psum'd projections conjugate.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as SpecP
    from ..parallel.mesh import ROW_AXIS, row_sharding
    from ..parallel.tsqr_dist import tsqr_dist

    A = jnp.asarray(A)
    m, n = A.shape
    P_ = mesh.shape[ROW_AXIS]
    ell = min(k + p, min(m, n))
    if not 1 <= k <= min(m, n):
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"rank k must be in [1, {min(m, n)}], got {k}")
    if m % P_:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"rsvd_dist needs m % P == 0; "
                           f"got {m} rows on {P_} shards")
    if jnp.iscomplexobj(A):
        config = config.replace(dtype=A.dtype, use_pallas=False,
                                use_chol_kernel=False,
                                tsqr_leaf="householder")
    elif A.dtype == jnp.float64:
        # Match the single-device rsvd: float64 inputs keep their precision
        # instead of being silently downcast to config.dtype.
        config = config.replace(dtype=A.dtype)
    if key is None:
        key = jax.random.PRNGKey(12)
    prec = config.precision
    A = jax.device_put(A.astype(config.dtype), row_sharding(mesh))

    def local_mm(a, x):            # (mloc, n) @ (n, ell), row-sharded out
        return jnp.einsum("ij,jk->ik", a, x, precision=prec)

    def reduced_tmm(a, q):         # psum of A_i^H Q_i: (n, ell)
        return jax.lax.psum(
            jnp.einsum("ji,jk->ik", a.conj(), q, precision=prec), ROW_AXIS)

    shard_mm = shard_map(local_mm, mesh=mesh,
                         in_specs=(SpecP(ROW_AXIS, None), SpecP()),
                         out_specs=SpecP(ROW_AXIS, None), check_vma=False)
    shard_tmm = shard_map(reduced_tmm, mesh=mesh,
                          in_specs=(SpecP(ROW_AXIS, None),
                                    SpecP(ROW_AXIS, None)),
                          out_specs=SpecP(), check_vma=False)

    cplx = jnp.iscomplexobj(A)
    strategy = "allgather" if cplx else "cholesky"
    Om = jax.random.normal(key, (n, ell), dtype=jnp.float32).astype(A.dtype)
    Q = tsqr_dist(shard_mm(A, Om), mesh, config, strategy=strategy)[0]
    for _ in range(n_iter):
        Z = qr(shard_tmm(A, Q), config, mode="reduced")[0]  # replicated
        Q = tsqr_dist(shard_mm(A, Z), mesh, config, strategy=strategy)[0]
    B = shard_tmm(A, Q).conj().T                            # (ell, n) = Q^H A
    Ub, s, Vt = jnp.linalg.svd(B, full_matrices=False)
    U = shard_mm(Q, Ub)
    return U[:, :k], s[:k], Vt[:k]


def eigh_rand_dist(A, k: int, mesh, p: int = 8, n_iter: int = 2, key=None,
                   config: QRConfig = DEFAULT_CONFIG):
    """Distributed randomized rank-k eigendecomposition of a row-sharded
    symmetric/Hermitian A (m x m, m % P == 0).

    Same communication shape as rsvd_dist: sketch GEMMs are shard-local,
    thin QRs of tall iterates go through tsqr_dist, and the only replicated
    intermediates are (m x ell) psum results and the (ell x ell) Rayleigh
    quotient -- no row of A ever crosses the wire.  Symmetry halves the
    power-iteration GEMMs: A^H Q (one psum) IS the next A-application.
    Returns (w (k,), V (m x k) row-sharded), ordered by descending |w|.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as SpecP
    from ..parallel.mesh import ROW_AXIS, row_sharding
    from ..parallel.tsqr_dist import tsqr_dist

    A = jnp.asarray(A)
    m, n = A.shape
    P_ = mesh.shape[ROW_AXIS]
    if m != n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"eigh_rand_dist needs a square matrix, "
                           f"got {A.shape}")
    ell = min(k + p, m)
    if not 1 <= k <= m:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"rank k must be in [1, {m}], got {k}")
    if m % P_:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"eigh_rand_dist needs m % P == 0; "
                           f"got {m} rows on {P_} shards")
    cplx = jnp.iscomplexobj(A)
    if cplx:
        config = config.replace(dtype=A.dtype, use_pallas=False,
                                use_chol_kernel=False,
                                tsqr_leaf="householder")
    elif A.dtype == jnp.float64:
        # Preserve float64 like the single-device eigh_rand does instead of
        # silently downcasting to config.dtype (narrower inputs still widen
        # to config.dtype, which loses nothing).
        config = config.replace(dtype=A.dtype)
    if key is None:
        key = jax.random.PRNGKey(12)
    prec = config.precision
    shard = row_sharding(mesh)
    A = jax.device_put(A.astype(config.dtype), shard)

    def local_mm(a, x):            # (mloc, m) @ (m, ell), row-sharded out
        return jnp.einsum("ij,jk->ik", a, x, precision=prec)

    def reduced_tmm(a, q):         # psum of A_i^H Q_i: (m, ell) replicated
        return jax.lax.psum(
            jnp.einsum("ji,jk->ik", a.conj(), q, precision=prec), ROW_AXIS)

    def reduced_gram(q, w):        # psum of Q_i^H W_i: (ell, ell)
        return jax.lax.psum(
            jnp.einsum("ji,jk->ik", q.conj(), w, precision=prec), ROW_AXIS)

    shard_mm = shard_map(local_mm, mesh=mesh,
                         in_specs=(SpecP(ROW_AXIS, None), SpecP()),
                         out_specs=SpecP(ROW_AXIS, None), check_vma=False)
    shard_tmm = shard_map(reduced_tmm, mesh=mesh,
                          in_specs=(SpecP(ROW_AXIS, None),
                                    SpecP(ROW_AXIS, None)),
                          out_specs=SpecP(), check_vma=False)
    shard_gram = shard_map(reduced_gram, mesh=mesh,
                           in_specs=(SpecP(ROW_AXIS, None),
                                     SpecP(ROW_AXIS, None)),
                           out_specs=SpecP(), check_vma=False)

    strategy = "allgather" if cplx else "cholesky"
    Om = jax.random.normal(key, (m, ell), dtype=jnp.float32).astype(A.dtype)
    Q = tsqr_dist(shard_mm(A, Om), mesh, config, strategy=strategy)[0]
    for _ in range(n_iter):
        W = shard_tmm(A, Q)                      # = A Q (A Hermitian)
        Q = tsqr_dist(jax.device_put(W, shard), mesh, config,
                      strategy=strategy)[0]
    AQ = jax.device_put(shard_tmm(A, Q), shard)  # (m, ell) row-sharded
    T = shard_gram(Q, AQ)                        # (ell, ell) Rayleigh
    ct = (lambda X: X.conj().T) if cplx else (lambda X: X.T)
    T = 0.5 * (T + ct(T))
    w, S = jnp.linalg.eigh(T)
    order = jnp.argsort(-jnp.abs(w))[:k]
    return w[order], jnp.einsum("ij,jk->ik", Q, S[:, order], precision=prec)


def cond_est(A, n_iter: int = 12, key=None,
             config: QRConfig = DEFAULT_CONFIG):
    """2-norm condition number estimate of A (m >= n, full rank) via QR.

    cond2(A) = cond2(R) (Q is orthogonal): one factorization, then block
    power iteration on R^T R for sigma_max and on R^{-1} R^{-T} (two
    triangular solves per step -- R is never inverted) for sigma_min.
    Both iterates are lower bounds of their targets, so the estimate
    approaches cond2(A) from below; numpy.linalg.cond needs a full SVD.
    """
    from .qr import qr
    A = to_device(A)
    m, n = A.shape
    if m < n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"cond_est needs m >= n, got {A.shape}")
    R = qr(A, config, mode="r")
    if key is None:
        key = jax.random.PRNGKey(12)
    smax = norm2_est(R, n_iter=n_iter, key=key, config=config)

    # sigma_min(R) = 1 / ||R^{-1}||_2: power-iterate z -> R^{-1} R^{-T} z
    prec = config.precision
    ct = (lambda X: X.conj().T) if jnp.iscomplexobj(R) else (lambda X: X.T)
    real_dtype = jnp.float64 if R.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    b = min(4, n)
    X = jax.random.normal(jax.random.fold_in(key, 1), (n, b),
                          dtype=real_dtype).astype(R.dtype)

    import jax.scipy.linalg as jsl

    def body(_, X):
        Y = jsl.solve_triangular(ct(R), X, lower=True)    # R^{-T} X
        Z = jsl.solve_triangular(R, Y, lower=False)       # R^{-1} Y
        G = jnp.einsum("ij,ik->jk", Z.conj(), Z, precision=prec)
        L = jnp.linalg.cholesky(G + jnp.finfo(real_dtype).tiny
                                * jnp.eye(b, dtype=G.dtype))
        return jsl.solve_triangular(L.conj(), Z.T, lower=True).T.astype(
            R.dtype)

    X = jax.lax.fori_loop(0, n_iter, body, X)
    Y = jsl.solve_triangular(ct(R), X, lower=True)
    Z = jsl.solve_triangular(R, Y, lower=False)
    inv_norm_sq = jnp.max(
        jnp.linalg.norm(Z, axis=0) / jnp.maximum(
            jnp.linalg.norm(X, axis=0), jnp.finfo(real_dtype).tiny))
    # one (R^-1 R^-T) application grows vectors by sigma_min^{-2}
    smin = 1.0 / jnp.sqrt(inv_norm_sq)
    return (smax / smin).real
