"""Polar decomposition A = U H by QR-based dynamically weighted Halley (QDWH).

Beyond-parity capability on top of the blocked-QR core (the reference stops
at the factorization itself, qr.cu:475-553): QDWH (Nakatsukasa, Bai & Gygi
2010; Nakatsukasa & Higham 2013) computes the unitary polar factor with a
cubically convergent Halley iteration whose building blocks are exactly this
library's hot paths -- a tall stacked QR per early iteration and a few n x n
GEMMs + one small Cholesky per late iteration.  Everything maps to the MXU;
there is no SVD anywhere.

TPU-first design choice: the Halley weights (a_k, b_k, c_k) depend only on
the scalar lower bound l_k of sigma_min(X_k), and l_0 is chosen *statically*
from the dtype (a floor just below machine eps, valid for any numerically
nonsingular input).  The whole weight schedule -- including the QR-step vs
Cholesky-step switch (c_k > 100, the standard stability threshold) and the
iteration count -- is therefore computed at trace time in Python floats, so
the jitted program is a fixed straight-line sequence of GEMM/QR/Cholesky
stages with no data-dependent control flow (SURVEY.md S7's "compile-time
config" stance).  The price of the pessimistic l_0 is at most one extra
iteration (schedule length grows ~log log(1/l0)).

Iteration (X_0 = A/alpha, alpha >= ||A||_2):
    QR step:    [Q1; Q2] R = qr([sqrt(c) X; I]);
                X <- (b/c) X + (1/sqrt(c)) (a - b/c) Q1 Q2^H
    Chol step:  Z = I + c X^H X;  W = chol(Z);
                X <- (b/c) X + (a - b/c) (X W^{-H}) W^{-1}
Both are algebraically X (aI + b X^H X)(I + c X^H X)^{-1}; the QR form is
inverse-free and stable for the huge early c_k, the Cholesky form costs
~half once c_k is O(1).  Complex input uses QR steps throughout (the fused
small-Cholesky recursion is real-only; the Householder core is cgeqrf-
convention complex-safe).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.householder import _einsum, _h
from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.errors import QRShapeError
from ..utils.hostio import to_device
from .qr import qr
from .tsqr import tsqr

_CHOL_C_MAX = 100.0  # Nakatsukasa-Higham switch: Chol step is stable below


def _qdwh_schedule(l0: float, eps: float, max_iter: int = 24):
    """Static (a, b, c, use_qr) weight schedule from the scalar recurrence.

    l0 is a lower bound for sigma_min(X0) in (0, 1]; the recurrence
    l <- l (a + b l^2)/(1 + c l^2) converges to 1 cubically, so ~6 steps
    cover l0 = 1e-17.  Stops once |1 - l| <= 5 eps (the iteration is then a
    no-op to working precision).
    """
    steps = []
    l = min(max(l0, 1e-17), 1.0)
    for _ in range(max_iter):
        if 1.0 - l <= 5.0 * eps:
            break
        l2 = l * l
        d = (4.0 * (1.0 - l2) / (l2 * l2)) ** (1.0 / 3.0)
        sq = math.sqrt(1.0 + d)
        a = sq + 0.5 * math.sqrt(8.0 - 4.0 * d + 8.0 * (2.0 - l2) / (l2 * sq))
        b = (a - 1.0) ** 2 / 4.0
        c = a + b - 1.0
        steps.append((a, b, c, c > _CHOL_C_MAX))
        l = l * (a + b * l2) / (1.0 + c * l2)
    return steps


def _thin_q2(Y, config: QRConfig):
    """Thin Q of the stacked (m+n) x n QDWH matrix."""
    m, n = Y.shape
    if (n <= config.panel_width and m >= 2 * n
            and not jnp.iscomplexobj(Y)):
        return tsqr(Y, config)[0]
    return qr(Y, config, mode="reduced")[0]


def _qdwh_core(X, schedule, config: QRConfig, prec):
    """Run the static QDWH schedule on X (m x n, spectrum in [l0, 1])."""
    m, n = X.shape
    dt = X.dtype
    cplx = jnp.iscomplexobj(X)
    eye = jnp.eye(n, dtype=dt)
    for a, b, c, use_qr in schedule:
        bc = b / c
        if use_qr or cplx:
            sc = math.sqrt(c)
            stacked = jnp.concatenate([(sc * X.astype(dt)), eye], axis=0)
            Q = _thin_q2(stacked, config)
            Q1, Q2 = Q[:m], Q[m:]
            X = (bc * X
                 + ((a - bc) / sc) * _einsum("ik,jk->ij", Q1, _h(Q2),
                                             precision=prec)).astype(dt)
        else:
            from ..ops.smalllinalg import chol_with_inv_auto
            G = _einsum("ki,kj->ij", _h(X), X, precision=prec)
            Z = eye + jnp.asarray(c, dt) * G
            _, Li = chol_with_inv_auto(Z, precision=prec, config=config)
            # X Z^{-1} = (X L^{-H}) L^{-1}  with  Z = L L^H
            XL = _einsum("ik,jk->ij", X, _h(Li), precision=prec)
            X = (bc * X
                 + (a - bc) * _einsum("ik,kj->ij", XL, Li,
                                      precision=prec)).astype(dt)
    return X


@partial(jax.jit, static_argnames=("schedule", "config"))
def _qdwh_jit(X, schedule, config: QRConfig):
    prec = config.precision
    U = _qdwh_core(X, schedule, config, prec)
    return U


def _halley_weights(l, rdt):
    """Dynamic Halley weights (a, b, c) from the scalar bound l.

    Factored so every intermediate stays in fp32 range for l >= ~1e-12:
    the textbook form computes l^4 (underflows fp32 below l ~ 1e-9), so
    d = cbrt(4(1-l^2)) * exp(-4/3 log l) instead.
    """
    l = jnp.clip(l.astype(rdt), jnp.asarray(1e-12, rdt), jnp.asarray(1.0, rdt))
    l2 = l * l
    d = jnp.cbrt(4.0 * (1.0 - l2)) * jnp.exp(
        jnp.asarray(-4.0 / 3.0, rdt) * jnp.log(l))
    sq = jnp.sqrt(1.0 + d)
    a = sq + 0.5 * jnp.sqrt(
        jnp.maximum(8.0 - 4.0 * d + 8.0 * (2.0 - l2) / (l2 * sq), 0.0))
    b = (a - 1.0) ** 2 / 4.0
    c = a + b - 1.0
    return a, b, c


def _qdwh_dyn_core(X, l0, config: QRConfig, prec):
    """Dynamic-weight QDWH polar iteration (device-side scalar recurrence).

    Unlike ``_qdwh_core`` (whose weight schedule is unrolled at trace time
    -- one stacked-QR program instance per step), this traces ONE QR step
    and ONE Cholesky step under two ``lax.while_loop`` phases, carrying the
    lower bound l as a device scalar.  Built for callers that instantiate
    QDWH at many shapes inside a larger jitted program (the on-chip eigh
    divide-and-conquer), where per-step unrolling multiplies compile time.
    Iteration count at runtime matches the static schedule for the same l0.

    X: (m, n) scaled so its singular values lie in (l_true, 1]; l0: device
    scalar lower bound for sigma_min(X) (pessimistic is fine -- extra
    iterations are no-ops once l reaches 1).
    """
    m, n = X.shape
    dt = X.dtype
    cplx = jnp.iscomplexobj(X)
    rdt = jnp.float64 if dt in (jnp.float64, jnp.complex128) else jnp.float32
    eps = jnp.asarray(jnp.finfo(rdt).eps, rdt)
    eye = jnp.eye(n, dtype=dt)
    l0 = jnp.asarray(l0, rdt)

    def qr_step(X, a, b, c):
        bc = b / c
        sc = jnp.sqrt(c)
        stacked = jnp.concatenate([(sc.astype(dt) * X), eye], axis=0)
        Q = _thin_q2(stacked, config)
        Q1, Q2 = Q[:m], Q[m:]
        return (bc.astype(dt) * X
                + ((a - bc) / sc).astype(dt)
                * _einsum("ik,jk->ij", Q1, _h(Q2), precision=prec)).astype(dt)

    def chol_step(X, a, b, c):
        from ..ops.smalllinalg import chol_with_inv_auto
        bc = b / c
        G = _einsum("ki,kj->ij", _h(X), X, precision=prec)
        Z = eye + c.astype(dt) * G
        _, Li = chol_with_inv_auto(Z, precision=prec, config=config)
        XL = _einsum("ik,jk->ij", X, _h(Li), precision=prec)
        return (bc.astype(dt) * X
                + (a - bc).astype(dt)
                * _einsum("ik,kj->ij", XL, Li, precision=prec)).astype(dt)

    def advance(l, a, b, c):
        l2 = l * l
        return jnp.clip(l * (a + b * l2) / (1.0 + c * l2), 0.0, 1.0)

    max_it = 24

    def qr_cond(st):
        _, l, it = st
        _, _, c = _halley_weights(l, rdt)
        converged = 1.0 - l <= 5.0 * eps
        in_qr = jnp.asarray(True) if cplx else c > _CHOL_C_MAX
        return jnp.logical_and(jnp.logical_and(in_qr, ~converged),
                               it < max_it)

    def qr_body(st):
        X, l, it = st
        a, b, c = _halley_weights(l, rdt)
        return qr_step(X, a, b, c), advance(l, a, b, c), it + 1

    def ch_cond(st):
        _, l, it = st
        converged = 1.0 - l <= 5.0 * eps
        return jnp.logical_and(~converged, it < max_it)

    def ch_body(st):
        X, l, it = st
        a, b, c = _halley_weights(l, rdt)
        return chol_step(X, a, b, c), advance(l, a, b, c), it + 1

    st = (X, l0, jnp.int32(0))
    st = jax.lax.while_loop(qr_cond, qr_body, st)
    if not cplx:
        st = jax.lax.while_loop(ch_cond, ch_body, st)
    return st[0]


def polar(A, side: str = "right", l0: float | None = None,
          config: QRConfig = DEFAULT_CONFIG, max_iter: int = 24):
    """Polar decomposition (scipy.linalg.polar analog, QDWH, SVD-free).

    side='right': A = U H with U (m x n) having orthonormal columns
    (m >= n) or orthonormal rows (m < n) and H (n x n) Hermitian PSD.
    side='left':  A = H U with H (m x m) Hermitian PSD.

    l0: optional lower bound for sigma_min(A)/||A||_2 in (0, 1].  Tighter
    values shorten the static schedule; the default (just below machine eps
    of the working dtype) is valid for any numerically nonsingular A.
    For singular A the iteration still returns an orthogonal U (the polar
    factor of a nearby full-rank matrix; the polar factor itself is
    non-unique there).
    """
    A = to_device(A)
    if A.ndim != 2:
        raise QRShapeError(f"polar needs a 2-D matrix, got shape {A.shape}")
    if side not in ("right", "left"):
        raise ValueError(f"side must be 'right' or 'left', got {side!r}")
    m, n = A.shape
    if m < n:
        # A = U H  <=>  A^H = (U^H)(H')   with H' from the transposed problem
        if side == "right":
            Ut, Hh = polar(_h(A).T, side="left", l0=l0, config=config,
                           max_iter=max_iter)
        else:
            Ut, Hh = polar(_h(A).T, side="right", l0=l0, config=config,
                           max_iter=max_iter)
        return _h(Ut).T, _h(Hh).T

    dt = A.dtype
    if not jnp.iscomplexobj(A) and config.dtype != dt:
        # fp64 / bf16 input: run the QR core in the input dtype (complex is
        # routed inside qr_blocked itself)
        config = config.replace(dtype=dt)
    eps = float(jnp.finfo(jnp.float64 if dt == jnp.float64 else
                          jnp.float32).eps)
    if l0 is None:
        l0 = eps / 10.0
    # X0 = A/alpha with alpha = sqrt(||A||_1 ||A||_inf), which overestimates
    # ||A||_2 by at most (mn)^(1/4); l0 bounds sigma_min(A)/||A||_2, so the
    # schedule must start from the deflated sigma_min(X0) bound.
    schedule = tuple(_qdwh_schedule(l0 / (m * n) ** 0.25, eps, max_iter))

    U = _qdwh_jit(_prep(A), schedule, config)
    return U, _form_h(U, A, side, config)


def polar_dist(A, mesh, l0: float | None = None,
               config: QRConfig = DEFAULT_CONFIG, strategy: str | None = None,
               max_iter: int = 24):
    """Distributed QDWH polar decomposition of a row-sharded tall matrix.

    A = U H with U (m x n, orthonormal columns) row-sharded over the mesh
    and H (n x n Hermitian PSD) replicated.  Completes the distributed
    solver layer (lstsq_dist, rsvd_dist, caqr_ormqr) with the polar/
    spectral member; the reference has no distributed code at all
    (SURVEY.md S2, jobfile:4-6).

    Mapping of the QDWH stages onto the mesh:
      * QR step: instead of factoring the stacked ((m+n) x n) matrix
        across shards, factor X = Q_d R_d by tsqr_dist (R_d replicated),
        then QR the small replicated stack [sqrt(c) R_d; I] = [Q1; Q2] R2.
        The thin Q of [sqrt(c) X; I] is ([Q_d Q1; Q2]), so the Halley
        update needs only K = Q1 Q2^H (replicated n x n) and one
        shard-local GEMM Q_d K -- no extra collectives beyond the TSQR.
      * Cholesky step: G = X^H X is one psum (inserted by the SPMD
        partitioner); the two triangular GEMMs are shard-local against the
        replicated n x n inverse Cholesky factor.
      * H = U^H A: one psum'd GEMM + symmetrization.

    strategy: tsqr_dist combine ("allgather" default -- the unconditionally
    stable Householder combine; early QDWH iterates have cond up to 1/l0,
    which is exactly the regime CholeskyQR-style combines must guard
    against).  "cholesky"/"butterfly" as in tsqr_dist.
    """
    from ..parallel.mesh import ROW_AXIS, row_sharding
    from ..parallel.tsqr_dist import tsqr_dist

    if A.ndim != 2:
        raise QRShapeError(f"polar_dist needs a 2-D matrix, got {A.shape}")
    m, n = A.shape
    nper = mesh.shape[ROW_AXIS]
    if m < n:
        raise QRShapeError(
            f"polar_dist needs a tall matrix (m >= n), got {m}x{n}; "
            "transpose on the host for the wide case")
    if m % nper:
        raise QRShapeError(f"polar_dist needs m % P == 0, got m={m} P={nper}")
    cplx = jnp.iscomplexobj(A)
    if strategy is None:
        strategy = "allgather"
    dt = A.dtype
    if not cplx and config.dtype != dt:
        config = config.replace(dtype=dt)
    eps = float(jnp.finfo(jnp.float64 if dt in (jnp.float64, jnp.complex128)
                          else jnp.float32).eps)
    if l0 is None:
        l0 = eps / 10.0
    schedule = tuple(_qdwh_schedule(l0 / (m * n) ** 0.25, eps, max_iter))

    Ad = jax.device_put(to_device(A), row_sharding(mesh))
    U = _qdwh_dist_jit(Ad, mesh, schedule, config, strategy)
    H = _form_h_dist(U, Ad, config)
    return U, H


@partial(jax.jit, static_argnames=("mesh", "schedule", "config", "strategy"))
def _qdwh_dist_jit(A, mesh, schedule, config: QRConfig, strategy: str):
    from ..ops.smalllinalg import cholesky_with_inv
    from ..parallel.tsqr_dist import _small_qr_q, tsqr_dist

    prec = config.precision
    m, n = A.shape
    dt = A.dtype
    cplx = jnp.iscomplexobj(A)
    eye = jnp.eye(n, dtype=dt)
    X = _prep(A)
    for a, b, c, use_qr in schedule:
        bc = b / c
        if use_qr or cplx:
            sc = math.sqrt(c)
            Qd, Rd = tsqr_dist(X, mesh, config, strategy=strategy)
            stacked = jnp.concatenate([(sc * Rd).astype(dt), eye], axis=0)
            Qs, _ = _small_qr_q(stacked, prec)
            K = _einsum("ik,jk->ij", Qs[:n], _h(Qs[n:]), precision=prec)
            X = (bc * X + ((a - bc) / sc)
                 * _einsum("ik,kj->ij", Qd, K, precision=prec)).astype(dt)
        else:
            G = _einsum("ki,kj->ij", _h(X), X, precision=prec)
            Z = eye + jnp.asarray(c, dt) * G
            _, Li = cholesky_with_inv(Z, precision=prec)
            XL = _einsum("ik,jk->ij", X, _h(Li), precision=prec)
            X = (bc * X
                 + (a - bc) * _einsum("ik,kj->ij", XL, Li,
                                      precision=prec)).astype(dt)
    return X


@partial(jax.jit, static_argnames=("config",))
def _form_h_dist(U, A, config: QRConfig):
    Hm = _einsum("ki,kj->ij", _h(U), A, precision=config.precision)
    return ((Hm + _h(Hm).T) * 0.5).astype(A.dtype)


def svd(A, full_matrices: bool = False, l0: float | None = None,
        config: QRConfig = DEFAULT_CONFIG, eigh_impl: str = "xla"):
    """Singular value decomposition via QDWH-SVD (Nakatsukasa-Higham 2013).

    A = U diag(s) V^H with s descending.  Structure: the polar factor comes
    from the QR-based QDWH iteration above (all GEMM/QR work), then one
    Hermitian eigendecomposition of the small(er) n x n factor H = V S V^H
    gives the right singular vectors, and U = U_polar V is one GEMM.  No
    bidiagonalization -- the O(mn^2) work is entirely MXU-shaped, which is
    the reason QDWH-SVD is the standard dense-SVD construction on matrix
    units.

    full_matrices=True extends the thin factor on the long side to a full
    orthonormal basis: the complement columns come from qr(U, 'complete')
    -- they are orthogonal to range(U) = range(A), and any such complement
    is a valid full-SVD basis since the extra rows of diag(s) are zero.

    eigh_impl: "xla" (default) diagonalizes H with jnp.linalg.eigh;
    "qdwh" uses the in-house QDWH-eig divide-and-conquer (models/eigh.py)
    so no stage of the SVD delegates to an XLA factorization.  Routing
    data: docs/PERF.md "eigh dependency" section.
    """
    A = to_device(A)
    if A.ndim != 2:
        raise QRShapeError(f"svd needs a 2-D matrix, got shape {A.shape}")
    if eigh_impl not in ("xla", "qdwh"):
        raise ValueError(f"eigh_impl must be 'xla' or 'qdwh', got "
                         f"{eigh_impl!r}")
    m, n = A.shape
    if m < n:
        U, s, Vh = svd(_h(A).T, full_matrices=full_matrices, l0=l0,
                       config=config, eigh_impl=eigh_impl)
        return _h(Vh).T, s, _h(U).T
    Up, H = polar(A, side="right", l0=l0, config=config)
    if eigh_impl == "qdwh":
        from .eigh import eigh as _eigh
        w, V = _eigh(H, config)
        w = jnp.maximum(w[::-1], 0.0)
        V = V[:, ::-1]
        U = _einsum("ik,kj->ij", Up, V, precision=config.precision)
        U, s, Vh = (U.astype(Up.dtype), w.astype(jnp.abs(H).dtype),
                    _h(V).T.astype(Up.dtype))
    else:
        U, s, Vh = _svd_finish(Up, H, config)
    if full_matrices and m > n:
        from .qr import qr as _qr
        cfgq = config if jnp.iscomplexobj(U) \
            else config.replace(dtype=U.dtype)  # don't downcast f64 bases
        Qc = _qr(U, cfgq, mode="complete")[0]
        U = jnp.concatenate([U, Qc[:, n:]], axis=1)
    return U, s, Vh


def svd_dist(A, mesh, l0: float | None = None,
             config: QRConfig = DEFAULT_CONFIG, strategy: str | None = None,
             eigh_impl: str = "xla", max_iter: int = 24):
    """Distributed deterministic SVD of a row-sharded tall matrix.

    A = U diag(s) V^H with U (m x n, orthonormal columns) row-sharded over
    the mesh, s descending, and V^H (n x n) replicated.  QDWH-SVD on the
    mesh: the polar factor comes from ``polar_dist`` (tsqr_dist + psum'd
    Cholesky steps -- the only collectives in the pipeline), the n x n
    Hermitian factor H is replicated so its eigendecomposition runs
    shard-locally, and U = U_polar V is one shard-local GEMM against the
    replicated V.  Completes the distributed solver layer's spectral story
    (rsvd_dist is randomized/truncated; this is the exact factorization).
    The reference has no distributed code at all (SURVEY.md S2,
    jobfile:4-6).

    eigh_impl: "xla" (default) or "qdwh" (the in-house divide-and-conquer,
    models/eigh.py) for the replicated n x n eigendecomposition.
    full_matrices is not offered: a distributed orthonormal complement of
    range(A) is all-communication and no caller of the thin SVD needs it.
    """
    if A.ndim != 2:
        raise QRShapeError(f"svd_dist needs a 2-D matrix, got {A.shape}")
    if eigh_impl not in ("xla", "qdwh"):
        raise ValueError(f"eigh_impl must be 'xla' or 'qdwh', got "
                         f"{eigh_impl!r}")
    Up, H = polar_dist(A, mesh, l0=l0, config=config, strategy=strategy,
                       max_iter=max_iter)
    if eigh_impl == "qdwh":
        from .eigh import eigh as _eigh
        cfge = config if jnp.iscomplexobj(H) \
            else config.replace(dtype=H.dtype)
        w, V = _eigh(H, cfge)
        w, V = w[::-1], V[:, ::-1]
    else:
        w, V = _svd_eigh_desc(H)
    s = jnp.maximum(w, 0.0).real.astype(jnp.abs(H).dtype)
    U = _svd_rotate(Up, V.astype(Up.dtype), config)
    return U, s, _h(V).T.astype(Up.dtype)


@jax.jit
def _svd_eigh_desc(H):
    w, V = jnp.linalg.eigh(H)          # ascending
    return w[::-1], V[:, ::-1]


@partial(jax.jit, static_argnames=("config",))
def _svd_rotate(Up, V, config: QRConfig):
    """U = U_polar V: row-sharded x replicated -> shard-local GEMM."""
    return _einsum("ik,kj->ij", Up, V,
                   precision=config.precision).astype(Up.dtype)


@partial(jax.jit, static_argnames=("config",))
def _svd_finish(Up, H, config: QRConfig):
    w, V = jnp.linalg.eigh(H)          # ascending
    w = jnp.maximum(w[::-1], 0.0)      # descending, clipped PSD
    V = V[:, ::-1]
    U = _einsum("ik,kj->ij", Up, V, precision=config.precision)
    return (U.astype(Up.dtype), w.real.astype(jnp.abs(H).dtype),
            _h(V).T.astype(Up.dtype))


@jax.jit
def _prep(A):
    """Scale A so its spectrum lies in (0, 1]:
    alpha = sqrt(||A||_1 ||A||_inf) >= sigma_max(A) -- cheap, exact bound."""
    absA = jnp.abs(A)
    alpha = jnp.sqrt(jnp.max(jnp.sum(absA, axis=0))
                     * jnp.max(jnp.sum(absA, axis=1)))
    rdt = jnp.float64 if A.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    alpha = jnp.where(alpha > 0, alpha, 1.0).astype(rdt)
    return (A / alpha).astype(A.dtype)


@partial(jax.jit, static_argnames=("side", "config"))
def _form_h(U, A, side: str, config: QRConfig):
    prec = config.precision
    if side == "right":
        Hm = _einsum("ki,kj->ij", _h(U), A, precision=prec)  # U^H A
    else:
        Hm = _einsum("ik,jk->ij", A, _h(U), precision=prec)  # A U^H
    return ((Hm + _h(Hm).T) * 0.5).astype(A.dtype)
