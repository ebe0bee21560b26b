"""Deterministic Hermitian eigendecomposition, built entirely in-house.

QDWH-eig spectral divide-and-conquer (Nakatsukasa & Higham 2013) on top of
this library's own primitives -- the QDWH polar factor (models/polar.py),
rank-revealing QRCP (models/qr.py), and MXU GEMMs -- with a parallel-ordered
cyclic-Jacobi base case.  This removes the one dense factorization the
library previously delegated wholesale to XLA (``jnp.linalg.eigh`` inside
svd/eigh_rand); the reference has no eigensolver at all (its only spectral
artifact is the residual check, qr.cu:822-850).

Algorithm per recursion level (A Hermitian, n x n):
  1. sigma <- median of diag(A) (a cheap split-point estimate; retried with
     Gershgorin-interval points if the split degenerates).
  2. U = polar factor of A - sigma I  == the matrix sign function: U is
     Hermitian orthogonal with U v = +/- v on the eigenvectors of A above /
     below sigma.  All QDWH work is stacked QR + GEMMs (MXU-shaped).
  3. P = (I + U)/2 is the orthogonal projector onto the >= sigma invariant
     subspace; k = round((n + trace U)/2) is its dimension.
  4. One rank-revealing QRCP of P gives an orthogonal V whose first k
     columns span range(P); A' = V^H A V is block-diagonal to working
     precision (the off-diagonal block norm is checked, and a bad split --
     sigma on top of an eigenvalue cluster -- triggers a retry with a
     shifted sigma).
  5. Recurse on the k x k and (n-k) x (n-k) diagonal blocks; the
     eigenvector back-transform is one GEMM per block.

TPU-first structural choices:
  * Host-driven recursion, jitted stages: split sizes k are data-dependent,
    so the recursion cannot live under one jit with static shapes.
    Interior nodes run at their exact size (sentinel-padding them does not
    terminate -- see the note in _eigh_rec); the base case pads to a
    multiple of ``bucket``, where the pad block is exactly decoupled.
  * Base case (n <= base_n) is cyclic Jacobi with the round-robin parallel
    ordering: each round diagonalizes n/2 DISJOINT 2x2 Hermitian blocks in
    closed form and applies them as ONE n x n rotation GEMM pair -- no
    per-rotation sequential chain (the TPU anti-pattern), just
    (sweeps)x(n-1) GEMM rounds under lax.while_loop/fori_loop.

Accuracy envelope (tested): random symmetric/Hermitian f32 at n <= 512:
residual ||A V - V diag(w)||_F / ||A||_F and ||V^H V - I||_F both ~ n*eps;
f64 correspondingly ~1e-14.  Repeated/clustered eigenvalues are handled
(the projector split is multiplicity-blind; sigma retries step off
clusters).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.householder import _einsum, _h
from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.errors import QRShapeError
from ..utils.hostio import to_device

_H = jax.lax.Precision.HIGHEST


def _round_robin(n: int) -> np.ndarray:
    """(n-1, n//2, 2) round-robin tournament pairs: every round is a perfect
    matching, every unordered pair appears exactly once across rounds."""
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = sorted((min(players[i], players[n - 1 - i]),
                        max(players[i], players[n - 1 - i]))
                       for i in range(n // 2))
        rounds.append(pairs)
        players = [players[0], players[-1]] + players[1:-1]
    return np.asarray(rounds, dtype=np.int32)


@partial(jax.jit, static_argnames=("max_sweeps",))
def _jacobi_eigh(A: jnp.ndarray, schedule: jnp.ndarray, max_sweeps: int = 30):
    """Cyclic Jacobi with parallel ordering; A Hermitian (n x n, n even).

    One round: closed-form diagonalization of the n/2 disjoint 2x2 blocks
    {(p,q)} -> one sparse rotation matrix J -> A <- J^H A J, V <- V J as
    GEMMs.  Sweeps run under while_loop until off(A) <= 5 eps ||A||_F or
    max_sweeps (cyclic Jacobi is globally convergent and asymptotically
    quadratic, so the cap is a formality).
    """
    n = A.shape[0]
    cplx = jnp.iscomplexobj(A)
    rdt = jnp.float64 if A.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    eps = jnp.asarray(jnp.finfo(rdt).eps, rdt)
    normF = jnp.linalg.norm(A).real.astype(rdt)
    # each GEMM sweep injects O(sqrt(n) eps ||A||) into off(A); below that
    # further sweeps are no-ops, so it is the honest stopping floor
    tol2 = (4.0 * jnp.sqrt(jnp.asarray(n, rdt)) * eps * normF) ** 2

    def off2(A):
        # sum |offdiag|^2 directly -- the ||A||^2 - ||diag||^2 form
        # catastrophically cancels in f32 and can read 0 while the true
        # off-norm is still ~1e-4 (measured), breaking the stopping rule
        mask = 1.0 - jnp.eye(n, dtype=rdt)
        return jnp.sum((jnp.abs(A).astype(rdt) * mask) ** 2)

    def one_round(r, AV):
        A, V = AV
        r = jnp.asarray(r, jnp.int32)  # fori index is int64 under x64
        pq = jax.lax.dynamic_slice(
            schedule, (r, jnp.int32(0), jnp.int32(0)),
            (1, n // 2, 2))[0]
        p, q = pq[:, 0], pq[:, 1]
        app = A[p, p].real.astype(rdt)
        aqq = A[q, q].real.astype(rdt)
        apq = A[p, q]
        ab = jnp.abs(apq).astype(rdt)
        live = ab > 0
        safe = jnp.where(live, ab, 1.0)
        tau = (aqq - app) / (2.0 * safe)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0, 1.0, t)  # sign(0)=0 would stall equal-diag pairs
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = jnp.where(live, t * c, 0.0)
        c = jnp.where(live, c, 1.0)
        # phase conj(phi), phi = apq/|apq|: J = diag(1, conj(phi)) G with
        # G the real rotation -- J^H [[a, apq],[conj(apq), d]] J is diagonal.
        if cplx:
            phc = jnp.where(live, jnp.conj(apq) / safe.astype(A.dtype),
                            jnp.ones((), A.dtype))
        else:
            phc = jnp.where(live, jnp.sign(apq), jnp.ones((), A.dtype))
        cd = c.astype(A.dtype)
        sd = s.astype(A.dtype)
        J = (jnp.zeros((n, n), A.dtype)
             .at[p, p].set(cd)
             .at[p, q].set(sd)
             .at[q, p].set(-sd * phc)
             .at[q, q].set(cd * phc))
        AJ = _einsum("ik,kj->ij", A, J, precision=_H)
        A = _einsum("ki,kj->ij", jnp.conj(J), AJ, precision=_H)
        V = _einsum("ik,kj->ij", V, J, precision=_H)
        return A, V

    def sweep(state):
        A, V, it = state
        A, V = jax.lax.fori_loop(0, n - 1, one_round, (A, V))
        A = (A + _h(A).T) * 0.5
        return A, V, it + 1

    def cont(state):
        A, _, it = state
        return jnp.logical_and(off2(A) > tol2, it < max_sweeps)

    V0 = jnp.eye(n, dtype=A.dtype)
    A, V, _ = jax.lax.while_loop(cont, sweep, (A, V0, jnp.int32(0)))
    w = jnp.diagonal(A).real.astype(rdt)
    order = jnp.argsort(w)
    return w[order], V[:, order]


@jax.jit
def _gershgorin(A):
    """(lo, hi) enclosing the spectrum; and the real diagonal."""
    d = jnp.diagonal(A).real
    r = jnp.sum(jnp.abs(A), axis=1) - jnp.abs(jnp.diagonal(A))
    return jnp.min(d - r), jnp.max(d + r), d


@partial(jax.jit, static_argnames=("config",))
def _split_transform(A, V, config: QRConfig):
    """A' = V^H A V at HIGHEST precision (one program per padded n)."""
    prec = config.precision
    AV = _einsum("ik,kj->ij", A, V, precision=prec)
    return _einsum("ki,kj->ij", jnp.conj(V), AV, precision=prec)


def _pad_sentinel(A, npad: int, sentinel: float):
    n = A.shape[0]
    if npad == n:
        return A
    P = jnp.zeros((npad, npad), A.dtype)
    P = P.at[:n, :n].set(A)
    idx = jnp.arange(n, npad)
    return P.at[idx, idx].set(jnp.asarray(sentinel, A.dtype))


def _bucket(n: int, bucket: int) -> int:
    return -(-n // bucket) * bucket


def _signf(X, config: QRConfig, ibucket: int, scale: float):
    """Matrix sign function of Hermitian X: the QDWH polar factor, computed
    at a size bucketed up to a multiple of ``ibucket``.

    Padding is exact block-diagonal: polar(blockdiag(X, c I)) ==
    blockdiag(polar(X), I) with c > 0, and every QDWH operation (GEMM,
    Cholesky, triangular solve, Householder panels) propagates the zero
    off-blocks to O(eps) -- the same order as the iteration's own backward
    error, which the caller's split-quality certificate already absorbs.
    Bucketing collapses the D&C recursion's interior sizes onto a few
    compiled QDWH pipelines instead of one per exact size (the dominant
    compile cost: each pipeline is ~6 stacked QRs + Cholesky steps).
    Unlike sentinel-padding the RECURSION (which never terminates -- see
    the note in _eigh_rec), the pad block here is sliced off immediately:
    children always see exact sizes.
    """
    from .polar import _prep, _qdwh_jit, _qdwh_schedule

    n = X.shape[0]
    npad = _bucket(n, ibucket) if ibucket else n
    if npad != n:
        Xp = jnp.zeros((npad, npad), X.dtype)
        Xp = Xp.at[:n, :n].set(X)
        idx = jnp.arange(n, npad)
        # sentinel at the spectrum scale: keeps cond(X_pad) == cond(X) and
        # its sign is +1, so the pad block of U is exactly +I
        Xp = Xp.at[idx, idx].set(jnp.asarray(scale, X.dtype))
        X = Xp
    dt = X.dtype
    if not jnp.iscomplexobj(X) and config.dtype != dt:
        config = config.replace(dtype=dt)
    eps = float(jnp.finfo(jnp.float64 if dt == jnp.float64 else
                          jnp.float32).eps)
    schedule = tuple(_qdwh_schedule(
        (eps / 10.0) / (npad * npad) ** 0.25, eps))
    U = _qdwh_jit(_prep(X), schedule, config)
    return U[:n, :n] if npad != n else U


def eigh(A, config: QRConfig = DEFAULT_CONFIG, *, base_n: int = 128,
         bucket: int | None = None, max_sweeps: int = 30,
         interior_bucket: int = 256):
    """Full Hermitian eigendecomposition A = V diag(w) V^H, w ascending.

    jnp.linalg.eigh drop-in built from this library's own kernels (QDWH
    sign-function splits + QRCP subspace bases + Jacobi base case); no XLA
    eigensolver anywhere.  A may be real symmetric or complex Hermitian,
    f32/f64/c64/c128; only the Hermitian part (A + A^H)/2 is used.

    base_n: largest block solved directly by the Jacobi base case.
    bucket: base-case blocks are padded up to multiples of this (default
      min(base_n, 64)), bounding the set of compiled Jacobi shapes.
    interior_bucket: interior QDWH sign-function calls run at sizes padded
      up to multiples of this (exact block-diagonal padding, _signf),
      bounding the set of compiled QDWH pipelines -- the dominant
      first-call cost of the recursion.  0 = exact sizes.
    """
    A = to_device(A)
    if A.ndim != 2 or A.shape[0] != A.shape[1]:
        raise QRShapeError(f"eigh needs a square matrix, got {A.shape}")
    if bucket is None:
        bucket = min(base_n, 64)
    bucket = max(2, bucket + (bucket % 2))  # Jacobi pairs need even sizes
    dt = A.dtype
    if not jnp.iscomplexobj(A) and config.dtype != dt:
        config = config.replace(dtype=dt)
    A = ((A + _h(A).T) * 0.5).astype(dt)
    w, V = _eigh_rec(A, config, base_n, bucket, max_sweeps, interior_bucket)
    return w, V


def eigh_batched(As, max_sweeps: int = 30):
    """Batched Hermitian eigendecomposition of a (B, n, n) stack.

    vmapped parallel-ordered Jacobi: every sweep round is one batched GEMM
    pair over the whole stack -- the natural TPU shape for many small
    eigenproblems (the batched analog of qr_batched's sCholQR3).  Sizes
    where single-matrix D&C wins (n >> 512) should call ``eigh`` per
    matrix instead.  Returns (ws (B, n) ascending, Vs (B, n, n)).
    """
    As = to_device(As)
    if As.ndim != 3 or As.shape[1] != As.shape[2]:
        raise QRShapeError(f"eigh_batched needs (B, n, n), got {As.shape}")
    n = As.shape[1]
    npad = n + (n % 2)
    if npad != n:  # Jacobi pairing needs even n; one decoupled pad row
        B = As.shape[0]
        P = jnp.zeros((B, npad, npad), As.dtype)
        P = P.at[:, :n, :n].set(As)
        As = P.at[:, n, n].set(1.0)
    As = (As + jnp.conj(jnp.swapaxes(As, 1, 2))) * 0.5
    sched = jnp.asarray(_round_robin(npad))
    ws, Vs = jax.vmap(
        lambda a: _jacobi_eigh(a, sched, max_sweeps=max_sweeps))(As)
    if npad != n:
        # the pad eigenpair is (1, e_n); drop it wherever it sorted to
        idx = jnp.argmax(jnp.abs(Vs[:, n, :]), axis=1)  # (B,)
        keep = jax.vmap(lambda i: jnp.where(
            jnp.arange(npad) < i, jnp.arange(npad),
            jnp.arange(npad) + 1)[:n])(idx)
        ws = jax.vmap(lambda w, k: w[k])(ws, keep)
        Vs = jax.vmap(lambda V, k: V[:n, k])(Vs, keep)
    return ws, Vs


def _eigh_base(A, bucket: int, max_sweeps: int, lo: float, hi: float):
    n = A.shape[0]
    npad = _bucket(max(n, 2), bucket)
    sentinel = lo - 0.125 * (hi - lo) - 1.0
    Ap = _pad_sentinel(A, npad, sentinel)
    sched = jnp.asarray(_round_robin(npad))
    w, V = _jacobi_eigh(Ap, sched, max_sweeps=max_sweeps)
    # sentinel eigenpairs are exactly the npad-n smallest (sentinel < lo)
    return w[npad - n:], V[:n, npad - n:]


def _eigh_rec(A, config: QRConfig, base_n: int, bucket: int,
              max_sweeps: int, ibucket: int = 0):
    n = A.shape[0]
    lo_j, hi_j, diag_j = _gershgorin(A)
    lo, hi = float(lo_j), float(hi_j)
    scale = max(abs(lo), abs(hi), 1e-30)
    rdt = jnp.float64 if A.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    eps = float(jnp.finfo(rdt).eps)

    if n <= base_n:
        return _eigh_base(A, bucket, max_sweeps, lo, hi)
    if hi - lo <= 8.0 * eps * scale:
        # spectrum is one cluster to working precision: A = c I + O(eps)
        w = jnp.sort(jnp.diagonal(A).real.astype(rdt))
        return w, jnp.eye(n, dtype=A.dtype)
    # NOTE: interior nodes recurse at their exact size.  Bucketing them via
    # sentinel diagonal padding (tried) does NOT terminate: the QRCP basis
    # of the padded projector mixes pad coordinates into the complement
    # block, so children inherit sentinel eigenvalues, re-pad, and a block
    # can peel only sentinels forever.  Only the base case pads (there the
    # padded block is EXACTLY block-diagonal and strips exactly).

    diag = np.sort(np.asarray(jax.device_get(diag_j), dtype=np.float64))
    width = hi - lo
    # Split-point candidates: diagonal median (cheap, usually balanced),
    # then Gershgorin midpoint, then quartile nudges for pathological
    # spectra.  Each is nudged off exact diagonal ties.
    candidates = [float(np.median(diag)), lo + 0.5 * width,
                  lo + 0.25 * width, lo + 0.75 * width]

    best = None
    for sigma in candidates:
        sigma = min(max(sigma, lo + 1e-3 * width), hi - 1e-3 * width)
        U = _signf(A - jnp.asarray(sigma, A.dtype) * jnp.eye(n, dtype=A.dtype),
                   config, ibucket, scale)
        k = int(round((n + float(jax.device_get(jnp.trace(U).real))) / 2.0))
        if 0 < k < n:
            best = (sigma, U, k)
            break
    if best is None:
        # no candidate separated the spectrum (tight multi-cluster):
        # Jacobi handles any size, just without the divide step.
        return _eigh_base(A, bucket, max_sweeps, lo, hi)
    sigma, U, k = best

    from .qr import qr_pivoted
    P = (U + jnp.eye(n, dtype=A.dtype)) * 0.5
    V, _, _ = qr_pivoted(P, config)          # n x n orthogonal; first k
    Ap = _split_transform(A, V, config)      # columns span range(P)
    # split-quality certificate: the off-diagonal block is the backward
    # error of the invariant-subspace split
    En = float(jax.device_get(
        jnp.linalg.norm(Ap[k:, :k]) / jnp.asarray(scale, rdt)))
    if En > 1e-2:
        # sigma landed inside a cluster; Jacobi the block instead of
        # accepting a visibly bad split (rare: random spectra never trip)
        return _eigh_base(A, bucket, max_sweeps, lo, hi)

    A1 = ((Ap[:k, :k] + _h(Ap[:k, :k]).T) * 0.5).astype(A.dtype)
    A2 = ((Ap[k:, k:] + _h(Ap[k:, k:]).T) * 0.5).astype(A.dtype)
    w1, W1 = _eigh_rec(A1, config, base_n, bucket, max_sweeps,
                       ibucket)  # >= sigma
    w2, W2 = _eigh_rec(A2, config, base_n, bucket, max_sweeps,
                       ibucket)  # <  sigma
    Vlo = _einsum("ik,kj->ij", V[:, k:], W2, precision=config.precision)
    Vhi = _einsum("ik,kj->ij", V[:, :k], W1, precision=config.precision)
    w = jnp.concatenate([w2, w1])
    V = jnp.concatenate([Vlo.astype(A.dtype), Vhi.astype(A.dtype)], axis=1)
    return w, V
