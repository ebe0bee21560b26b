"""Deterministic Hermitian eigendecomposition, built entirely in-house.

QDWH-eig spectral divide-and-conquer (Nakatsukasa & Higham 2013) on top of
this library's own primitives -- the QDWH polar factor (models/polar.py),
rank-revealing QRCP (models/qr.py), and MXU GEMMs -- with a parallel-ordered
cyclic-Jacobi base case.  This removes the one dense factorization the
library previously delegated wholesale to XLA (``jnp.linalg.eigh`` inside
svd/eigh_rand); the reference has no eigensolver at all (its only spectral
artifact is the residual check, qr.cu:822-850).

Algorithm per divide step (A Hermitian, n x n):
  1. sigma <- median of diag(A) (a cheap split-point estimate; retried with
     Gershgorin-interval points if the split degenerates).
  2. U = polar factor of A - sigma I  == the matrix sign function: U is
     Hermitian orthogonal with U v = +/- v on the eigenvectors of A above /
     below sigma.  All QDWH work is stacked QR + GEMMs (MXU-shaped), with
     the dynamic-weight iteration of models/polar.py (_qdwh_dyn_core).
  3. P = (I - U)/2 is the orthogonal projector onto the < sigma invariant
     subspace; k = round(trace P) is its dimension.
  4. Subspace iteration (one complete blocked-Householder QR of P's top-k
     columns, iterated only if the certificate ||V2^H A V1|| demands it)
     gives orthonormal bases of range(P) and its complement; A restricted
     to each basis is the pair of child blocks.
  5. Recurse on the k x k and (n-k) x (n-k) blocks; the eigenvector
     back-transform is one GEMM per block.

TPU-first structural choices:
  * The ENTIRE recursion runs on device as one jitted program
    (`_eigh_onchip`): an explicit agenda stack of (offset, size)
    subproblems processed under lax.while_loop, with lax.switch over a
    small set of bucketed static block sizes and iota-masking for the
    data-dependent split sizes -- the shape discipline of XLA's own TPU
    QDWH-eig lowering (jax._src.tpu.linalg.eigh, studied as prior art),
    rebuilt on this library's own primitives.  Zero host round-trips and
    a bounded compile set (one program per input size).
  * Base case (blocks <= base_n) is cyclic Jacobi with the round-robin
    parallel ordering: each round diagonalizes n/2 DISJOINT 2x2 Hermitian
    blocks in closed form and applies them as ONE n x n rotation GEMM
    pair -- no per-rotation sequential chain (the TPU anti-pattern), just
    (sweeps)x(n-1) GEMM rounds under lax.while_loop/fori_loop, with the
    pair schedule computed on device (_rr_pairs).
  * Leaf blocks are not solved inside the agenda loop: they are deferred
    and solved afterwards by ONE vmapped Jacobi over the whole leaf stack
    -- every rotation round becomes a (leaves, base, base) batched GEMM
    pair instead of ~N/base separate base^3 GEMM chains (r5).

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
from .qr import qr

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


def _rr_pairs(r, n: int):
    """Round-robin pairs of round r, computed on device (circle method).

    Fixed player n-1; players 0..n-2 rotate.  Over r = 0..n-2 every
    unordered pair appears exactly once, and each round is a perfect
    matching -- the same cover `_round_robin` builds on the host, without
    embedding an (n-1, n/2, 2) constant in the compiled program (67 MB at
    n = 4096, which the on-chip D&C's per-bucket Jacobi fallback would
    otherwise pay).
    """
    k = jnp.arange(n // 2, dtype=jnp.int32)
    r = jnp.asarray(r, jnp.int32)
    a = jnp.where(k == 0, n - 1, (k + r) % (n - 1))
    b = (jnp.where(k == 0, 0, n - 1 - k) + r) % (n - 1)
    return jnp.minimum(a, b), jnp.maximum(a, b)


@partial(jax.jit, static_argnames=("max_sweeps", "sort"))
def _jacobi_eigh(A: jnp.ndarray, schedule: jnp.ndarray | None,
                 max_sweeps: int = 30, sort: bool = True):
    """Cyclic Jacobi with parallel ordering; A Hermitian (n x n, n even).

    One round: closed-form diagonalization of the n/2 disjoint 2x2 blocks
    {(p,q)} -> one sparse rotation matrix J -> A <- J^H A J, V <- V J as
    GEMMs.  Sweeps run under while_loop until off(A) <= 5 eps ||A||_F or
    max_sweeps (cyclic Jacobi is globally convergent and asymptotically
    quadratic, so the cap is a formality).

    schedule: (n-1, n/2, 2) pair table, or None to compute each round's
    pairs on device via `_rr_pairs`.  sort=False returns the eigenvalues
    unsorted on the diagonal positions where they converged -- the property
    the on-chip D&C base case needs so zero-padded coordinates stay put.
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
        if schedule is None:
            p, q = _rr_pairs(r, n)
        else:
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
    if not sort:
        return w, V
    order = jnp.argsort(w)
    return w[order], V[:, order]


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


# --------------------------------------------------------------------------
# On-chip divide-and-conquer (the n > base_n path)
#
# The recursion's split sizes are data-dependent, so a naive implementation
# drives it from the host -- which through a tunneled TPU costs ~1 RTT per
# scalar fetch per node (~100 ms each; measured 3.2 s at 1024^2, RESULTS x8)
# plus one XLA compile per exact interior size.  Instead the whole
# divide-and-conquer runs inside ONE jitted program: an explicit agenda
# stack of (offset, size) subproblems, processed by lax.switch over a small
# set of bucketed static block sizes, with dynamic sizes handled by
# iota-masking.  This is the shape discipline of XLA's own TPU QDWH-eig
# lowering (jax._src.tpu.linalg.eigh -- studied as prior art, rebuilt here
# on this library's own primitives: the dynamic-weight QDWH iteration of
# models/polar.py, the blocked-Householder complete QR of models/qr.py, and
# the parallel-ordered Jacobi base case above).  Zero host round-trips.
# --------------------------------------------------------------------------


def _dmask(x, dims, alt=0):
    """Mask x outside the dynamic extents `dims` (None = full) with alt."""
    m = None
    for axis, d in enumerate(dims):
        if d is None:
            continue
        mi = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis) < d
        m = mi if m is None else jnp.logical_and(m, mi)
    return x if m is None else jnp.where(m, x, alt)


def _dslice(x, starts, dyn, static, fill=0):
    """dynamic_slice returning a static `static`-shaped block whose live
    region is the dynamic `dyn` rectangle; out-of-range reads become
    `fill` instead of clamping."""
    pad = jax.lax.pad(x, jnp.asarray(0, x.dtype),
                      [(0, s, 0) for s in static])
    out = jax.lax.dynamic_slice(
        pad, tuple(jnp.asarray(i, jnp.int32) for i in starts), static)
    return _dmask(out, dyn, fill)


def _dupdate(x, upd, starts, dims):
    """dynamic_update_slice writing only the `dims` rectangle of `upd`."""
    shape = x.shape
    xp = jax.lax.pad(x, jnp.asarray(0, x.dtype),
                     [(0, s, 0) for s in upd.shape])
    starts = tuple(jnp.asarray(i, jnp.int32) for i in starts)
    cur = jax.lax.dynamic_slice(xp, starts, upd.shape)
    xp = jax.lax.dynamic_update_slice(
        xp, _dmask(upd, dims, cur), starts)
    return jax.lax.slice(xp, (0,) * x.ndim, shape)


def _invariant_bases(P, Hblk, b, rank, config: QRConfig):
    """Split R^b into range(P) and its complement by subspace iteration.

    P: Hermitian projector of dynamic rank `rank`, live in the leading
    (b, b) block of a static (B, B) array (zero outside).  Returns
    (V1, V2): B x B arrays whose leading (b, rank) / (b, b-rank) blocks
    are orthonormal bases of range(P) and its complement within the live
    coordinates.  One complete blocked-Householder QR of the top-`rank`
    columns of P (by column norm) converges almost always in one step --
    the projector's eigenvalue gap is exactly 1; Hblk supplies the
    convergence certificate ||V2^H H V1||.
    """
    B = P.shape[0]
    prec = config.precision
    rdt = jnp.float64 if P.dtype in (jnp.float64, jnp.complex128) \
        else jnp.float32
    eps = jnp.asarray(jnp.finfo(rdt).eps, rdt)
    iota = jnp.arange(B)
    cn = jnp.linalg.norm(P, axis=0).astype(rdt)
    # negate so argsort puts the largest norms first; NaN-mask dead columns
    # (they sort last)
    order = jnp.argsort(jnp.where(iota < b, -cn, jnp.nan))
    X0 = _dmask(P[:, order], (None, rank))
    thresh = 10.0 * eps * jnp.linalg.norm(Hblk).astype(rdt)

    def qr_split(X):
        Q, _ = qr(X, config, mode="complete")
        V1 = _dmask(Q, (b, rank))
        V2 = _dslice(Q, (0, rank), (b, b - rank), (B, B))
        E = _einsum("ki,kj->ij", jnp.conj(V2),
                    _einsum("ik,kj->ij", Hblk, V1, precision=prec),
                    precision=prec)
        return V1, V2, jnp.linalg.norm(E).astype(rdt)

    # Do-first loop with ONE qr_split call site: the complete-QR subgraph
    # is the largest object in this function, and inner-jit functions are
    # NOT deduplicated across call sites in the lowered module (measured
    # r5: the old init-call + body-call form doubled every per-bucket
    # panel-function instance -- docs/PERF.md "eigh compile size").
    # Iteration sequence is identical: qr_split(X0), then qr_split(P V1)
    # only while the certificate demands it (at most 3 total).
    def body(st):
        X, V1, V2, it, err = st
        V1, V2, err = qr_split(X)
        it = it + 1
        # next iterate, prepared only if another round will run
        Xn = jax.lax.cond(
            jnp.logical_and(err > thresh, it < 3),
            lambda: _einsum("ik,kj->ij", P, V1, precision=prec),
            lambda: X)
        return Xn, V1, V2, it, err

    def cond(st):
        _, _, _, it, err = st
        return jnp.logical_or(it == 0,
                              jnp.logical_and(err > thresh, it < 3))

    _, V1, V2, _, _ = jax.lax.while_loop(
        cond, body, (X0, jnp.zeros_like(P), jnp.zeros_like(P),
                     jnp.int32(0), jnp.asarray(jnp.inf, rdt)))
    return V1, V2


def _split_node(Hblk, b, config: QRConfig):
    """One divide step on the live (b, b) block of a static (B, B) array.

    sigma candidates (diagonal median, then Gershgorin midpoint/quartiles)
    are tried under a device while_loop until the matrix sign function
    U = sign(H - sigma I) -- the dynamic-weight QDWH polar iteration of
    models/polar.py, with the pad block pinned to +I -- yields a proper
    split 0 < k < b.  Subspace iteration on the smaller-rank projector
    then produces the two invariant-subspace bases.

    Returns (V_minus, V_plus, k, ok): bases of the < sigma (size k) and
    >= sigma (size b - k) eigenspaces, and whether any candidate split.
    """
    from .polar import _qdwh_dyn_core

    B = Hblk.shape[0]
    dt = Hblk.dtype
    prec = config.precision
    rdt = jnp.float64 if dt in (jnp.float64, jnp.complex128) \
        else jnp.float32
    eps = float(jnp.finfo(rdt).eps)
    iota = jnp.arange(B)
    dre = jnp.diagonal(Hblk).real.astype(rdt)
    med = jnp.nanmedian(jnp.where(iota < b, dre, jnp.nan))
    gr = jnp.sum(jnp.abs(Hblk), axis=1).astype(rdt) - jnp.abs(dre)
    lo = jnp.min(jnp.where(iota < b, dre - gr, jnp.inf))
    hi = jnp.max(jnp.where(iota < b, dre + gr, -jnp.inf))
    width = jnp.maximum(hi - lo, jnp.asarray(eps, rdt))
    cands = jnp.stack([med, lo + 0.5 * width,
                       lo + 0.25 * width, lo + 0.75 * width])
    cands = jnp.clip(cands, lo + 1e-3 * width, hi - 1e-3 * width)
    eyeB = jnp.eye(B, dtype=dt)
    I_m = _dmask(eyeB, (b, b))
    pad_eye = eyeB - I_m          # +1 on the dead diagonal
    l0 = eps / 10.0 / float(B) ** 0.5

    def try_cand(i):
        sigma = cands[i]
        Hs = Hblk - sigma.astype(dt) * I_m
        absHs = jnp.abs(Hs)
        alpha = jnp.sqrt(jnp.max(jnp.sum(absHs, axis=0))
                         * jnp.max(jnp.sum(absHs, axis=1))).astype(rdt)
        alpha = jnp.where(alpha > 0, alpha, 1.0)
        # pad block = +I: its sign is exactly +I, so the live block's
        # projector traces are unpolluted after masking
        X = (Hs / alpha.astype(absHs.dtype)).astype(dt) + pad_eye
        U = _dmask(_qdwh_dyn_core(X, l0, config, prec), (b, b))
        k = jnp.round(jnp.trace((I_m - U) * 0.5).real).astype(jnp.int32)
        return U, k

    # Do-first retry loop with ONE try_cand call site (the QDWH polar
    # subgraph -- by far the largest object in the split node -- used to be
    # instantiated twice, once for the initial candidate and once in the
    # retry body; inner-jit functions are not deduplicated across call
    # sites, so this halves the per-bucket module size).  Candidate order
    # (0, then 1..3 while the split is degenerate) is unchanged.
    def retry_cond(st):
        i, _, k = st
        return jnp.logical_or(
            i == 0,
            jnp.logical_and(jnp.logical_or(k <= 0, k >= b), i < 4))

    def retry_body(st):
        i, _, _ = st
        U, k = try_cand(i)
        return i + 1, U, k

    _, U, k = jax.lax.while_loop(
        retry_cond, retry_body,
        (jnp.int32(0), jnp.zeros_like(Hblk), jnp.int32(0)))
    ok = jnp.logical_and(k > 0, k < b)
    k = jnp.clip(k, 1, jnp.maximum(b - 1, 1))  # shape-safe when not ok
    P_minus = (I_m - U) * 0.5
    P_plus = (I_m + U) * 0.5
    swap = (b - k) < k
    V_minus, V_plus = jax.lax.cond(
        swap,
        lambda: tuple(reversed(
            _invariant_bases(P_plus, Hblk, b, b - k, config))),
        lambda: _invariant_bases(P_minus, Hblk, b, k, config))
    return V_minus, V_plus, k, ok


@partial(jax.jit, static_argnames=("config", "term", "max_sweeps"))
def _eigh_onchip(A, config: QRConfig, term: int, max_sweeps: int):
    """The agenda-driven D&C work loop (see the section comment above).

    A: exact-size (N, N) Hermitian input.  Returns (w ascending, V).
    """
    N = A.shape[0]
    dt = A.dtype
    prec = config.precision
    rdt = jnp.float64 if dt in (jnp.float64, jnp.complex128) \
        else jnp.float32
    eps = float(jnp.finfo(rdt).eps)
    H0n = jnp.linalg.norm(A).astype(rdt)

    def push(stk, o, s):
        off, sz, t = stk
        return (off.at[t].set(o), sz.at[t].set(s), t + 1)

    def pop(stk):
        off, sz, t = stk
        return (off[t - 1], sz[t - 1]), (off, sz, t - 1)

    cap = N + 1
    stack = push((jnp.zeros(cap, jnp.int32), jnp.zeros(cap, jnp.int32),
                  jnp.int32(0)), jnp.int32(0), jnp.int32(N))
    blocks = A
    vecs = jnp.eye(N, dtype=dt)

    # Deferred-leaf batching (r5): base-case blocks are only RECORDED
    # during the agenda loop and solved afterwards by ONE vmapped Jacobi
    # over a (Lcap, cutoff, cutoff) stack.  Serially, each leaf costs
    # (sweeps)x(cutoff-1) rounds of tiny cutoff^3 GEMMs -- the single
    # largest non-QDWH share of the D&C runtime; batched, every round is
    # one (leaves, cutoff, cutoff) batched GEMM pair.  Lcap bounds the
    # stack: median splits leave ~N/cutoff x 2 leaves, so 4x that (+8) is
    # generous; the inline path remains as the overflow backstop.
    cutoff = min(N + (N % 2), term)
    Lcap = int(min(N, 4 * (-(-N // cutoff)) + 8))

    def base_case(C, offset, b, stack, blocks, vecs, leaves):
        off_a, sz_a, cnt = leaves

        def record(blocks, vecs):
            return (blocks, vecs,
                    (off_a.at[cnt].set(offset), sz_a.at[cnt].set(b),
                     cnt + 1))

        def inline(blocks, vecs):
            Hb = _dslice(blocks, (offset, 0), (b, b), (C, C))
            wl, Vj = _jacobi_eigh(Hb, None, max_sweeps=max_sweeps,
                                  sort=False)
            Vj = _dmask(Vj, (b, b)).astype(dt)
            V0 = _dslice(vecs, (0, offset), (N, b), (N, C))
            Vnew = _einsum("ik,kj->ij", V0, Vj, precision=prec)
            blocks = _dupdate(blocks, wl[:, None].astype(dt), (offset, 0),
                              (b, 1))
            vecs = _dupdate(vecs, Vnew, (0, offset), (None, b))
            return blocks, vecs, leaves

        blocks, vecs, leaves = jax.lax.cond(cnt < Lcap, record, inline,
                                            blocks, vecs)
        return stack, blocks, vecs, leaves

    def recursive_case(B, offset, b, stack, blocks, vecs, leaves):
        Hb = _dslice(blocks, (offset, 0), (b, b), (B, B))
        nrm = jnp.linalg.norm(Hb).astype(rdt)
        dvec = jnp.diagonal(Hb)
        offd = jnp.linalg.norm(Hb - jnp.diag(dvec)).astype(rdt)
        # cluster / noise-floor exits (Nakatsukasa-Higham section 5.2):
        # a block that is diagonal to working precision, or pure numerical
        # noise relative to the input, is done -- required for clustered /
        # rank-deficient spectra where no sigma can split
        done = jnp.logical_or(offd <= 5.0 * eps * nrm, nrm < eps * H0n)

        def diag_case(stack, blocks, vecs):
            blocks_ = _dupdate(blocks, dvec.real.astype(dt)[:, None],
                               (offset, 0), (b, 1))
            return stack, blocks_, vecs

        def split_case(stack, blocks, vecs):
            V_minus, V_plus, k, ok = _split_node(Hb, b, config)
            V0 = _dslice(vecs, (0, offset), (N, b), (N, B))

            def good(stack, blocks, vecs):
                HV1 = _einsum("ik,kj->ij", Hb, V_minus, precision=prec)
                H1 = _einsum("ki,kj->ij", jnp.conj(V_minus), HV1,
                             precision=prec)
                HV2 = _einsum("ik,kj->ij", Hb, V_plus, precision=prec)
                H2 = _einsum("ki,kj->ij", jnp.conj(V_plus), HV2,
                             precision=prec)
                H1 = ((H1 + _h(H1).T) * 0.5).astype(dt)
                H2 = ((H2 + _h(H2).T) * 0.5).astype(dt)
                Vm = _einsum("ik,kj->ij", V0, V_minus, precision=prec)
                Vp = _einsum("ik,kj->ij", V0, V_plus, precision=prec)
                blocks_ = _dupdate(blocks, H1, (offset, 0), (k, k))
                blocks_ = _dupdate(blocks_, H2, (offset + k, 0),
                                   (b - k, b - k))
                vecs_ = _dupdate(vecs, Vm.astype(dt), (0, offset),
                                 (None, k))
                vecs_ = _dupdate(vecs_, Vp.astype(dt), (0, offset + k),
                                 (None, b - k))
                stack_ = push(stack, offset, k)
                stack_ = push(stack_, offset + k, b - k)
                return stack_, blocks_, vecs_

            def jacobi_fallback(stack, blocks, vecs):
                # no candidate separated the spectrum (tight multi-
                # cluster): Jacobi terminates at any size, just without
                # the divide step.  Never taken on random spectra; the
                # backstop that guarantees the agenda always shrinks.
                wl, Vj = _jacobi_eigh(Hb, None, max_sweeps=max_sweeps,
                                      sort=False)
                Vj = _dmask(Vj, (b, b)).astype(dt)
                Vnew = _einsum("ik,kj->ij", V0, Vj, precision=prec)
                blocks_ = _dupdate(blocks, wl[:, None].astype(dt),
                                   (offset, 0), (b, 1))
                vecs_ = _dupdate(vecs, Vnew, (0, offset), (None, b))
                return stack, blocks_, vecs_

            return jax.lax.cond(ok, good, jacobi_fallback,
                                stack, blocks, vecs)

        stack, blocks, vecs = jax.lax.cond(done, diag_case, split_case,
                                           stack, blocks, vecs)
        return stack, blocks, vecs, leaves

    # Bucketed static sizes: N, then geometrically shrinking (factor ~2,
    # rounded up to 32) down to the termination size, so off-median splits
    # never fall back into the next-larger bucket.
    buckets = [cutoff]
    branches = [partial(base_case, cutoff)]
    if N > cutoff:
        topb = N + (N % 2)  # Jacobi fallback needs even sizes
        buckets.append(topb)
        branches.append(partial(recursive_case, topb))
        i = int(N / 1.98)
        while i > cutoff:
            bs = _bucket(i, 32)
            buckets.append(bs)
            branches.append(partial(recursive_case, bs))
            i //= 2
    buckets_arr = jnp.asarray(buckets, jnp.int32)

    def loop_body(state):
        stack, blocks, vecs, leaves = state
        (o, b), stack = pop(stack)
        which = jnp.where(buckets_arr < b, jnp.iinfo(jnp.int32).max,
                          buckets_arr)
        choice = jnp.argmin(which)
        return jax.lax.switch(choice, branches, o, b, stack, blocks, vecs,
                              leaves)

    def loop_cond(state):
        return state[0][2] > 0

    leaves0 = (jnp.zeros(Lcap, jnp.int32), jnp.zeros(Lcap, jnp.int32),
               jnp.int32(0))
    _, blocks, vecs, leaves = jax.lax.while_loop(
        loop_cond, loop_body, (stack, blocks, vecs, leaves0))

    # Batched leaf solve: one vmapped Jacobi over the recorded stack (dead
    # lanes are zero blocks -- their off-norm is 0, so their while_loop
    # lanes converge immediately), then a sequential scatter of the
    # eigenvalues and the N x cutoff back-transform GEMM per live leaf.
    off_a, sz_a, cnt = leaves
    C = cutoff
    Hstk = jax.vmap(
        lambda o, b: _dslice(blocks, (o, 0), (b, b), (C, C)))(off_a, sz_a)
    ws_l, Vs_l = jax.vmap(
        lambda Hb: _jacobi_eigh(Hb, None, max_sweeps=max_sweeps,
                                sort=False))(Hstk)

    # The scatter loop runs on once-padded carries: a per-leaf _dupdate
    # would lax.pad the full (N, N) arrays every iteration (O(N^2) HBM
    # traffic per leaf); here each leaf moves only its own N x C slab.
    blocks_p = jax.lax.pad(blocks, jnp.asarray(0, dt),
                           [(0, C, 0), (0, 0, 0)])
    vecs_p = jax.lax.pad(vecs, jnp.asarray(0, dt), [(0, 0, 0), (0, C, 0)])
    ciota = jnp.arange(C, dtype=jnp.int32)

    def scatter(i, bv):
        blocks_p, vecs_p = bv
        o, b = off_a[i], sz_a[i]
        Vj = _dmask(Vs_l[i], (b, b)).astype(dt)
        V0 = jax.lax.dynamic_slice(vecs_p, (jnp.int32(0), o), (N, C))
        # slab columns >= b (a neighbor's live data) hit Vj's zeroed rows,
        # so Vnew needs no input masking; they are preserved on write-back
        Vnew = _einsum("ik,kj->ij", V0, Vj, precision=prec).astype(dt)
        vecs_p = jax.lax.dynamic_update_slice(
            vecs_p, jnp.where(ciota[None, :] < b, Vnew, V0),
            (jnp.int32(0), o))
        wcol = ws_l[i][:, None].astype(dt)
        cur = jax.lax.dynamic_slice(blocks_p, (o, jnp.int32(0)), (C, 1))
        blocks_p = jax.lax.dynamic_update_slice(
            blocks_p, jnp.where(ciota[:, None] < b, wcol, cur),
            (o, jnp.int32(0)))
        return blocks_p, vecs_p

    blocks_p, vecs_p = jax.lax.fori_loop(0, cnt, scatter,
                                         (blocks_p, vecs_p))
    blocks = jax.lax.slice(blocks_p, (0, 0), (N, N))
    vecs = jax.lax.slice(vecs_p, (0, 0), (N, N))
    w = blocks[:, 0].real.astype(rdt)
    order = jnp.argsort(w)
    return w[order], vecs[:, order]


def eigh(A, config: QRConfig = DEFAULT_CONFIG, *, base_n: int = 128,
         bucket: int | None = None, max_sweeps: int = 30):
    """Full Hermitian eigendecomposition A = V diag(w) V^H, w ascending.

    jnp.linalg.eigh drop-in built from this library's own kernels (QDWH
    sign-function splits + blocked-Householder subspace bases + Jacobi base
    case); no XLA eigensolver anywhere.  A may be real symmetric or complex
    Hermitian, f32/f64/c64/c128; only the Hermitian part (A + A^H)/2 is
    used.  For n > base_n the whole divide-and-conquer runs as ONE jitted
    on-device program (`_eigh_onchip`) -- no per-node host round-trips and
    a bounded set of compiled block sizes.

    base_n: largest block solved directly by the Jacobi base case (also
      the D&C termination size).
    bucket: direct-path (n <= base_n) Jacobi blocks are padded up to
      multiples of this (default min(base_n, 64)), bounding the set of
      compiled Jacobi shapes.

    Config routing (docs/PERF.md "eigh routing"): the internal QDWH /
    subspace QRs run at their own panel counts per D&C bucket, so a
    caller-set ``stage_schedule`` cannot apply and is stripped; and at
    n >= 3072 an untouched default ``scan_stages`` is rerouted to 1 to
    keep the per-bucket QR graphs under remote-compile resource caps (an
    explicitly non-default ``scan_stages`` is honored as set).
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
    n = A.shape[0]
    if n <= base_n:
        lo, hi, _ = _gershgorin(A)
        return _eigh_base(A, bucket, max_sweeps, float(lo), float(hi))
    config = _route_large_n(n, config)
    return _eigh_onchip(A, config, base_n + (base_n % 2), max_sweeps)


def _route_large_n(n: int, config: QRConfig) -> QRConfig:
    """Large-n compile-size routing (measured r4, docs/PERF.md "eigh
    routing"): each D&C bucket embeds a blocked-QR program per QDWH
    step, and its graph size scales with scan_stages; at n >= 3072 the
    default 4-stage driver lowers to a ~7 MB MLIR module that remote
    AOT compile helpers resource-kill.  The single-stage driver
    compiles (2303 s) and runs 2485 ms at 4096^2 -- QDWH's tall
    (2b x b) QR steps lose little to single-stage masking.  Only the
    untouched default is overridden; an explicit scan_stages wins.

    stage_schedule is ALWAYS stripped (ADVICE r4): each D&C bucket runs
    internal QRs with its own panel count, so no caller schedule can sum
    to all of them -- it would raise an unrelated error at trace time."""
    if config.stage_schedule is not None:
        config = config.replace(stage_schedule=None)
    if n >= 3072 and config.scan_stages == DEFAULT_CONFIG.scan_stages:
        return config.replace(scan_stages=1)
    return config


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


@jax.jit
def _gershgorin(A):
    """(lo, hi) enclosing the spectrum; and the real diagonal."""
    d = jnp.diagonal(A).real
    r = jnp.sum(jnp.abs(A), axis=1) - jnp.abs(jnp.diagonal(A))
    return jnp.min(d - r), jnp.max(d + r), d


def _eigh_base(A, bucket: int, max_sweeps: int, lo: float, hi: float):
    n = A.shape[0]
    npad = _bucket(max(n, 2), bucket)
    sentinel = lo - 0.125 * (hi - lo) - 1.0
    Ap = _pad_sentinel(A, npad, sentinel)
    sched = jnp.asarray(_round_robin(npad))
    w, V = _jacobi_eigh(Ap, sched, max_sweeps=max_sweeps)
    # sentinel eigenpairs are exactly the npad-n smallest (sentinel < lo)
    return w[npad - n:], V[:n, npad - n:]
