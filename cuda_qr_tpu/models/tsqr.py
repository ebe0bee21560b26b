"""TSQR: tall-skinny QR by binary tree reduction of R factors.

The communication-avoiding direction the reference cites but never builds
(README.md:3 cites Anderson et al. / LAWN 240; the reference itself is
single-GPU with one serialized panel kernel, qr.cu:518).  Structure:

  leaves:  split the m axis into L row blocks, batched QR of each
           (vmapped masked Householder -> packed V/R + tau + T per leaf);
  tree:    pairwise stack [R_i; R_j] (2n x n), batched QR, log2(L) levels;
  Q:       root explicit Q, then push down the tree -- each child's Q is
           its local orgqr times its n x n slice of the parent's Q.

Everything is expressed as batched dense ops so XLA maps it onto the MXU;
the same leaf/combine kernels are reused by the distributed shard_map TSQR
in cuda_qr_tpu.parallel (ICI tree instead of in-chip tree).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.householder import geqr2, larfb, larft, unpack_r, unpack_v
from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.geometry import ceildiv


def _batched_qr(blocks: jnp.ndarray, precision):
    """QR of a batch of (b, n) blocks -> (packed, tau, T, R).

    blocks: (L, b, n) with b >= n.  R is (L, n, n).
    """
    packed, tau = jax.vmap(
        lambda a: geqr2(a, row_offset=0, precision=precision))(blocks)
    V = jax.vmap(unpack_v)(packed)
    T = jax.vmap(lambda v, t: larft(v, t, precision=precision))(V, tau)
    R = jax.vmap(lambda p: unpack_r(p)[: p.shape[1]])(packed)
    return packed, T, R


def _batched_cholqr2(blocks: jnp.ndarray, precision):
    """CholeskyQR2 of a batch of (b, n) blocks -> (Q (L,b,n), R (L,n,n)).

    Two rounds of R = chol(A^T A), Q = A R^{-1}; the second round restores
    orthogonality to O(eps) provided cond(A) < ~1/sqrt(eps) (Yamamoto et
    al.).  All flops are batched MXU GEMMs + one small batched Cholesky --
    one read of the block data per round vs the n reads of column-wise
    Householder, which is what makes the 1M x 128 TSQR HBM-bound otherwise.
    The triangular solve is replaced by the fused L/L^-1 recursion
    (ops.smalllinalg.cholesky_with_inv, vmapped): Q = A L^-T is a GEMM,
    where XLA's triangular_solve would serialize n substitution steps.
    """
    from ..ops.smalllinalg import cholesky_with_inv

    n = blocks.shape[2]

    def one_round(A):
        G = jnp.einsum("lbi,lbj->lij", A, A, precision=precision)
        Lc, Li = jax.vmap(lambda g: cholesky_with_inv(g, precision))(G)
        Q = jnp.einsum("lbi,lji->lbj", A, Li, precision=precision)  # A L^-T
        return Q, Lc.swapaxes(1, 2), G                               # R upper

    Q1, R1, _ = one_round(blocks)
    Q, R2, G2 = one_round(Q1)
    # Round-1 orthogonality defect ~ eps * cond(leaf)^2: above ~0.05 the
    # second round cannot restore O(eps) orthogonality and Cholesky may
    # stay finite anyway -- callers must gate on emax, not just NaNs
    # (same silent-loss mode as fast_panel._cholqr2).
    emax = jnp.max(jnp.abs(G2 - jnp.eye(n, dtype=blocks.dtype)))
    R = jnp.einsum("lij,ljk->lik", R2, R1, precision=precision)
    return Q, R, emax


def _leaf_qr(blocks: jnp.ndarray, config: QRConfig):
    """Leaf factorization -> (Q_leaf (L,b,n), R (L,n,n)) by config.tsqr_leaf,
    with silent per-batch fallback to Householder when CholeskyQR2 breaks
    down (non-finite output from a rank-deficient / ill-conditioned leaf)."""
    prec = config.precision

    def householder(blocks):
        packed, T, R = _batched_qr(blocks, prec)
        return _batched_orgqr(packed, T, prec), R

    if config.tsqr_leaf == "cholqr2":
        Q, R, emax = _batched_cholqr2(blocks, prec)
        bad = (~jnp.isfinite(jnp.sum(Q) + jnp.sum(R))) | (emax > 0.05)
        # lax.cond: the Householder branch only executes when CholeskyQR2
        # broke down (rank-deficient leaf) or silently lost orthogonality
        # (eps * cond^2 too large to repair -- no NaN in that mode).
        return jax.lax.cond(bad, householder, lambda b: (Q, R), blocks)
    return householder(blocks)


def _batched_orgqr(packed: jnp.ndarray, T: jnp.ndarray, precision):
    """Explicit thin Q (L, b, n) from batched packed factors."""
    L, b, n = packed.shape
    eye = jnp.broadcast_to(jnp.eye(b, n, dtype=packed.dtype), (L, b, n))
    V = jax.vmap(unpack_v)(packed)
    return jax.vmap(lambda e, v, t: larfb(e, v, t, transpose=False,
                                          precision=precision))(eye, V, T)


def _complex_config(A: jnp.ndarray, config: QRConfig) -> QRConfig:
    """Complex input keeps its dtype and uses Householder leaves: the
    CholeskyQR2 Gram einsums are real-only (same routing as qr_blocked)."""
    if jnp.iscomplexobj(A):
        return config.replace(dtype=A.dtype, tsqr_leaf="householder",
                              use_pallas=False, use_chol_kernel=False)
    return config


def _pad_rows(A: jnp.ndarray, rows: int) -> jnp.ndarray:
    m = A.shape[0]
    return A if m == rows else jnp.pad(A, ((0, rows - m), (0, 0)))


def _cholqr2_direct(A: jnp.ndarray, config: QRConfig):
    """Whole-matrix CholeskyQR2 in exactly two passes over A.

    The HBM-optimal tall-skinny QR: the tree is pure overhead when one Gram
    matrix suffices.  Round 1's Gram G = A^T A is the first read; round 2's
    Gram is computed FROM G (G2 = L1i G L1i^T -- n x n work, no second
    full-height pass), and both triangular solves fuse into one GEMM
    Q = A (L1i^T L2i^T), the second read + only write.  1M x 128 fp32 moves
    1.5 GB total, vs ~6+ passes for the leaf/tree pipeline.

    Round 2 uses the Taylor expansion chol(I+E) ~ I + tril(E,-1) + diag(E)/2
    when ||E||_max is tiny (the common case), so the whole factorization has
    ONE sequential Cholesky chain.  Returns (Q, R, bad): ``bad`` is True when
    Cholesky broke down (cond(A)^2 * eps >~ 1) and the caller must fall back
    to the unconditionally-stable Householder tree.
    """
    from ..ops.smalllinalg import cholesky_with_inv

    m, n = A.shape
    prec = config.precision
    # The two FULL-HEIGHT GEMMs (the Gram pass and the Q pass -- all of the
    # O(m n^2) work) honor trailing_precision, mirroring the blocked
    # driver's MIXED mode: at HIGHEST (bf16x6) they are compute-bound ~2x
    # over the pure-bandwidth bound, at HIGH (bf16x3) they return to
    # HBM-bound (docs/PERF.md "TSQR speed of light").  All n x n math
    # (Cholesky chains, G2, R assembly) stays at `precision`, and the
    # emax/cond-proxy certificates below gate the result either way.
    gprec = config.resolved_trailing_precision()
    dtype = A.dtype
    G = jnp.einsum("ri,rj->ij", A, A, precision=gprec)         # pass 1
    L1, L1i = cholesky_with_inv(G, prec)
    G2 = jnp.einsum("ij,jk,lk->il", L1i, G, L1i, precision=prec)
    E = G2 - jnp.eye(n, dtype=dtype)
    emax = jnp.max(jnp.abs(E))
    tol = 3e-4 if dtype == jnp.float32 else 3e-8

    def taylor(E):
        C = jnp.tril(E, -1) + 0.5 * jnp.diag(jnp.diagonal(E))
        eye = jnp.eye(n, dtype=dtype)
        return eye + C, eye - C

    L2, L2i = jax.lax.cond(
        emax < tol, taylor,
        lambda E: cholesky_with_inv(E + jnp.eye(n, dtype=dtype), prec), E)
    Rinv = jnp.einsum("ji,kj->ik", L1i, L2i, precision=prec)   # L1i^T L2i^T
    Q = jnp.einsum("rj,jk->rk", A, Rinv, precision=gprec)      # pass 2
    R = jnp.einsum("ji,kj->ik", L2, L1, precision=prec)        # L2^T L1^T
    R = jnp.triu(R)  # exact zeros below the diagonal (products are upper)
    # Fall back on breakdown, large round-1 defect, or a cond(A) proxy (the
    # diag(R) ratio) near the CholeskyQR2 validity edge cond^2 * eps < ~1:
    # G2 reuses G, so it cannot see the Gram-formation error eps * cond^2 --
    # the proxy guards what emax cannot.
    d = jnp.abs(jnp.diagonal(L1))
    cond_proxy = jnp.max(d) / jnp.maximum(jnp.min(d), 1e-30)
    eps = jnp.finfo(dtype).eps
    bad = (~jnp.isfinite(jnp.sum(Rinv)) | (emax > 0.3)
           | (cond_proxy * cond_proxy * eps > 0.05))
    return Q, R, bad


@partial(jax.jit, static_argnames=("config",))
def tsqr(A: jnp.ndarray, config: QRConfig = DEFAULT_CONFIG):
    """Thin QR of a tall-skinny A (m x n, n <= config.panel_width) via a
    binary reduction tree.  Returns (Q (m x n), R (n x n)).

    R carries the usual TSQR sign ambiguity (each tree node applies its own
    reflector sign convention); diag(R) is NOT forced positive, matching the
    reference's convention-free verification (it only checks ||QR - A||).

    Accuracy envelope at extreme m/n (docs/PERF.md "orthogonality floor"):
    with ``tsqr_leaf="cholqr2"`` (the bandwidth-optimal direct two-pass
    path) the residual is always fp32-grade, but ||Q^T Q - I|| floors at
    ~sqrt(m)*eps -- the fp32 Gram accumulation error, e.g. ~1-3e-04 at
    m = 10^6 -- because no second CholeskyQR round can see or remove it.
    The default ``tsqr_leaf="householder"`` is unconditionally stable with
    n*eps-class orthogonality at any m.

    Differentiable for real full-rank input via the shared thin-QR custom
    VJP (models/qr.py::thin_qr_vjp) -- the tree's lax.cond fallbacks and
    fori loops never appear in the backward graph.
    """
    config = _complex_config(A, config)
    if jnp.iscomplexobj(A):
        return _tsqr_impl(A, config)
    return _tsqr_diff(A, config)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tsqr_diff(A, config: QRConfig):
    return _tsqr_impl(A, config)


def _tsqr_diff_fwd(A, config):
    Q, R = _tsqr_impl(A, config)
    return (Q, R), (Q, R)


def _tsqr_diff_bwd(config, residuals, cotangents):
    from .qr import thin_qr_vjp
    Q, R = residuals
    dQ, dR = cotangents
    return (thin_qr_vjp(Q, R, dQ, dR, config.precision),)


_tsqr_diff.defvjp(_tsqr_diff_fwd, _tsqr_diff_bwd)


def _tsqr_impl(A: jnp.ndarray, config: QRConfig):
    m, n = A.shape
    A = A.astype(config.dtype)
    prec = config.precision

    b = max(config.block_rows, 2 * n)
    if m <= b:
        packed, tau = geqr2(A, precision=prec)
        V = unpack_v(packed)
        T = larft(V, tau, precision=prec)
        Q = larfb(jnp.eye(m, n, dtype=A.dtype), V, T, transpose=False,
                  precision=prec)
        return Q, unpack_r(packed)[:n]

    if config.tsqr_leaf == "cholqr2":
        # Direct two-pass CholeskyQR2 -- no tree at all.  The tree only adds
        # HBM passes once a single n x n Gram fits trivially on chip; keep it
        # solely as the lax.cond fallback for cond(A) >~ 1/sqrt(eps), where
        # Cholesky breaks down and Householder leaves are required.
        Q, R, bad = _cholqr2_direct(A, config)
        tree_cfg = config.replace(tsqr_leaf="householder")
        return jax.lax.cond(
            bad, lambda a: _tsqr_tree(a, tree_cfg),
            lambda a: (Q, R), A)

    return _tsqr_tree(A, config)


def _tsqr_tree(A: jnp.ndarray, config: QRConfig):
    """Binary-reduction-tree TSQR (leaves per config.tsqr_leaf)."""
    m, n = A.shape
    prec = config.precision
    b = max(config.block_rows, 2 * n)
    L = ceildiv(m, b)
    A = _pad_rows(A, L * b)
    blocks = A.reshape(L, b, n)

    # Leaves (explicit Q per leaf; method per config.tsqr_leaf).
    Qleaf, R = _leaf_qr(blocks, config)
    levels = []

    # Reduction tree: QR of stacked sibling R's.  Tree nodes use the same
    # leaf method (explicit Q): with cholqr2 the whole tree is batched MXU
    # GEMMs + tiny fused Cholesky recursions -- no per-column chains at all.
    while R.shape[0] > 1:
        Lk = R.shape[0]
        if Lk % 2:  # odd: pad with a zero R block (QR of zeros is zeros)
            R = jnp.concatenate([R, jnp.zeros_like(R[:1])], axis=0)
            Lk += 1
        stacked = R.reshape(Lk // 2, 2 * n, n)
        Qk, R = _leaf_qr(stacked, config)
        levels.append(Qk)                              # (nodes, 2n, n)

    R_final = R[0]

    # Q build-down: root -> leaves.
    Qcur = None  # (num_nodes, n, n) slices handed to each level's nodes
    for Qk in reversed(levels):
        if Qcur is not None:
            # a padded (phantom) sibling at this level has no parent slice:
            # take only the real nodes' n x n pieces
            Qk = jnp.einsum("ibj,ijk->ibk", Qk, Qcur[:Qk.shape[0]],
                            precision=prec)
        # split each node's (2n, n) into its two children's (n, n) pieces
        nodes = Qk.shape[0]
        Qcur = Qk.reshape(nodes * 2, n, n)
    if Qcur is not None:
        Qleaf = jnp.einsum("ibj,ijk->ibk", Qleaf, Qcur[:L], precision=prec)
    Q = Qleaf.reshape(-1, n)[:m]
    return Q, R_final


@partial(jax.jit, static_argnames=("config",))
def tsqr_r(A: jnp.ndarray, config: QRConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """R-only TSQR (no Q build-down) -- the cheap path for normal-equation
    style uses and for the distributed panel factorization."""
    _, R = _tsqr_r_impl(A, config)
    return R


def _tsqr_r_impl(A, config):
    m, n = A.shape
    config = _complex_config(A, config)
    A = A.astype(config.dtype)
    prec = config.precision
    b = max(config.block_rows, 2 * n)
    if m <= b:
        packed, _ = geqr2(A, precision=prec)
        return None, unpack_r(packed)[:n]
    if config.tsqr_leaf == "cholqr2":
        # One pass total: the Q GEMM of _cholqr2_direct is dead code here
        # and XLA eliminates it.
        _, R, bad = _cholqr2_direct(A, config)
        tree_cfg = config.replace(tsqr_leaf="householder")
        return None, jax.lax.cond(
            bad, lambda a: _tsqr_r_impl(a, tree_cfg)[1], lambda a: R, A)
    L = ceildiv(m, b)
    blocks = _pad_rows(A, L * b).reshape(L, b, n)
    _, R = _leaf_qr(blocks, config)
    while R.shape[0] > 1:
        Lk = R.shape[0]
        if Lk % 2:
            R = jnp.concatenate([R, jnp.zeros_like(R[:1])], axis=0)
            Lk += 1
        _, R = _leaf_qr(R.reshape(Lk // 2, 2 * n, n), config)
    return None, R[0]
