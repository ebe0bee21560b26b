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

    def one_round(A):
        G = jnp.einsum("lbi,lbj->lij", A, A, precision=precision)
        Lc, Li = jax.vmap(lambda g: cholesky_with_inv(g, precision))(G)
        Q = jnp.einsum("lbi,lji->lbj", A, Li, precision=precision)  # A L^-T
        return Q, Lc.swapaxes(1, 2)                                  # R upper

    Q1, R1 = one_round(blocks)
    Q, R2 = one_round(Q1)
    R = jnp.einsum("lij,ljk->lik", R2, R1, precision=precision)
    return Q, R


def _leaf_qr(blocks: jnp.ndarray, config: QRConfig):
    """Leaf factorization -> (Q_leaf (L,b,n), R (L,n,n)) by config.tsqr_leaf,
    with silent per-batch fallback to Householder when CholeskyQR2 breaks
    down (non-finite output from a rank-deficient / ill-conditioned leaf)."""
    prec = config.precision

    def householder(blocks):
        packed, T, R = _batched_qr(blocks, prec)
        return _batched_orgqr(packed, T, prec), R

    if config.tsqr_leaf == "cholqr2":
        Q, R = _batched_cholqr2(blocks, prec)
        bad = ~jnp.isfinite(jnp.sum(Q) + jnp.sum(R))
        # lax.cond: the Householder branch only executes when CholeskyQR2
        # actually produced non-finite output (rank-deficient leaf).
        return jax.lax.cond(bad, householder, lambda b: (Q, R), blocks)
    return householder(blocks)


def _batched_orgqr(packed: jnp.ndarray, T: jnp.ndarray, precision):
    """Explicit thin Q (L, b, n) from batched packed factors."""
    L, b, n = packed.shape
    eye = jnp.broadcast_to(jnp.eye(b, n, dtype=packed.dtype), (L, b, n))
    V = jax.vmap(unpack_v)(packed)
    return jax.vmap(lambda e, v, t: larfb(e, v, t, transpose=False,
                                          precision=precision))(eye, V, T)


def _pad_rows(A: jnp.ndarray, rows: int) -> jnp.ndarray:
    m = A.shape[0]
    return A if m == rows else jnp.pad(A, ((0, rows - m), (0, 0)))


@partial(jax.jit, static_argnames=("config",))
def tsqr(A: jnp.ndarray, config: QRConfig = DEFAULT_CONFIG):
    """Thin QR of a tall-skinny A (m x n, n <= config.panel_width) via a
    binary reduction tree.  Returns (Q (m x n), R (n x n)).

    R carries the usual TSQR sign ambiguity (each tree node applies its own
    reflector sign convention); diag(R) is NOT forced positive, matching the
    reference's convention-free verification (it only checks ||QR - A||).
    """
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
    A = A.astype(config.dtype)
    prec = config.precision
    b = max(config.block_rows, 2 * n)
    if m <= b:
        packed, _ = geqr2(A, precision=prec)
        return None, unpack_r(packed)[:n]
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
