"""Distributed TSQR over an ICI mesh (shard_map + collectives).

The multi-chip form of models/tsqr.py: each shard runs the in-chip TSQR on
its row block, R factors are combined across chips, and the thin Q is
recovered by one small n x n GEMM per shard.  Two combine strategies:

  * all-gather ("allreduce TSQR"): every chip gathers all P R factors
    (P * n^2 words over ICI) and redundantly factors the P*n x n stack.
    One round, no tree latency -- optimal for small n on a fast ICI.
  * butterfly: log2(P) rounds of pairwise R exchange (ppermute), each chip
    factoring a 2n x n stack per round -- the classic communication-avoiding
    tree of Demmel et al. (the paper the reference cites, README.md:3).

Both keep every GEMM shard-local; only n x n triangles cross the wire.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.tsqr import tsqr as tsqr_local
from ..ops.householder import geqr2, larfb, larft, unpack_r, unpack_v
from ..utils.config import DEFAULT_CONFIG, QRConfig
from .mesh import ROW_AXIS


def _small_qr_q(stacked: jnp.ndarray, prec):
    """Explicit (rows x n) Q and (n x n) R of a small stacked matrix."""
    rows, n = stacked.shape
    packed, tau = geqr2(stacked, precision=prec)
    V = unpack_v(packed)
    T = larft(V, tau, precision=prec)
    Q = larfb(jnp.eye(rows, n, dtype=stacked.dtype), V, T, transpose=False,
              precision=prec)
    return Q, unpack_r(packed)[:n]


def _cholesky_combine(R_l, prec, dtype):
    """(mine, R, bad): CholeskyQR2 of the psum'd Gram of the local R factors.

    Two n x n psums total; each shard's n x n map `mine` satisfies
    R_l = mine @ R with stacked `mine` orthonormal -- the same math as the
    basis-kernel CAQR combine (parallel/caqr.py), without needing the full
    tree transform since TSQR has no trailing matrix.
    """
    from ..ops.smalllinalg import cholesky_with_inv

    n = R_l.shape[1]
    eye = jnp.eye(n, dtype=dtype)
    G = jax.lax.psum(
        jnp.einsum("ij,ik->jk", R_l, R_l, precision=prec), ROW_AXIS)
    L1, L1i = cholesky_with_inv(G, prec)
    M0 = jnp.einsum("ij,kj->ik", R_l, L1i, precision=prec)
    G2 = jax.lax.psum(
        jnp.einsum("ij,ik->jk", M0, M0, precision=prec), ROW_AXIS)
    E = G2 - eye
    emax = jnp.max(jnp.abs(E))
    tol = 3e-4 if dtype == jnp.float32 else 3e-8

    def taylor(E):
        C = jnp.tril(E, -1) + 0.5 * jnp.diag(jnp.diagonal(E))
        return eye + C, eye - C

    L2, L2i = jax.lax.cond(
        emax < tol, taylor,
        lambda E: cholesky_with_inv(E + eye, prec), E)
    mine = jnp.einsum("ij,kj->ik", M0, L2i, precision=prec)
    R = jnp.einsum("ji,kj->ik", L2, L1, precision=prec)
    bad = (~jnp.isfinite(jnp.sum(mine))) | (emax > 0.3)
    return mine, jnp.triu(R), bad


@partial(jax.jit, static_argnames=("mesh", "config", "strategy"))
def tsqr_dist(A: jnp.ndarray, mesh: Mesh, config: QRConfig = DEFAULT_CONFIG,
              strategy: str = "allgather"):
    """Thin QR of row-sharded tall-skinny A.  Returns (Q row-sharded like A,
    R replicated).

    Strategies (combine words per shard, n x n triangles over ICI):
      "cholesky":  2 psums (~4 n^2) -- CholeskyQR2 on the psum'd Gram with a
                   lax.cond fallback to "allgather" on breakdown.  Fastest.
      "allgather": P n^2, one round, unconditionally stable.
      "butterfly": log2(P) rounds of n^2 (power-of-two P only).
    """
    if strategy not in ("allgather", "butterfly", "cholesky"):
        raise ValueError(f"unknown strategy {strategy!r}")
    m, n = A.shape
    prec = config.precision
    nper = mesh.shape[ROW_AXIS]
    if m % nper:
        raise ValueError(f"m={m} must divide the mesh ({nper} shards)")
    if strategy == "cholesky" and jnp.iscomplexobj(A):
        # _cholesky_combine's Gram einsums are real-only; the Householder
        # combines are conjugation-correct throughout.
        raise ValueError(
            "strategy='cholesky' is real-only; use 'allgather' or "
            "'butterfly' for complex input")
    if strategy == "butterfly" and (nper & (nper - 1)) != 0:
        # s ^ step would address partners >= P: silently wrong factorization.
        raise ValueError(
            f"butterfly strategy needs a power-of-two shard count, got {nper};"
            " use strategy='allgather'")

    def shard_fn(a):
        # 1. local (in-chip) TSQR of this shard's rows
        Q_l, R_l = tsqr_local(a, config)
        if strategy == "cholesky":
            mine, R, bad = _cholesky_combine(R_l, prec, a.dtype)

            def fallback(R_l):
                # stacked Householder QR (as "allgather"), shard-uniform bad
                Rs = jax.lax.all_gather(R_l, ROW_AXIS)
                Qhat, Rg = _small_qr_q(Rs.reshape(nper * n, n), prec)
                i = jax.lax.axis_index(ROW_AXIS)
                return jax.lax.dynamic_slice_in_dim(Qhat, i * n, n, 0), Rg

            mine, R = jax.lax.cond(
                bad, fallback, lambda _: (mine, R), R_l)
            Q = jnp.einsum("ij,jk->ik", Q_l, mine, precision=prec)
            return Q, R
        if strategy == "allgather":
            # 2. every chip gathers all R factors and factors the stack
            Rs = jax.lax.all_gather(R_l, ROW_AXIS)          # (P, n, n)
            Qhat, R = _small_qr_q(Rs.reshape(nper * n, n), prec)
            i = jax.lax.axis_index(ROW_AXIS)
            mine = jax.lax.dynamic_slice_in_dim(Qhat, i * n, n, axis=0)
        else:
            # 2'. butterfly: pairwise exchange + 2n x n QR, log2(P) rounds
            i = jax.lax.axis_index(ROW_AXIS)
            mine = jnp.eye(n, dtype=a.dtype)
            R = R_l
            step = 1
            while step < nper:
                other = jax.lax.ppermute(
                    R, ROW_AXIS,
                    [(s, s ^ step) for s in range(nper)])
                first = (i & step) == 0  # do I supply the top block?
                top = jnp.where(first, R, other)
                bot = jnp.where(first, other, R)
                Qp, R = _small_qr_q(jnp.concatenate([top, bot]), prec)
                piece = jnp.where(first, Qp[:n], Qp[n:])
                mine = jnp.einsum("ij,jk->ik", mine, piece, precision=prec)
                step *= 2
        # 3. thin Q: local Q times my n x n slice of the combine Q
        Q = jnp.einsum("ij,jk->ik", Q_l, mine, precision=prec)
        return Q, R

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(ROW_AXIS, None),
        out_specs=(P(ROW_AXIS, None), P()),
        check_vma=False,
    )(A)
