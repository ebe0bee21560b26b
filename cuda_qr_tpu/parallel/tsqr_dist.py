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


@partial(jax.jit, static_argnames=("mesh", "config", "strategy"))
def tsqr_dist(A: jnp.ndarray, mesh: Mesh, config: QRConfig = DEFAULT_CONFIG,
              strategy: str = "allgather"):
    """Thin QR of row-sharded tall-skinny A.  Returns (Q row-sharded like A,
    R replicated)."""
    if strategy not in ("allgather", "butterfly"):
        raise ValueError(f"unknown strategy {strategy!r}")
    m, n = A.shape
    prec = config.precision
    nper = mesh.shape[ROW_AXIS]
    if m % nper:
        raise ValueError(f"m={m} must divide the mesh ({nper} shards)")
    if strategy == "butterfly" and (nper & (nper - 1)) != 0:
        # s ^ step would address partners >= P: silently wrong factorization.
        raise ValueError(
            f"butterfly strategy needs a power-of-two shard count, got {nper};"
            " use strategy='allgather'")

    def shard_fn(a):
        # 1. local (in-chip) TSQR of this shard's rows
        Q_l, R_l = tsqr_local(a, config)
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
