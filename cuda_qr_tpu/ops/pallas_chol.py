"""Pallas TPU kernel: fused Cholesky factor + inverse of an nb x nb SPD G.

The blocked-QR panel bottleneck after the basis-kernel change is the ONE
remaining sequential chain per panel: chol(Gram) and its inverse.  The XLA
formulation (smalllinalg.cholesky_with_inv: recursive blocks, unrolled
bases, batched-doubling inverses) costs ~0.33 ms per 128x128 at ~1 us per
dependent XLA op.  This kernel runs the identical math as ONE Mosaic
program: fully static straight-line code (Python-unrolled 16-column base
blocks), so a column step is a handful of VPU instructions on (16, nb)
tiles instead of a dispatched XLA op, and the per-block trailing updates
are single MXU dot_generals.

Layout: L is produced TRANSPOSED (Lt row j = L column j) because column j
is generated as a row vector across lanes -- the same trick as the geqrt
kernel (geqrt.py:38).  L^{-1} is produced in natural (row) layout by block
forward substitution, each row assembled with a masked broadcast-reduce
instead of a dynamic store.

Semantics match smalllinalg exactly: a non-PD input yields NaN/Inf (no
raise); callers lax.cond on finiteness to trigger their Householder
fallback (fast_panel.py).

Reference analog: the shared-memory single-block panel factorization
(qr.cu:60-333) -- one resident kernel instead of a kernel-launch chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BB = 16  # base block width (sublane count of an fp32 tile)
_H = jax.lax.Precision.HIGHEST


def _chol_inv_kernel(G_ref, Lt_ref, Li_ref, S_ref):
    nb = G_ref.shape[0]
    dtype = G_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    rows16 = jax.lax.broadcasted_iota(jnp.int32, (_BB, 1), 0)

    S_ref[:] = G_ref[:]
    Lt_ref[:] = jnp.zeros((nb, nb), dtype)

    # --- Cholesky: right-looking by 16-column blocks, columns as rows ---
    for bi in range(nb // _BB):
        r0 = bi * _BB
        slab = S_ref[r0:r0 + _BB, :]                    # rows r0..r0+16 of S
        for j in range(_BB):
            jj = r0 + j
            d = jax.lax.rsqrt(slab[j:j + 1, jj:jj + 1])             # (1, 1)
            crow = jnp.where(lane >= jj, slab[j:j + 1, :] * d, 0)   # L col jj
            Lt_ref[jj:jj + 1, :] = crow
            tcol = jnp.where(rows16 > j, slab[:, jj:jj + 1] * d, 0)
            slab = slab - tcol * crow                   # rank-1, slab only
        if r0 + _BB < nb:
            C = Lt_ref[r0:r0 + _BB, :]                  # block's L columns
            U = jax.lax.dot_general(C, C, (((0,), (0,)), ((), ())),
                                    precision=_H,
                                    preferred_element_type=dtype)
            S_ref[r0 + _BB:, :] = S_ref[r0 + _BB:, :] - U[r0 + _BB:, :]

    # --- L^{-1} by block forward substitution: L X = I, row layout ---
    for bi in range(nb // _BB):
        r0 = bi * _BB
        Dt = Lt_ref[r0:r0 + _BB, r0:r0 + _BB]   # Dt[a, b] = L[r0+b, r0+a]
        eye_rows = (lane == r0 + rows16).astype(dtype)  # rows of I
        if r0 > 0:
            # L[r0:r0+16, :r0] @ X_above, with L read from Lt via dot dims
            acc = jax.lax.dot_general(
                Lt_ref[:r0, r0:r0 + _BB], Li_ref[:r0, :],
                (((0,), (0,)), ((), ())), precision=_H,
                preferred_element_type=dtype)           # (16, nb)
            B = eye_rows - acc
        else:
            B = eye_rows
        X = jnp.zeros((_BB, nb), dtype)
        for j in range(_BB):
            coefs = jnp.where(rows16 < j, Dt[:, j:j + 1], 0)        # (16, 1)
            acc_j = jnp.sum(coefs * X, axis=0, keepdims=True)       # (1, nb)
            xrow = (B[j:j + 1, :] - acc_j) / Dt[j:j + 1, j:j + 1]
            X = jnp.where(rows16 == j, xrow, X)
        Li_ref[r0:r0 + _BB, :] = X


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_with_inv_pallas(G: jnp.ndarray, interpret: bool = False):
    """(L, L^{-1}) of SPD G via the fused Mosaic kernel.

    Drop-in for smalllinalg.cholesky_with_inv when G is float32 with
    size a multiple of 16 (<= 512).  NaNs out on non-PD input.
    """
    nb = G.shape[0]
    Lt, Li = pl.pallas_call(
        _chol_inv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nb, nb), G.dtype),
            jax.ShapeDtypeStruct((nb, nb), G.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((nb, nb), G.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb ** 3 // 3, bytes_accessed=3 * nb * nb * 4,
            transcendentals=nb),
    )(G)
    return Lt.T, Li


def supported(G_shape, dtype) -> bool:
    """Kernel eligibility: square f32, 16-multiple side, VMEM-trivial."""
    nb = G_shape[0]
    return (dtype == jnp.float32 and nb % _BB == 0 and 16 <= nb <= 512)
