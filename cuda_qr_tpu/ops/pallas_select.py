"""Pallas TPU kernel: greedy QRCP pivot selection on a sketch tile.

The randomized-QRCP block step (ops/qrcp.py) picks nb pivot columns by
greedy Gram-Schmidt on an (l x cand) sketch tile.  As an XLA op chain that
is nb sequential steps of ~6 dispatched ops each (~0.8 ms per 128-wide
block at ~1 us/op) -- the same dispatch-floor problem the panel Cholesky
chain had.  This kernel runs the whole selection as ONE Mosaic program:
straight-line Python-unrolled steps, each a handful of VPU tile ops plus
one dot_general, on a VMEM-resident tile (160 x 512 fp32 = 320 KB).

Per step i:
  p      = first index of max downdated norm        (masked min-reduce)
  q      = S e_p                                    (one-hot masked sum)
  proj   = q^T S                                    (dot_general over rows)
  S     -= q (proj / ||q||^2)                       (rank-1, exact norm)
  norms  = max(norms - proj^2 / ||q||^2, 0), p and previous picks -> -1
  ord[p] = i

Selection uses downdated norms (the classical geqp3 compromise) but
normalizes by the exact recomputed ||q||^2, so the orthogonalization
itself does not drift.  Ties pick the lowest index, matching the jnp
reference path (jnp.argmax).  Already-ineligible columns arrive with
norm -1 and are never picked (live norms are >= 0).

Reference analog: single-resident-kernel panel work, qr.cu:60-333.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_H = jax.lax.Precision.HIGHEST


def _select_kernel(nb: int, S_ref, norms_ref, ord_ref):
    l, cand = S_ref.shape
    dtype = S_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cand), 1)

    S = S_ref[:]
    norms = norms_ref[:]                                   # (1, cand)
    order = jnp.full((1, cand), -1, jnp.int32)
    for i in range(nb):
        mx = jnp.max(norms)
        p = jnp.min(jnp.where(norms == mx, lane, cand))    # first argmax
        onehot = (lane == p).astype(dtype)                 # (1, cand)
        q = jnp.sum(S * onehot, axis=1, keepdims=True)     # (l, 1)
        nq2 = jnp.sum(q * q)
        inv = jnp.where(nq2 > 0, 1 / nq2, 0)
        proj = jax.lax.dot_general(q, S, (((0,), (0,)), ((), ())),
                                   precision=_H,
                                   preferred_element_type=dtype)  # (1, cand)
        S = S - q * (proj * inv)
        nn = jnp.maximum(norms - proj * proj * inv, 0)
        norms = jnp.where((lane == p) | (norms < 0), -1.0, nn)
        order = jnp.where(lane == p, i, order)
    ord_ref[:] = order


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def select_pivots_pallas(Sc: jnp.ndarray, norms: jnp.ndarray, nb: int,
                         interpret: bool = False) -> jnp.ndarray:
    """ord (cand,) int32: selection rank 0..nb-1 for the nb chosen columns
    of the (l, cand) sketch tile, -1 elsewhere.  norms is the (cand,)
    initial squared-norm vector with -1 marking ineligible columns."""
    l, cand = Sc.shape
    out = pl.pallas_call(
        functools.partial(_select_kernel, nb),
        out_shape=jax.ShapeDtypeStruct((1, cand), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * nb * l * cand, bytes_accessed=4 * l * cand,
            transcendentals=0),
    )(Sc, norms.reshape(1, cand).astype(Sc.dtype))
    return out[0]


def supported(l: int, cand: int, nb: int, dtype) -> bool:
    """f32, lane-aligned tile, VMEM-trivial, bounded unroll."""
    return (dtype == jnp.float32 and cand % 128 == 0 and l % 8 == 0
            and 1 <= nb <= 256 and l * cand * 4 <= 4 * 1024 * 1024)
