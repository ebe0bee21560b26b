"""Pallas TPU panel factorization kernel (geqrt).

TPU-native successor of the reference's ``panelHouseholderKernel``
(qr.cu:60-333).  The reference holds a PR x PC panel in 48 KiB of CUDA
shared memory and cooperates 256 threads on one column at a time; here the
*full-height* m x nb panel lives in ~16 MB VMEM, so there is no sliding
schedule at all -- one kernel instance factors the whole panel and
accumulates the compact-WY T factor in the same pass.

Layout: the panel is processed TRANSPOSED (nb rows x m lanes).  A reflector
is then a (1, m) row vector spread across VPU lanes -- full 8x128 lane
utilization for the masked norm/scale/apply arithmetic, where the
column-major layout would put each reflector in a single lane.  The
reference's two-stage shared-memory tree reduction for ||x||^2
(qr.cu:137-168) collapses to a single masked ``jnp.sum`` along lanes; its
``__syncthreads()`` phase barriers (qr.cu:93,198,267) are implicit in the
single-program dataflow.

Per column j (sequential, lax.fori_loop):
  masked scaled norm -> sign/u/tau/beta (conventions of qr.cu:169-197 plus
  the overflow + zero-column guards the reference lacks);
  V[j, :] = v;  T[:j, j] = -tau_j T[:j, :j] (V v);  T[j, j] = tau_j;
  rank-1 apply to the not-yet-factored rows;  packed write-back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import DEFAULT_CONFIG, QRConfig


def _geqrt_kernel(off_ref, panelT_ref, packedT_ref, tau_ref, Tt_ref, V_ref):
    # Tt_ref holds T TRANSPOSED (column j of T stored as row j): Mosaic only
    # supports dynamic-offset vector stores along sublanes (dim 0), not lanes.
    nb, m = panelT_ref.shape
    dtype = panelT_ref.dtype
    off = off_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    lane_nb = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

    V_ref[:] = jnp.zeros((nb, m), dtype)
    Tt_ref[:] = jnp.zeros((nb, nb), dtype)
    packedT_ref[:] = panelT_ref[:]

    def body(j, _):
        d = off + j
        row = packedT_ref[pl.ds(j, 1), :]                      # (1, m)
        live = lane >= d
        x = jnp.where(live, row, 0)
        x0 = jnp.sum(jnp.where(lane == d, row, 0))

        # Scaled norm (overflow guard; reference sums raw squares qr.cu:146).
        amax = jnp.max(jnp.abs(x))
        s = jnp.where(amax > 0, amax, 1).astype(dtype)
        xs = x / s
        norm = jnp.sqrt(jnp.sum(xs * xs)) * s

        sign = jnp.where(x0 < 0, -1, 1).astype(dtype)
        u = x0 + sign * norm
        degen = norm <= 0                                       # zero column
        safe_u = jnp.where(degen, 1, u)
        tau_j = jnp.where(degen, 0, sign * u / jnp.where(degen, 1, norm))
        beta = jnp.where(degen, x0, -sign * norm)

        tail = jnp.where(lane > d, row / safe_u, 0)
        tail = jnp.where(degen, jnp.zeros_like(tail), tail)
        v = tail + jnp.where(lane == d, 1, 0).astype(dtype)     # (1, m)
        V_ref[pl.ds(j, 1), :] = v

        # T update: g = V^T v (rows > j of V are zero), col_j = -tau T g + tau e_j.
        # Everything is computed in row (lane) layout so the dynamic store to
        # Tt row j needs no relayout: (g^T Tt)[c] = (T g)[c].
        g_row = jax.lax.dot_general(v, V_ref[:], (((1,), (1,)), ((), ())),
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=dtype)  # (1, nb)
        g_row = jnp.where(lane_nb < j, g_row, 0)
        trow = -tau_j * jax.lax.dot_general(
            g_row, Tt_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype)                          # (1, nb)
        trow = trow + tau_j * jnp.where(lane_nb == j, 1, 0).astype(dtype)
        Tt_ref[pl.ds(j, 1), :] = trow

        # Apply H to the not-yet-factored panel rows (> j): rank-1 update.
        w = jax.lax.dot_general(packedT_ref[:], v, (((1,), (1,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=dtype)   # (nb, 1)
        w = jnp.where(row_idx > j, tau_j * w, 0)
        packedT_ref[:] = packedT_ref[:] - w * v                 # outer product

        # Packed write-back of row j: R left of d, beta at d, v-tail right.
        packed_row = jnp.where(lane < d, row, jnp.where(lane == d, beta, tail))
        packedT_ref[pl.ds(j, 1), :] = packed_row
        tau_ref[pl.ds(j, 1), :] = tau_j.reshape(1, 1)
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


def _geqrt_pallas(panel: jnp.ndarray, off, config: QRConfig):
    """Single Pallas call: factor rows >= off of (m x nb) panel.  ``off`` is
    a traced scalar so same-shape call sites lower to identical kernels."""
    m, nb = panel.shape
    compute_dtype = panel.dtype
    panelT = panel.T
    offs = jnp.asarray(off, dtype=jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((nb, m), compute_dtype)],
    )
    packedT, tau2d, Tt = pl.pallas_call(
        _geqrt_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, m), compute_dtype),
            jax.ShapeDtypeStruct((nb, 1), compute_dtype),
            jax.ShapeDtypeStruct((nb, nb), compute_dtype),
        ),
        interpret=config.resolved_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * nb * nb, bytes_accessed=3 * m * nb * 4,
            transcendentals=nb),
    )(offs, panelT)
    return packedT.T, tau2d[:, 0], Tt.T


def _unpack_v_dyn(packed: jnp.ndarray, off) -> jnp.ndarray:
    """unpack_v with a traced row offset."""
    m, n = packed.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1) + jnp.asarray(off, jnp.int32)
    return jnp.where(r > c, packed, jnp.where(r == c, 1, 0).astype(packed.dtype))


def _geqrt_recursive(panel: jnp.ndarray, off, config: QRConfig):
    """Recursive blocked panel factorization (Elmroth/Gustavson style).

    Factor the left half, apply its block reflector to the right half (MXU
    GEMMs), factor the right half, then combine the T factors:
        T = [[T_l, -T_l (V_l^T V_r) T_r], [0, T_r]].
    This converts ~75% of the panel's flops from the sequential per-column
    recurrence into matmuls; only base-width (config.panel_base) sub-panels
    run the sequential Pallas kernel.
    """
    from .householder import larfb
    m, nb = panel.shape
    if nb <= config.panel_base:
        return _geqrt_pallas(panel, off, config)
    h = nb // 2
    lp, tau_l, T_l = _geqrt_recursive(panel[:, :h], off, config)
    V_l = _unpack_v_dyn(lp, off)
    right = larfb(panel[:, h:], V_l, T_l, transpose=True,
                  precision=config.precision)
    rp, tau_r, T_r = _geqrt_recursive(right, jnp.asarray(off) + h, config)
    V_r = _unpack_v_dyn(rp, jnp.asarray(off) + h)
    prec = config.precision
    G = jnp.einsum("ij,ik->jk", V_l, V_r, precision=prec)       # V_l^T V_r
    T12 = -jnp.einsum("ij,jk,kl->il", T_l, G, T_r, precision=prec)
    T = jnp.block([[T_l, T12],
                   [jnp.zeros((nb - h, h), T_l.dtype), T_r]])
    return (jnp.concatenate([lp, rp], axis=1),
            jnp.concatenate([tau_l, tau_r]), T)


@functools.partial(jax.jit, static_argnames=("off", "config"))
def geqrt_panel(panel: jnp.ndarray, off: int, config: QRConfig = DEFAULT_CONFIG):
    """Factor rows >= off of a full-height (m x nb) panel.

    Returns (packed_panel (m x nb), tau (nb,), T (nb, nb)).  Dispatches to
    the recursive Pallas path on TPU; falls back to the jnp path for panels
    too tall for VMEM residency or dtypes the kernel does not compute
    natively (fp64; bf16 is computed in fp32 and cast back).
    """
    m, nb = panel.shape
    cast_back = None
    if panel.dtype == jnp.bfloat16:
        cast_back = jnp.bfloat16
        panel = panel.astype(jnp.float32)

    if m > config.max_vmem_panel_rows or panel.dtype == jnp.float64:
        from .householder import geqr2, larft, unpack_v
        lo, tau = geqr2(panel[off:], row_offset=0, precision=config.precision)
        T = larft(unpack_v(lo, 0), tau, precision=config.precision)
        packed = jnp.concatenate([panel[:off], lo], axis=0) if off else lo
    else:
        packed, tau, T = _geqrt_recursive(panel, off, config)
    if cast_back is not None:
        packed = packed.astype(cast_back)
    return packed, tau, T
