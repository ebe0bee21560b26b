"""Blocked Householder QR driver (geqrf) and Q operators (orgqr/ormqr).

This is the TPU replacement for the reference's ``mmqr`` driver
(qr.cu:475-553).  Where the reference slides PR-tall panels bottom-to-top to
fit a 48 KiB shared memory budget (qr.cu:505-508) -- serializing the machine
on one CUDA block per panel step -- the TPU has ~16 MB of VMEM per core, so
each panel is factored *full height* in one shot (VMEM easily holds an
8192 x 128 fp32 panel) and the trailing update is a handful of large MXU
GEMMs.  The panel loop is a Python unroll over n/nb statically-shaped steps:
every shape is static under jit, row/column ranges shrink per panel, and XLA
schedules the whole factorization as one fused program.

Factor storage is (packed, taus, Ts):
  packed: (m_pad, n_pad) LAPACK packed V/R, unit-lower V below the diagonal
          (reference layout, qr.cu:184-197 / qr.cu:316-325);
  taus:   (k, nb) per-panel reflector scales (reference tau array,
          qr.cu:517, but on a dense full-height panel grid);
  Ts:     (k, nb, nb) per-panel compact-WY T factors (the reference instead
          re-materializes W = -V T per panel step through global memory,
          qr.cu:495).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.geometry import round_up
from .householder import geqr2, larfb, larft, unpack_r, unpack_v


class PackedQR(NamedTuple):
    """Packed blocked-QR factors (a JAX pytree; all leaves are arrays)."""
    packed: jnp.ndarray   # (m_pad, n_pad)
    taus: jnp.ndarray     # (k, nb)
    Ts: jnp.ndarray       # (k, nb, nb)


def _panel_factor(panel: jnp.ndarray, off: int, config: QRConfig):
    """Factor rows >= off of a full-height (m_pad x nb) panel.

    Returns (packed_panel, tau, T) with T the compact-WY factor of the
    panel's reflectors.  Dispatches to the Pallas VMEM-resident kernel on
    TPU or the pure-jnp path elsewhere.
    """
    if config.use_pallas:
        from .geqrt import geqrt_panel  # local import: optional dependency cycle
        return geqrt_panel(panel, off, config)
    lo = panel[off:]
    lo_packed, tau = geqr2(lo, row_offset=0, precision=config.precision)
    V = unpack_v(lo_packed, 0)
    T = larft(V, tau, precision=config.precision)
    packed = jnp.concatenate([panel[:off], lo_packed], axis=0) if off else lo_packed
    return packed, tau, T


def _pad(A: jnp.ndarray, nb: int):
    m, n = A.shape
    m_pad, n_pad = round_up(m, nb), round_up(n, nb)
    if (m_pad, n_pad) != (m, n):
        A = jnp.pad(A, ((0, m_pad - m), (0, n_pad - n)))
    return A


@partial(jax.jit, static_argnames=("config",))
def qr_blocked(A: jnp.ndarray, config: QRConfig = DEFAULT_CONFIG) -> PackedQR:
    """Blocked QR factorization of A (m x n, m >= n after internal padding).

    Arbitrary m, n are handled by zero-padding to the panel grid -- removing
    the reference's hard alignment precondition under which misaligned sizes
    silently corrupt the factorization (SURVEY.md S4, qr.cu:722-734).
    """
    m, n = A.shape
    if m < n:
        raise ValueError(f"qr_blocked requires m >= n, got {m}x{n}")
    nb = config.panel_width
    A = _pad(A.astype(config.dtype), nb)
    m_pad, n_pad = A.shape
    k = n_pad // nb

    taus, Ts = [], []
    cols = [None] * k
    for i in range(k):
        off = i * nb
        panel = A[:, off:off + nb]
        panel, tau, T = _panel_factor(panel, off, config)
        cols[i] = panel
        taus.append(tau)
        Ts.append(T)
        if off + nb < n_pad:
            V = unpack_v(panel[off:], 0)
            trail = larfb(A[off:, off + nb:], V, T, transpose=True,
                          precision=config.precision)
            A = jnp.concatenate(
                [A[:, :off + nb],
                 jnp.concatenate([A[:off, off + nb:], trail], axis=0)], axis=1)
    packed = jnp.concatenate(cols, axis=1)
    return PackedQR(packed=packed, taus=jnp.stack(taus), Ts=jnp.stack(Ts))


@partial(jax.jit, static_argnames=("m", "n", "config"))
def orgqr(factors: PackedQR, m: int, n: int,
          config: QRConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Form thin explicit Q (m x n) from packed factors.

    Production-grade replacement for the reference's verification-only
    explicitQR (qr.cu:582-686), which multiplies a dense m x m H per
    reflector into Q (O(m^3) each); here each *panel* costs three GEMMs:
    Q <- Q - V T (V^T Q), applied last panel to first.
    """
    packed, taus, Ts = factors
    m_pad, n_pad = packed.shape
    nb = config.panel_width
    k = n_pad // nb
    Q = jnp.eye(m_pad, n, dtype=packed.dtype)
    for i in reversed(range(k)):
        off = i * nb
        V = unpack_v(packed[off:, off:off + nb], 0)
        Q = Q.at[off:].set(
            larfb(Q[off:], V, Ts[i], transpose=False, precision=config.precision))
    return Q[:m]


@partial(jax.jit, static_argnames=("transpose", "config"))
def ormqr(factors: PackedQR, B: jnp.ndarray, transpose: bool = True,
          config: QRConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Apply Q^T (transpose=True) or Q to B (m x p) without forming Q."""
    packed, taus, Ts = factors
    m_pad, n_pad = packed.shape
    nb = config.panel_width
    k = n_pad // nb
    mB = B.shape[0]
    if mB < m_pad:
        B = jnp.pad(B, ((0, m_pad - mB), (0, 0)))
    order = range(k) if transpose else reversed(range(k))
    for i in order:
        off = i * nb
        V = unpack_v(packed[off:, off:off + nb], 0)
        B = B.at[off:].set(
            larfb(B[off:], V, Ts[i], transpose=transpose,
                  precision=config.precision))
    return B[:mB]


def extract_r(factors: PackedQR, n: int, square: bool = True) -> jnp.ndarray:
    """R from packed storage (upper triangle; qr.cu:585-594 analog)."""
    R = unpack_r(factors.packed[:, :n], 0)
    return R[:n] if square else R
