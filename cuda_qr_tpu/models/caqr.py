"""User-facing distributed CAQR: padding wrapper over parallel.caqr.

BASELINE.json config 5's entry point: block-row-distributed QR of a large
square-ish matrix over an ICI mesh, panels tree-reduced across chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..parallel.caqr import CAQRFactors, caqr_factor, caqr_orgqr
from ..parallel.mesh import ROW_AXIS, row_sharding
from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.geometry import round_up


def _pad_for_mesh(A: jnp.ndarray, mesh: Mesh, nb: int):
    m, n = A.shape
    P_ = mesh.shape[ROW_AXIS]
    n_pad = round_up(n, nb)
    m_pad = max(round_up(m, P_ * nb), round_up(n_pad, P_ * nb))
    if (m_pad, n_pad) != (m, n):
        A = jnp.pad(A, ((0, m_pad - m), (0, n_pad - n)))
    return A


def caqr(A: jnp.ndarray, mesh: Mesh, config: QRConfig = DEFAULT_CONFIG):
    """Thin distributed QR: returns (Q (m x n) row-sharded, R (n x n)
    replicated).  Arbitrary m >= n; pads internally to the mesh grid."""
    m, n = A.shape
    if m < n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"caqr requires m >= n, got {m}x{n}")
    Ap = _pad_for_mesh(jnp.asarray(A), mesh, config.panel_width)
    Ap = jax.device_put(Ap, row_sharding(mesh))
    factors, R = caqr_factor(Ap, mesh, config)
    Q = caqr_orgqr(factors, mesh, Ap.shape[1], config)
    return Q[:m, :n], R[:n, :n]


def caqr_r(A: jnp.ndarray, mesh: Mesh,
           config: QRConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """R-only distributed factorization."""
    m, n = A.shape
    Ap = _pad_for_mesh(jnp.asarray(A), mesh, config.panel_width)
    Ap = jax.device_put(Ap, row_sharding(mesh))
    _, R = caqr_factor(Ap, mesh, config)
    return R[:n, :n]
