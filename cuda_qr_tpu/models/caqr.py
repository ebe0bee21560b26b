"""User-facing distributed CAQR: padding wrapper over parallel.caqr.

BASELINE.json config 5's entry point: block-row-distributed QR of a large
square-ish matrix over an ICI mesh, panels tree-reduced across chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..parallel.caqr import caqr_factor, caqr_orgqr, cyclic_permutation
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


def caqr(A: jnp.ndarray, mesh: Mesh, config: QRConfig = DEFAULT_CONFIG,
         layout: str = "block", combine: str = "bk"):
    """Thin distributed QR: returns (Q (m x n) row-sharded, R (n x n)
    replicated).  Arbitrary m >= n; pads internally to the mesh grid.

    layout="cyclic" deals nb-row blocks round-robin over the mesh (the
    ScaLAPACK-style distribution of BASELINE.json config 5): every shard
    stays busy until the last P panels instead of going idle once the
    diagonal passes its contiguous block.  Rows are permuted into / out of
    the cyclic storage order here; production callers that already hold
    cyclic data should use parallel.caqr.caqr_factor directly.

    combine="bk" (default) applies each panel's tree Q in basis-kernel form
    (O(nb * trailing) psum words per panel); "allgather" is the one-round
    redundant stacked-QR combine (O(P * nb * trailing) words)."""
    m, n = A.shape
    if m < n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"caqr requires m >= n, got {m}x{n}")
    A = jnp.asarray(A)
    if jnp.iscomplexobj(A):  # Gram-free combine + complex leaf conventions
        config = config.replace(dtype=A.dtype, use_pallas=False,
                                use_chol_kernel=False)
        combine = "allgather"
    nb = config.panel_width
    Ap = _pad_for_mesh(A, mesh, nb)
    from ..parallel.mesh import ROW_AXIS
    P_ = mesh.shape[ROW_AXIS]
    if layout == "cyclic":
        perm, inv = cyclic_permutation(Ap.shape[0], nb, P_)
        Ap = Ap[jnp.asarray(perm)]
    Ap = jax.device_put(Ap, row_sharding(mesh))
    factors, R = caqr_factor(Ap, mesh, config, layout=layout, combine=combine)
    Q = caqr_orgqr(factors, mesh, Ap.shape[1], config, layout=layout)
    if layout == "cyclic":
        Q = Q[jnp.asarray(inv)]
    return Q[:m, :n], R[:n, :n]


def caqr_r(A: jnp.ndarray, mesh: Mesh, config: QRConfig = DEFAULT_CONFIG,
           combine: str = "bk") -> jnp.ndarray:
    """R-only distributed factorization."""
    m, n = A.shape
    A = jnp.asarray(A)
    if jnp.iscomplexobj(A):
        config = config.replace(dtype=A.dtype, use_pallas=False,
                                use_chol_kernel=False)
        combine = "allgather"
    Ap = _pad_for_mesh(A, mesh, config.panel_width)
    Ap = jax.device_put(Ap, row_sharding(mesh))
    _, R = caqr_factor(Ap, mesh, config, combine=combine)
    return R[:n, :n]
