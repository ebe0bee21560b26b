"""scipy.linalg-compatible QR-updating surface.

Drop-in signatures for ``scipy.linalg.qr_update`` / ``qr_insert`` /
``qr_delete`` so scipy users can switch without relearning the API
(capability extension beyond the reference, which has no updating at all --
it factors once per process, qr.cu:475-553).  Thin wrappers over
``cuda_qr_tpu.models.update``'s Givens-chain primitives.

Differences from scipy, stated rather than hidden:
  * thin factors only (Q m x n, R n x n) -- scipy's "full" (square-Q)
    economy modes are not supported; pass the factors ``cuda_qr_tpu.qr``
    returns.
  * ``overwrite_*`` / ``check_finite`` flags are accepted and ignored
    (JAX arrays are immutable; non-finite inputs propagate NaNs).
  * outputs are JAX arrays on the default device.
"""

from __future__ import annotations

import jax.numpy as jnp

from .update import (qr_col_delete, qr_col_insert,
                     qr_row_delete, qr_row_insert)
from .update import qr_update as _qr_update_k

__all__ = ["qr_update", "qr_insert", "qr_delete"]


def qr_update(Q, R, u, v, overwrite_qruv=False, check_finite=True):
    """QR of A + u v^H from (Q, R); u (m,) or (m, k), v (n,) or (n, k)."""
    del overwrite_qruv, check_finite
    return _qr_update_k(jnp.asarray(Q), jnp.asarray(R),
                        jnp.asarray(u), jnp.asarray(v))


def qr_insert(Q, R, u, k, which="row", rcond=None, overwrite_qru=False,
              check_finite=True):
    """QR of A with row(s)/column(s) ``u`` inserted before index k.

    which='row': u (n,) or (p, n) -- p rows inserted at k.
    which='col': u (m,) or (m, p) -- p columns inserted at k (needs
    m > n + p so the thin basis can grow).
    """
    del rcond, overwrite_qru, check_finite
    Q, R, u = jnp.asarray(Q), jnp.asarray(R), jnp.asarray(u)
    if which == "row":
        rows = u[None] if u.ndim == 1 else u
        for i in range(rows.shape[0]):
            Q, R = qr_row_insert(Q, R, rows[i], k=k + i)
        return Q, R
    if which == "col":
        cols = u[:, None] if u.ndim == 1 else u
        for i in range(cols.shape[1]):
            Q, R = qr_col_insert(Q, R, cols[:, i], k=k + i)
        return Q, R
    raise ValueError(f"which must be 'row' or 'col', got {which!r}")


def qr_delete(Q, R, k, p=1, which="row", overwrite_qr=False,
              check_finite=True):
    """QR of A with p rows (or columns) removed starting at index k."""
    del overwrite_qr, check_finite
    Q, R = jnp.asarray(Q), jnp.asarray(R)
    if which == "row":
        for _ in range(p):
            Q, R = qr_row_delete(Q, R, k)
        return Q, R
    if which == "col":
        for _ in range(p):
            Q, R = qr_col_delete(Q, R, k)
        return Q, R
    raise ValueError(f"which must be 'row' or 'col', got {which!r}")
