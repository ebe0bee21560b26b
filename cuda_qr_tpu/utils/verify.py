"""Residual / orthogonality verification.

The reference's verification discipline -- rebuild Q and R, check
||QR - A||_2 (qr.c:499-515) -- but always-on and cheap: thin-Q GEMM checks
instead of the O(m^3)-per-reflector dense-H product of explicitQR
(qr.cu:582-686), and Frobenius norms (cheap, norm-equivalent) instead of the
reference's spectral norm.  Tolerances follow the BASELINE.json north star:
||A - QR||_F / ||A||_F < n * eps.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QRCheck:
    residual: float          # ||A - QR||_F / ||A||_F
    orthogonality: float     # ||Q^T Q - I||_F
    r_triangular: float      # max |strict lower triangle of R|
    n: int
    eps: float

    @property
    def residual_ok(self) -> bool:
        return self.residual < self.n * self.eps

    @property
    def orthogonality_ok(self) -> bool:
        return self.orthogonality < self.n * self.eps * 4

    @property
    def ok(self) -> bool:
        return bool(self.residual_ok and self.orthogonality_ok
                    and self.r_triangular == 0.0)


def check_qr(A, Q, R) -> QRCheck:
    """Verify a thin factorization A (m x n) = Q (m x n) R (n x n).

    All check arithmetic runs on host in float64: the check must be more
    accurate than the thing it checks, and TPU matmuls at default precision
    (bf16 passes) would otherwise swamp an fp32-accurate factorization with
    verifier error.  ``eps`` is still the *factorization* dtype's eps.
    """
    import numpy as np

    from .hostio import to_host
    A, Q, R = to_host(A), to_host(Q), to_host(R)
    # eps of the *factor* dtype, not A's: callers often keep a float64 host
    # copy of A while factoring in float32 -- the tolerance must track what
    # the factorization could achieve, and Q's dtype is that by definition.
    eps = float(jnp.finfo(Q.dtype).eps)
    wide = np.complex128 if np.iscomplexobj(A) else np.float64
    A = A.astype(wide)
    Q = np.asarray(Q).astype(wide)
    R = np.asarray(R).astype(wide)
    n = A.shape[1]
    anorm = float(np.linalg.norm(A))
    resid = float(np.linalg.norm(A - Q @ R)) / (anorm if anorm > 0 else 1.0)
    orth = float(np.linalg.norm(np.conj(Q).T @ Q - np.eye(Q.shape[1])))
    tri = float(np.max(np.abs(np.tril(R, k=-1)))) if R.shape[0] > 1 else 0.0
    return QRCheck(residual=resid, orthogonality=orth, r_triangular=tri,
                   n=n, eps=eps)
