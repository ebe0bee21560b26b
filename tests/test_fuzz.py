"""Random-shape fuzz sweep across the public API (CPU, fast configs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.models.qr import qr
from cuda_qr_tpu.utils.config import QRConfig
from cuda_qr_tpu.utils.verify import check_qr

CFG = QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False)
CFG_FAST = QRConfig(panel_width=16, dtype=jnp.float64)  # cholqr2_hr


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_shapes_and_values(seed):
    rng = np.random.default_rng(100 + seed)
    m = int(rng.integers(1, 200))
    n = int(rng.integers(1, 200))
    kind = seed % 3
    A = rng.standard_normal((m, n))
    if kind == 1:
        A[:, rng.integers(0, n)] = 0.0            # dead column
    elif kind == 2:
        A *= np.logspace(0, 4, n)[None, :]        # graded columns
    cfg = CFG if seed % 2 else CFG_FAST
    Q, R = qr(jnp.asarray(A), cfg)
    k = min(m, n)
    assert Q.shape == (m, k) and R.shape == (k, n)
    chk = check_qr(A, np.asarray(Q) @ np.eye(k), np.asarray(R)) \
        if m >= n else None
    resid = np.linalg.norm(np.asarray(Q, np.float64) @ np.asarray(R, np.float64) - A)
    scale = max(np.linalg.norm(A), 1.0)
    assert resid / scale < 4 * max(m, n, 16) * np.finfo(np.float64).eps, \
        (seed, m, n, kind, resid / scale)
    orth = np.linalg.norm(np.asarray(Q, np.float64).T @ np.asarray(Q, np.float64) - np.eye(k))
    assert orth < 8 * max(m, n, 16) * np.finfo(np.float64).eps, (seed, m, n, orth)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_complex(seed):
    rng = np.random.default_rng(300 + seed)
    m = int(rng.integers(2, 120))
    n = int(rng.integers(1, 120))
    A = (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n)))
    if seed == 1:
        A[:, rng.integers(0, n)] = 0.0           # dead column
    if seed == 2:
        A = A.real.astype(complex)               # complex dtype, zero imag
    Q, R = qr(jnp.asarray(A.astype(np.complex128)),
              QRConfig(panel_width=16, use_pallas=False))
    k = min(m, n)
    Qn, Rn = np.asarray(Q), np.asarray(R)
    eps = np.finfo(np.float64).eps
    scale = max(np.linalg.norm(A), 1.0)
    assert np.linalg.norm(Qn @ Rn - A) / scale < 8 * max(m, n, 16) * eps
    assert np.linalg.norm(Qn.conj().T @ Qn - np.eye(k)) < 8 * max(m, n, 16) * eps
    assert np.abs(np.tril(Rn[:, :k], -1)).max() == 0.0


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_update_chains(seed):
    from cuda_qr_tpu.models.update import (qr_col_delete, qr_col_insert,
                                           qr_rank1_update, qr_row_delete,
                                           qr_row_insert)
    rng = np.random.default_rng(400 + seed)
    n = int(rng.integers(2, 40))
    m = n + int(rng.integers(1, 60))
    A = rng.standard_normal((m, n))
    Q, R = np.linalg.qr(A)
    Q, R = jnp.asarray(Q), jnp.asarray(R)
    eps = np.finfo(np.float64).eps

    def ok(Qj, Rj, Anew):
        Qn, Rn = np.asarray(Qj), np.asarray(Rj)
        kk = Rn.shape[0]
        assert np.linalg.norm(Qn @ Rn - Anew) / max(np.linalg.norm(Anew), 1) \
            < 64 * max(m, n) * eps
        assert np.linalg.norm(Qn.T @ Qn - np.eye(Qn.shape[1])) \
            < 64 * max(m, n) * eps

    u, v = rng.standard_normal(m), rng.standard_normal(n)
    if seed == 1:
        u = np.asarray(Q)[:, 0] * 2.0            # u in span(Q): rho == 0
    ok(*qr_rank1_update(Q, R, jnp.asarray(u), jnp.asarray(v)),
       A + np.outer(u, v))
    kr = int(rng.integers(0, m))
    ok(*qr_row_delete(Q, R, kr), np.delete(A, kr, axis=0))
    a = rng.standard_normal(n)
    ki = int(rng.integers(0, m + 1))
    ok(*qr_row_insert(Q, R, jnp.asarray(a), ki), np.insert(A, ki, a, axis=0))
    kc = int(rng.integers(0, n))
    ok(*qr_col_delete(Q, R, kc), np.delete(A, kc, axis=1))
    c = rng.standard_normal(m)
    ok(*qr_col_insert(Q, R, jnp.asarray(c), kc), np.insert(A, kc, c, axis=1))


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_batched(seed):
    from cuda_qr_tpu.models.batched import qr_batched
    rng = np.random.default_rng(500 + seed)
    B = int(rng.integers(1, 12))
    n = int(rng.integers(1, 24))
    m = n + int(rng.integers(0, 40))
    A = rng.standard_normal((B, m, n))
    if seed == 2:
        A *= np.logspace(0, 3, n)[None, None, :]  # graded columns
    Q, R = qr_batched(jnp.asarray(A))
    Qn, Rn = np.asarray(Q, np.float64), np.asarray(R, np.float64)
    eps = np.finfo(np.float64).eps
    resid = np.linalg.norm(Qn @ Rn - A) / max(np.linalg.norm(A), 1)
    assert resid < 1e-5, (seed, B, m, n, resid)
    for i in range(B):
        assert np.linalg.norm(Qn[i].T @ Qn[i] - np.eye(n)) < 1e-5
        assert (np.diag(Rn[i]) >= 0).all()        # positive-diagonal convention


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_decomp_family(seed):
    """lq/rq/ql at random shapes/dtypes: reconstruction + orthonormality."""
    from cuda_qr_tpu.models.decomp import lq, ql, rq
    rng = np.random.default_rng(500 + seed)
    m = int(rng.integers(2, 150))
    n = int(rng.integers(2, 150))
    complex_ = seed % 2 == 1
    A = rng.standard_normal((m, n))
    if complex_:
        A = A + 1j * rng.standard_normal((m, n))
        A = A.astype(np.complex128)
    fn = (lq, rq, ql)[seed % 3]
    X, Y = fn(jnp.asarray(A), CFG)
    X, Y = np.asarray(X), np.asarray(Y)
    k = min(m, n)
    eps = np.finfo(np.float64).eps
    resid = np.linalg.norm(X @ Y - A) / max(np.linalg.norm(A), 1.0)
    assert resid < 8 * max(m, n, 16) * eps, (seed, m, n, fn.__name__, resid)
    Q = Y if fn in (lq, rq) else X
    G = Q @ Q.conj().T if fn in (lq, rq) else Q.conj().T @ Q
    assert np.linalg.norm(G - np.eye(k)) < 16 * max(m, n, 16) * eps
