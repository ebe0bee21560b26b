"""Rank-revealing solvers (models/rank.py): matrix_rank, COD least squares,
pinv, null_space -- checked against numpy's SVD-based answers."""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda_qr_tpu.models.rank import lstsq_rr, matrix_rank, null_space, pinv
from cuda_qr_tpu.utils.config import QRConfig


CFG = QRConfig(dtype=jnp.float32, panel_width=16, scan_stages=2)


@pytest.fixture
def rng():
    return np.random.default_rng(12)


def _rank_deficient(rng, m, n, r):
    B = rng.standard_normal((m, r)).astype(np.float32)
    C = rng.standard_normal((r, n)).astype(np.float32)
    return B @ C


@pytest.mark.parametrize("m,n,r", [(80, 48, 48), (80, 48, 20), (64, 40, 1)])
def test_matrix_rank(rng, m, n, r):
    A = _rank_deficient(rng, m, n, r)
    assert matrix_rank(A, config=CFG) == r
    assert np.linalg.matrix_rank(A.astype(np.float64), tol=1e-4) == r


def test_lstsq_rr_full_rank_matches_lstsq(rng):
    A = rng.standard_normal((60, 33)).astype(np.float32)
    b = rng.standard_normal(60).astype(np.float32)
    x, resid, r, piv = lstsq_rr(A, b, config=CFG)
    assert r == 33
    xr = np.linalg.lstsq(A.astype(np.float64), b, rcond=None)[0]
    assert np.abs(np.asarray(x) - xr).max() < 1e-4


def test_lstsq_rr_minimum_norm(rng):
    """Rank-deficient system: solution must match the SVD minimum-norm
    solution, not just any least-squares solution."""
    m, n, r = 70, 40, 15
    A = _rank_deficient(rng, m, n, r)
    b = rng.standard_normal((m, 3)).astype(np.float32)
    x, resid, rk, piv = lstsq_rr(A, b, config=CFG)
    assert rk == r
    x64 = np.linalg.lstsq(A.astype(np.float64), b, rcond=1e-6)[0]
    assert np.abs(np.asarray(x) - x64).max() < 1e-3
    # residual norms agree with the true residual
    true_res = np.linalg.norm(A @ x64 - b, axis=0)
    assert np.abs(np.asarray(resid) - true_res).max() < 1e-3


def test_pinv(rng):
    m, n, r = 48, 32, 12
    A = _rank_deficient(rng, m, n, r)
    P = np.asarray(pinv(A, config=CFG), np.float64)
    P64 = np.linalg.pinv(A.astype(np.float64), rcond=1e-6)
    assert np.abs(P - P64).max() < 1e-3
    # Moore-Penrose identities
    assert np.abs(A @ P @ A - A).max() < 1e-3
    assert np.abs(P @ A @ P - P).max() < 1e-3


def test_null_space(rng):
    m, n, r = 48, 32, 20
    A = _rank_deficient(rng, m, n, r)
    N = np.asarray(null_space(A, config=CFG), np.float64)
    assert N.shape == (n, n - r)
    assert np.abs(N.T @ N - np.eye(n - r)).max() < 1e-4
    assert np.abs(A @ N).max() < 1e-3 * np.abs(A).max()


def test_null_space_full_rank(rng):
    A = rng.standard_normal((40, 24)).astype(np.float32)
    assert null_space(A, config=CFG).shape == (24, 0)


@pytest.mark.parametrize("n", [16, 48, 130])
def test_slogdet(rng, n):
    from cuda_qr_tpu.models.rank import slogdet
    A = rng.standard_normal((n, n)).astype(np.float32)
    sign, logabs = slogdet(A, config=CFG)
    s_ref, l_ref = np.linalg.slogdet(A.astype(np.float64))
    assert float(sign) == s_ref
    assert abs(float(logabs) - l_ref) < n * 1e-5 * max(1.0, abs(l_ref))


def test_slogdet_singular(rng):
    from cuda_qr_tpu.models.rank import slogdet
    A = rng.standard_normal((24, 24)).astype(np.float32)
    A[:, 3] = 0.0
    sign, logabs = slogdet(A, config=CFG)
    assert float(sign) == 0.0


def _crand(rng, *shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_qr_pivoted_complex(rng):
    from cuda_qr_tpu.models.qr import qr_pivoted
    A = _crand(rng, 60, 40)
    Q, R, piv = qr_pivoted(A, config=CFG)
    Q, R = np.asarray(Q, np.complex128), np.asarray(R, np.complex128)
    resid = np.linalg.norm(Q @ R - A[:, piv]) / np.linalg.norm(A)
    assert resid < 40 * 1.2e-7
    assert np.linalg.norm(Q.conj().T @ Q - np.eye(40)) < 1e-4
    assert sorted(piv.tolist()) == list(range(40))


def test_complex_rank_family(rng):
    """matrix_rank / pinv / null_space / lstsq_rr on a complex rank-12
    50x30 matrix; lstsq_rr checked against the truncated-SVD minimum-norm
    solution (numpy lstsq's rcond=None keeps fp32 noise directions)."""
    A = _crand(rng, 50, 12) @ _crand(rng, 12, 30)
    assert matrix_rank(A, config=CFG) == 12
    P = np.asarray(pinv(A, config=CFG), np.complex128)
    assert np.linalg.norm(A @ P @ A - A) / np.linalg.norm(A) < 1e-5
    N = np.asarray(null_space(A, config=CFG), np.complex128)
    assert N.shape == (30, 18)
    assert np.linalg.norm(A @ N) < 1e-3
    assert np.linalg.norm(N.conj().T @ N - np.eye(18)) < 1e-5
    b = _crand(rng, 50)
    x, res, r, piv = lstsq_rr(A, b, config=CFG)
    assert r == 12
    U, S, Vh = np.linalg.svd(A.astype(np.complex128), full_matrices=False)
    xsvd = Vh[:12].conj().T @ ((U[:, :12].conj().T @ b.astype(np.complex128))
                               / S[:12])
    assert np.abs(np.asarray(x, np.complex128) - xsvd).max() < 1e-5
