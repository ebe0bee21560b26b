"""QR updating (rank-1, row/col insert/delete) against refactorization."""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_qr_tpu.models.qr import qr
from cuda_qr_tpu.models.update import (qr_col_delete, qr_col_insert,
                                       qr_rank1_update, qr_row_delete,
                                       qr_row_insert)


def _check(Q, R, A, tol):
    m, n = A.shape
    Q, R, A = map(np.asarray, (Q, R, A))
    assert Q.shape == (m, min(m, n)) and R.shape == (min(m, n), n)
    resid = np.linalg.norm(Q @ R - A) / max(np.linalg.norm(A), 1e-30)
    orth = np.linalg.norm(Q.T @ Q - np.eye(Q.shape[1]))
    assert resid < tol, f"residual {resid:.3e}"
    assert orth < tol, f"orthogonality {orth:.3e}"
    assert np.allclose(R, np.triu(R)), "R not upper triangular"


@pytest.fixture
def rng():
    return np.random.default_rng(12)


@pytest.mark.parametrize("m,n", [(24, 8), (64, 64), (40, 17)])
def test_rank1_update(rng, m, n):
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    Q, R = qr(A)
    Q1, R1 = qr_rank1_update(Q, R, u, v)
    _check(Q1, R1, A + jnp.outer(u, v), 1e-4)


def test_rank1_update_u_in_span(rng):
    """u already in span(Q): the extension column is dead (rho = 0)."""
    m, n = 30, 10
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    Q, R = qr(A)
    u = A @ jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    Q1, R1 = qr_rank1_update(Q, R, u, v)
    _check(Q1, R1, A + jnp.outer(u, v), 1e-3)


@pytest.mark.parametrize("k", [0, 3, 24])
def test_row_insert(rng, k):
    m, n = 24, 9
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    Q, R = qr(A)
    Q1, R1 = qr_row_insert(Q, R, a, k)
    A1 = jnp.concatenate([A[:k], a[None], A[k:]], axis=0)
    _check(Q1, R1, A1, 1e-4)


def test_row_insert_default_appends(rng):
    m, n = 16, 5
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    Q, R = qr(A)
    Q1, R1 = qr_row_insert(Q, R, a)
    _check(Q1, R1, jnp.concatenate([A, a[None]]), 1e-4)


@pytest.mark.parametrize("k", [0, 7, 23])
def test_row_delete(rng, k):
    m, n = 24, 9
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    Q, R = qr(A)
    Q1, R1 = qr_row_delete(Q, R, k)
    A1 = jnp.concatenate([A[:k], A[k + 1:]], axis=0)
    _check(Q1, R1, A1, 1e-3)


def test_row_delete_square_rejected(rng):
    A = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
    Q, R = qr(A)
    with pytest.raises(ValueError):
        qr_row_delete(Q, R, 0)


@pytest.mark.parametrize("k", [0, 4, 9])
def test_col_insert(rng, k):
    m, n = 24, 9
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((m,)), jnp.float32)
    Q, R = qr(A)
    Q1, R1 = qr_col_insert(Q, R, a, k)
    A1 = jnp.concatenate([A[:, :k], a[:, None], A[:, k:]], axis=1)
    _check(Q1, R1, A1, 1e-4)


@pytest.mark.parametrize("k", [0, 4, 8])
def test_col_delete(rng, k):
    m, n = 24, 9
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    Q, R = qr(A)
    Q1, R1 = qr_col_delete(Q, R, k)
    A1 = jnp.concatenate([A[:, :k], A[:, k + 1:]], axis=1)
    _check(Q1, R1, A1, 1e-4)


def test_update_chain(rng):
    """Long mixed chain of updates stays accurate (error accumulation)."""
    m, n = 32, 8
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    Q, R = qr(A)
    for _ in range(5):
        u = jnp.asarray(rng.standard_normal((A.shape[0],)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((A.shape[1],)), jnp.float32)
        A = A + jnp.outer(u, v)
        Q, R = qr_rank1_update(Q, R, u, v)
        a = jnp.asarray(rng.standard_normal((A.shape[1],)), jnp.float32)
        A = jnp.concatenate([A, a[None]], axis=0)
        Q, R = qr_row_insert(Q, R, a)
    _check(Q, R, A, 1e-3)


class TestComplex:
    """Complex factors: rotations follow clartg (real c, complex s)."""

    def _cqr(self, rng, m, n):
        A = (rng.standard_normal((m, n)) +
             1j * rng.standard_normal((m, n))).astype(np.complex64)
        Qn, Rn = np.linalg.qr(A)
        return A, jnp.asarray(Qn.astype(np.complex64)), \
            jnp.asarray(Rn.astype(np.complex64))

    def _check(self, Q, R, A_new, tol=1e-3):
        Q, R = np.asarray(Q), np.asarray(R)
        n = R.shape[1]
        assert np.linalg.norm(Q @ R - A_new) / np.linalg.norm(A_new) < tol
        assert np.linalg.norm(Q.conj().T @ Q - np.eye(Q.shape[1])) < tol
        assert np.abs(np.tril(R[:, :R.shape[0]], -1)).max() < 1e-6

    def test_rank1(self, rng):
        A, Q, R = self._cqr(rng, 40, 12)
        u = (rng.standard_normal(40) + 1j * rng.standard_normal(40)
             ).astype(np.complex64)
        v = (rng.standard_normal(12) + 1j * rng.standard_normal(12)
             ).astype(np.complex64)
        Q1, R1 = qr_rank1_update(Q, R, jnp.asarray(u), jnp.asarray(v))
        self._check(Q1, R1, A + np.outer(u, v.conj()))

    def test_row_insert_delete(self, rng):
        A, Q, R = self._cqr(rng, 30, 10)
        a = (rng.standard_normal(10) + 1j * rng.standard_normal(10)
             ).astype(np.complex64)
        Q1, R1 = qr_row_insert(Q, R, jnp.asarray(a[None])[0], k=4)
        self._check(Q1, R1, np.insert(A, 4, a, axis=0))
        Q2, R2 = qr_row_delete(Q, R, 7)
        self._check(Q2, R2, np.delete(A, 7, axis=0))

    def test_col_insert_delete(self, rng):
        A, Q, R = self._cqr(rng, 30, 10)
        a = (rng.standard_normal(30) + 1j * rng.standard_normal(30)
             ).astype(np.complex64)
        Q1, R1 = qr_col_insert(Q, R, jnp.asarray(a), 3)
        self._check(Q1, R1, np.insert(A, 3, a, axis=1))
        Q2, R2 = qr_col_delete(Q, R, 6)
        self._check(Q2, R2, np.delete(A, 6, axis=1))


def test_rank_k_update(rng):
    from cuda_qr_tpu.models.update import qr_update
    A = rng.standard_normal((50, 16)).astype(np.float32)
    U = rng.standard_normal((50, 3)).astype(np.float32)
    V = rng.standard_normal((16, 3)).astype(np.float32)
    Qn, Rn = np.linalg.qr(A)
    Q1, R1 = qr_update(jnp.asarray(Qn.astype(np.float32)),
                       jnp.asarray(Rn.astype(np.float32)),
                       jnp.asarray(U), jnp.asarray(V))
    A_new = A + U @ V.T
    Q1, R1 = np.asarray(Q1, np.float64), np.asarray(R1, np.float64)
    assert np.linalg.norm(Q1 @ R1 - A_new) / np.linalg.norm(A_new) < 1e-5
    assert np.linalg.norm(Q1.T @ Q1 - np.eye(16)) < 1e-5
    with pytest.raises(ValueError, match="rank-k"):
        qr_update(jnp.asarray(Qn.astype(np.float32)),
                  jnp.asarray(Rn.astype(np.float32)),
                  jnp.asarray(U), jnp.asarray(V[:, :2]))


def test_scipy_compat_surface(rng):
    """Matches scipy.linalg.qr_update/insert/delete numerically."""
    import scipy.linalg as sl
    from cuda_qr_tpu.models import scipy_compat as sc
    A = rng.standard_normal((20, 8))
    Q, R = np.linalg.qr(A)

    u = rng.standard_normal(20)
    v = rng.standard_normal(8)
    Q1, R1 = sc.qr_update(Q, R, u, v)
    Qs, Rs = sl.qr_update(Q, R, u, v)
    np.testing.assert_allclose(np.asarray(Q1) @ np.asarray(R1), Qs @ Rs,
                               atol=1e-5)

    rows = rng.standard_normal((2, 8))
    Q2, R2 = sc.qr_insert(Q, R, rows, 5, which="row")
    Qs, Rs = sl.qr_insert(Q, R, rows, 5, which="row", rcond=None)
    np.testing.assert_allclose(np.asarray(Q2) @ np.asarray(R2), Qs @ Rs,
                               atol=1e-5)

    Q3, R3 = sc.qr_delete(Q, R, 3, p=2, which="row")
    Qs, Rs = sl.qr_delete(Q, R, 3, p=2, which="row")
    np.testing.assert_allclose(np.asarray(Q3) @ np.asarray(R3), Qs @ Rs,
                               atol=1e-5)

    col = rng.standard_normal(20)
    Q4, R4 = sc.qr_insert(Q, R, col, 2, which="col")
    Qs, Rs = sl.qr_insert(Q, R, col, 2, which="col")
    np.testing.assert_allclose(np.asarray(Q4) @ np.asarray(R4), Qs @ Rs,
                               atol=1e-5)

    Q5, R5 = sc.qr_delete(Q, R, 6, which="col")
    Qs, Rs = sl.qr_delete(Q, R, 6, which="col")
    np.testing.assert_allclose(np.asarray(Q5) @ np.asarray(R5), Qs @ Rs,
                               atol=1e-5)
