"""Core reflector / unblocked-QR properties.

Property set from SURVEY.md S4: residual <= c*n*eps, orthogonality,
R upper-triangular, R-diagonal sign convention diag(R) = -sign(x0)*||x||
(qr.cu:191), packed-storage round trip, and the robustness fixes (zero
column, large-magnitude column) the reference lacks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.ops.householder import (
    geqr2, larfb, larft, make_reflector, unpack_r, unpack_v)
from cuda_qr_tpu.utils.verify import check_qr


def qr_from_geqr2(A):
    packed, tau = geqr2(jnp.asarray(A))
    V = unpack_v(packed)
    T = larft(V, tau)
    m, n = A.shape
    Q = larfb(jnp.eye(m, n, dtype=A.dtype), V, T, transpose=False)
    R = unpack_r(packed)[:n]
    return Q, R, packed, tau, T


@pytest.mark.parametrize("m,n", [(6, 4), (8, 8), (23, 17), (64, 32), (128, 128)])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_geqr2_factorization(rng, m, n, dtype):
    A = rng.standard_normal((m, n)).astype(dtype)
    Q, R, *_ = qr_from_geqr2(A)
    chk = check_qr(A, Q, R)
    assert chk.residual < n * chk.eps, chk
    assert chk.orthogonality < 4 * n * chk.eps, chk
    assert chk.r_triangular == 0.0


def test_reflector_annihilates(rng):
    x = jnp.asarray(rng.standard_normal(16))
    v, tau, beta = make_reflector(x, 0)
    hx = x - tau * v * (v @ x)
    assert abs(hx[0] - beta) < 1e-12
    np.testing.assert_allclose(hx[1:], 0, atol=1e-12)
    # reference sign convention (qr.cu:191): beta = -sign(x0) * ||x||
    assert np.sign(beta) == -np.sign(x[0])
    np.testing.assert_allclose(abs(beta), np.linalg.norm(x), rtol=1e-12)


def test_reflector_offset(rng):
    x = jnp.asarray(rng.standard_normal(16))
    v, tau, beta = make_reflector(x, 5)
    assert np.all(np.asarray(v[:5]) == 0) and v[5] == 1
    hx = x - tau * v * (v @ x)
    np.testing.assert_allclose(hx[:5], x[:5], rtol=0, atol=0)
    np.testing.assert_allclose(hx[6:], 0, atol=1e-12)
    np.testing.assert_allclose(abs(hx[5]), np.linalg.norm(x[5:]), rtol=1e-12)


def test_zero_column_no_nan():
    """The reference divides by zero here (qr.cu:173); we must not."""
    A = jnp.zeros((8, 4))
    packed, tau = geqr2(A)
    assert not np.any(np.isnan(np.asarray(packed)))
    np.testing.assert_array_equal(np.asarray(tau), 0)


def test_degenerate_then_regular_column(rng):
    A = np.zeros((12, 4))
    A[:, 1] = rng.standard_normal(12)
    A[:, 3] = rng.standard_normal(12)
    Q, R, *_ = qr_from_geqr2(jnp.asarray(A))
    assert not np.any(np.isnan(np.asarray(Q)))
    np.testing.assert_allclose(np.asarray(Q @ R), A, atol=1e-12)


def test_huge_column_no_overflow():
    """Unscaled sum-of-squares (qr.cu:146) overflows fp32 at ~1e19."""
    A = jnp.full((64, 2), 1e25, dtype=jnp.float32).at[:, 1].set(
        jnp.linspace(1e24, 2e25, 64, dtype=jnp.float32))
    packed, tau = geqr2(A)
    assert np.all(np.isfinite(np.asarray(packed)))
    d = float(packed[0, 0])
    assert np.isfinite(d) and abs(d) == pytest.approx(8e25, rel=1e-5)


def test_geqr2_row_offset(rng):
    """row_offset factors only the lower block, leaving top rows alone."""
    m, n, off = 20, 4, 6
    A = jnp.asarray(rng.standard_normal((m, n)))
    packed, tau = geqr2(A, row_offset=off)
    np.testing.assert_array_equal(np.asarray(packed[:off]), np.asarray(A[:off]))
    lo_packed, lo_tau = geqr2(A[off:], row_offset=0)
    np.testing.assert_allclose(np.asarray(packed[off:]), np.asarray(lo_packed),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(tau), np.asarray(lo_tau), rtol=1e-12)


def test_larft_matches_product(rng):
    """I - V T V^T must equal H_0 H_1 ... H_{k-1}."""
    m, n = 16, 6
    A = jnp.asarray(rng.standard_normal((m, n)))
    packed, tau = geqr2(A)
    V = unpack_v(packed)
    T = larft(V, tau)
    Q_blocked = jnp.eye(m) - V @ T @ V.T
    Q_seq = jnp.eye(m)
    for j in range(n):
        H = jnp.eye(m) - tau[j] * jnp.outer(V[:, j], V[:, j])
        Q_seq = Q_seq @ H
    np.testing.assert_allclose(np.asarray(Q_blocked), np.asarray(Q_seq),
                               atol=1e-13)


def test_matches_numpy_r(rng):
    """|R| must agree with LAPACK's R (signs may differ by convention)."""
    A = rng.standard_normal((32, 12))
    _, R, *_ = qr_from_geqr2(jnp.asarray(A))
    R_np = np.linalg.qr(A, mode="r")
    np.testing.assert_allclose(np.abs(np.asarray(R)[:12]), np.abs(R_np),
                               rtol=1e-10)
