"""CholeskyQR2 + Householder-reconstruction panel path.

The reconstructed (V, tau, T) picks its own diagonal-sign convention (from
S = -sign(diag Q), the LU-stability choice of Ballard et al.), so tests
check VALIDITY -- reconstruction invariant, residual, orthogonality,
sign-normalized R -- rather than bitwise agreement with geqr2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.ops.blocked import extract_r, orgqr, qr_blocked
from cuda_qr_tpu.ops.fast_panel import panel_factor_cholqr2hr
from cuda_qr_tpu.ops.householder import larfb, unpack_r, unpack_v
from cuda_qr_tpu.ops.smalllinalg import (cholesky_recursive, inv_upper,
                                         lu_unpivoted)
from cuda_qr_tpu.utils.config import QRConfig
from cuda_qr_tpu.utils.verify import check_qr

CFG64 = QRConfig(dtype=jnp.float64, panel_method="cholqr2_hr")
CFG32 = QRConfig(dtype=jnp.float32, panel_method="cholqr2_hr")


def test_inv_upper_128(rng):
    U = np.triu(rng.standard_normal((128, 128))) + 8 * np.eye(128)
    Ui = np.asarray(inv_upper(jnp.asarray(U)))
    assert np.abs(Ui @ U - np.eye(128)).max() < 1e-12


def test_cholesky_recursive_128(rng):
    B = rng.standard_normal((128, 256))
    G = B @ B.T
    L = np.asarray(cholesky_recursive(jnp.asarray(G)))
    assert np.abs(L @ L.T - G).max() / np.abs(G).max() < 1e-13
    assert np.abs(np.triu(L, 1)).max() == 0.0


def test_cholesky_recursive_not_pd_gives_nan():
    G = -np.eye(32)
    L = np.asarray(cholesky_recursive(jnp.asarray(G)))
    assert np.isnan(L).any()


def test_lu_unpivoted(rng):
    Y = rng.standard_normal((96, 96)) + 8 * np.eye(96)
    L, U = lu_unpivoted(jnp.asarray(Y))
    assert np.abs(np.asarray(L) @ np.asarray(U) - Y).max() < 1e-12
    np.testing.assert_allclose(np.diag(np.asarray(L)), 1.0)


@pytest.mark.parametrize("m,nb,off", [(96, 32, 0), (96, 32, 16), (256, 64, 128)])
def test_panel_valid_householder_representation(rng, m, nb, off):
    A = rng.standard_normal((m, nb))
    packed, tau, T = jax.jit(
        lambda a, o: panel_factor_cholqr2hr(a, o, CFG64))(jnp.asarray(A), off)
    # top rows untouched
    np.testing.assert_array_equal(np.asarray(packed[:off]), A[:off])
    # (I - V T V^T) E_J must be orthonormal and reproduce A
    V = np.asarray(unpack_v(packed[off:], 0))
    Tn = np.asarray(T)
    E = np.eye(m - off, nb)
    Qh = E - V @ (Tn @ (V.T @ E))
    R = np.triu(np.asarray(packed[off:off + nb]))
    assert np.abs(Qh.T @ Qh - np.eye(nb)).max() < 1e-13
    assert np.abs(Qh @ R - A[off:]).max() < 1e-12
    np.testing.assert_allclose(np.diag(Tn), np.asarray(tau), atol=1e-13)


def test_panel_rank_deficient_fallback(rng):
    A = np.zeros((64, 16))
    A[:, 0] = rng.standard_normal(64)
    packed, tau, T = jax.jit(
        lambda a, o: panel_factor_cholqr2hr(a, o, CFG64))(jnp.asarray(A), 0)
    assert np.all(np.isfinite(np.asarray(packed)))
    assert abs(float(packed[0, 0])) == pytest.approx(
        np.linalg.norm(A[:, 0]), rel=1e-12)


@pytest.mark.parametrize("m,n", [(64, 64), (300, 130), (256, 96)])
@pytest.mark.parametrize("cfg", [CFG32, CFG64], ids=["f32", "f64"])
def test_blocked_qr_cholqr2hr(rng, m, n, cfg):
    cfg = cfg.replace(panel_width=32)
    A = rng.standard_normal((m, n)).astype(cfg.dtype)
    fac = qr_blocked(jnp.asarray(A), cfg)
    Q = orgqr(fac, m, n, cfg)
    R = extract_r(fac, n)
    chk = check_qr(A, Q, R)
    assert chk.residual < 4 * max(n, 32) * chk.eps, (m, n, chk)
    assert chk.orthogonality < 8 * max(n, 32) * chk.eps, (m, n, chk)
    assert chk.r_triangular == 0.0


@pytest.mark.parametrize("nb", [16, 32, 128])
def test_pallas_chol_with_inv(rng, nb):
    from cuda_qr_tpu.ops.pallas_chol import chol_with_inv_pallas
    B = rng.standard_normal((nb, 2 * nb)).astype(np.float32)
    G = jnp.asarray(B @ B.T / (2 * nb))
    L, Li = chol_with_inv_pallas(G, interpret=True)
    L, Li = np.asarray(L), np.asarray(Li)
    assert np.abs(np.triu(L, 1)).max() == 0.0
    assert np.abs(L @ L.T - np.asarray(G)).max() < 1e-5
    assert np.abs(Li @ L - np.eye(nb)).max() < 1e-4


def test_pallas_chol_not_pd_gives_nonfinite():
    from cuda_qr_tpu.ops.pallas_chol import chol_with_inv_pallas
    G = jnp.asarray(-np.eye(32, dtype=np.float32))
    L, Li = chol_with_inv_pallas(G, interpret=True)
    assert not np.isfinite(np.asarray(L)).all()


@pytest.mark.parametrize("method", ["cholqr2_bk", "cholqr2_hr"])
def test_illconditioned_panel_gate(rng, method):
    """cond(X) ~ 1e4 in fp32: CholeskyQR2 loses orthogonality WITHOUT
    producing NaNs (eps*cond^2 >> 1), so only the emax gate routes the
    panel to the Householder fallback.  Regression for the silent 8192^2
    nb=256 corruption (orth ~ 78) found on TPU."""
    m, nb = 256, 32
    U, _ = np.linalg.qr(rng.standard_normal((m, nb)))
    V, _ = np.linalg.qr(rng.standard_normal((nb, nb)))
    s = np.logspace(0, -4, nb)
    A = ((U * s) @ V.T).astype(np.float32)
    cfg = QRConfig(dtype=jnp.float32, panel_width=nb, panel_method=method,
                   scan_stages=1)
    fac = qr_blocked(jnp.asarray(A), cfg)
    Q = orgqr(fac, m, nb, cfg)
    R = extract_r(fac, nb)
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.orthogonality < 100 * nb * chk.eps, chk
    assert chk.residual < 100 * nb * chk.eps, chk


def test_bk_square_panel_kernel_certificate(rng):
    """SQUARE live blocks are the basis kernel's blind spot: Q_J is then a
    full orthogonal matrix, spec(S Q_J) can approach +1, and
    M = I - S Q_J becomes arbitrarily ill-conditioned regardless of
    cond(X) -- the failure mode behind the 8192^2 nb=256 corruption
    (per-panel ||H^T H - I|| = 1.65 with emax only 1.8e-3, silent under
    every finiteness check).  The a-posteriori certificate
    ||N||^2 ||I - M N|| > 100 eps must route such panels to the
    Householder-reconstruction fallback, keeping the panel reflector
    orthogonal.  Verified post-fix: H_orth ~ 4e-05 (was up to ~1).
    """
    from cuda_qr_tpu.ops.fast_panel import panel_factor_cholqr2bk
    from cuda_qr_tpu.ops.householder import panel_v

    m, nb = 512, 256
    off = 256
    A = np.zeros((m, nb), np.float32)
    A[off:] = rng.standard_normal((nb, nb)).astype(np.float32)
    cfg = QRConfig(dtype=jnp.float32, panel_width=nb, scan_stages=1)
    packed, tau, T, VJ = panel_factor_cholqr2bk(jnp.asarray(A), off, cfg)
    V = np.asarray(panel_v(packed, off, VJ), np.float64)
    Tn = np.asarray(T, np.float64)
    H = np.eye(m) - V @ Tn @ V.T
    assert np.linalg.norm(H.T @ H - np.eye(m)) < 1e-3
    R = np.triu(np.asarray(packed, np.float64)[off:])
    rerr = (np.linalg.norm(H.T @ A - np.vstack([np.zeros((off, nb)), R]))
            / np.linalg.norm(A))
    assert rerr < 1e-4


def test_blocked_qr_nb256(rng):
    """Wide panels (the measured-fastest 8192^2 TPU config, docs/PERF.md):
    nb=256 through the bk panel + 256-wide Pallas chol kernel path."""
    cfg = QRConfig(dtype=jnp.float32, panel_width=256, scan_stages=2)
    m, n = 640, 512
    A = rng.standard_normal((m, n)).astype(np.float32)
    fac = qr_blocked(jnp.asarray(A), cfg)
    Q = orgqr(fac, m, n, cfg)
    R = extract_r(fac, n)
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.ok, chk


def test_newton_inverse(rng):
    from cuda_qr_tpu.ops.smalllinalg import newton_inverse
    M = np.eye(128) + 0.5 * rng.standard_normal((128, 128)) / np.sqrt(128)
    X, err = newton_inverse(jnp.asarray(M))
    assert float(err) < 3e-8
    assert np.abs(np.asarray(X) @ M - np.eye(128)).max() < 1e-12


def test_newton_inverse_singular_reports_failure():
    from cuda_qr_tpu.ops.smalllinalg import newton_inverse
    M = np.zeros((16, 16))
    M[0, 0] = 1.0  # rank-1: no inverse exists
    _, err = newton_inverse(jnp.asarray(M), max_iters=8)
    assert not bool(err <= 3e-8)


@pytest.mark.parametrize("m,nb,off", [(96, 32, 0), (96, 32, 16), (256, 64, 128)])
def test_panel_bk_valid_representation(rng, m, nb, off):
    """Basis-kernel panel: (I - V T V^T) E_J orthonormal, reproduces A."""
    from cuda_qr_tpu.ops.fast_panel import panel_factor_cholqr2bk
    from cuda_qr_tpu.ops.householder import panel_v
    A = rng.standard_normal((m, nb))
    cfg = QRConfig(dtype=jnp.float64, panel_method="cholqr2_bk")
    packed, tau, T, VJ = jax.jit(
        lambda a, o: panel_factor_cholqr2bk(a, o, cfg))(jnp.asarray(A), off)
    np.testing.assert_array_equal(np.asarray(packed[:off]), A[:off])
    V = np.asarray(panel_v(packed, off, VJ))
    Tn = np.asarray(T)
    E = np.zeros((m, nb))
    E[off:off + nb] = np.eye(nb)
    Qh = E - V @ (Tn @ (V.T @ E))           # (I - V T V^T) E_J
    R = np.triu(np.asarray(packed[off:off + nb]))
    assert np.abs(Qh.T @ Qh - np.eye(nb)).max() < 1e-13
    live_A = np.where(np.arange(m)[:, None] >= off, A, 0)
    assert np.abs(Qh @ R - live_A).max() < 1e-12


@pytest.mark.parametrize("m,n", [(64, 64), (300, 130), (256, 96)])
@pytest.mark.parametrize("cfg", [CFG32, CFG64], ids=["f32", "f64"])
def test_blocked_qr_cholqr2bk(rng, m, n, cfg):
    cfg = cfg.replace(panel_width=32, panel_method="cholqr2_bk")
    A = rng.standard_normal((m, n)).astype(cfg.dtype)
    fac = qr_blocked(jnp.asarray(A), cfg)
    Q = orgqr(fac, m, n, cfg)
    R = extract_r(fac, n)
    chk = check_qr(A, Q, R)
    assert chk.residual < 4 * max(n, 32) * chk.eps, (m, n, chk)
    assert chk.orthogonality < 8 * max(n, 32) * chk.eps, (m, n, chk)
    assert chk.r_triangular == 0.0


def test_blocked_qr_cholqr2bk_ormqr_roundtrip(rng):
    from cuda_qr_tpu.ops.blocked import ormqr
    cfg = CFG64.replace(panel_width=16, panel_method="cholqr2_bk")
    m, n, p = 80, 48, 5
    A = rng.standard_normal((m, n))
    B = rng.standard_normal((m, p))
    fac = qr_blocked(jnp.asarray(A), cfg)
    QtB = ormqr(fac, jnp.asarray(B), transpose=True, config=cfg)
    back = ormqr(fac, QtB, transpose=False, config=cfg)
    np.testing.assert_allclose(np.asarray(back), B, atol=1e-12)
    # Q^T A must give [R; 0]
    QtA = np.asarray(ormqr(fac, jnp.asarray(A), transpose=True, config=cfg))
    np.testing.assert_allclose(QtA[:n], np.asarray(extract_r(fac, n)),
                               atol=1e-12)
    assert np.abs(QtA[n:]).max() < 1e-12


def test_blocked_qr_cholqr2bk_rank_deficient_fallback(rng):
    """Zero columns break Cholesky; the BK path must fall back cleanly."""
    cfg = CFG64.replace(panel_width=16, panel_method="cholqr2_bk")
    A = np.zeros((64, 32))
    A[:, 0] = rng.standard_normal(64)
    A[:, 17] = rng.standard_normal(64)
    fac = qr_blocked(jnp.asarray(A), cfg)
    Q = orgqr(fac, 64, 32, cfg)
    R = extract_r(fac, 32)
    QR = np.asarray(Q) @ np.asarray(R)
    assert np.isfinite(QR).all()
    assert np.abs(QR - A).max() < 1e-12


def test_blocked_qr_graded_matrix(rng):
    """Moderately ill-conditioned columns must survive (CholQR2 envelope)."""
    cfg = CFG32.replace(panel_width=16)
    A = (rng.standard_normal((128, 64)) *
         np.logspace(0, 3, 64)).astype(np.float32)
    fac = qr_blocked(jnp.asarray(A), cfg)
    Q = orgqr(fac, 128, 64, cfg)
    R = extract_r(fac, 64)
    chk = check_qr(A, Q, R)
    assert chk.residual < 4 * 64 * chk.eps, chk
    assert chk.orthogonality < 8 * 64 * chk.eps, chk
