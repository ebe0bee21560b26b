"""orth / rsvd / norm2_est: randomized spectral tools on the QR core."""

import numpy as np
import pytest

import jax.numpy as jnp

import cuda_qr_tpu as ctq

CFG = ctq.QRConfig(dtype=jnp.float32, panel_width=16, scan_stages=2)


@pytest.fixture
def rng():
    return np.random.default_rng(12)


def _low_rank(rng, m, n, r, decay=0.5):
    """Matrix with exactly r dominant singular values decaying by `decay`."""
    U = np.linalg.qr(rng.standard_normal((m, r)))[0]
    V = np.linalg.qr(rng.standard_normal((n, r)))[0]
    s = decay ** np.arange(r)
    return (U * s) @ V.T


def test_orth_full_rank(rng):
    A = rng.standard_normal((96, 40)).astype(np.float32)
    Q = np.asarray(ctq.orth(A, config=CFG), np.float64)
    assert Q.shape == (96, 40)
    assert np.linalg.norm(Q.T @ Q - np.eye(40)) < 1e-5
    # range(Q) == range(A): projector reproduces A
    assert np.linalg.norm(Q @ (Q.T @ A) - A) / np.linalg.norm(A) < 1e-5


def test_orth_rank_deficient(rng):
    A = _low_rank(rng, 80, 48, 12, decay=1.0).astype(np.float32)
    Q = np.asarray(ctq.orth(A, rcond=1e-5, config=CFG), np.float64)
    assert Q.shape == (80, 12)
    assert np.linalg.norm(Q.T @ Q - np.eye(12)) < 1e-5
    assert np.linalg.norm(Q @ (Q.T @ A) - A) / np.linalg.norm(A) < 1e-4


@pytest.mark.parametrize("m,n", [(200, 64), (64, 200)])
def test_rsvd_low_rank_exact(rng, m, n):
    # rank-10 matrix: rank-10 rsvd must reproduce it to fp32 accuracy
    A = _low_rank(rng, m, n, 10, decay=0.7).astype(np.float32)
    U, s, Vt = ctq.rsvd(A, k=10, p=6, n_iter=2, config=CFG)
    U, s, Vt = (np.asarray(x, np.float64) for x in (U, s, Vt))
    assert U.shape == (m, 10) and s.shape == (10,) and Vt.shape == (10, n)
    assert np.linalg.norm((U * s) @ Vt - A) / np.linalg.norm(A) < 1e-5
    assert np.linalg.norm(U.T @ U - np.eye(10)) < 1e-5
    assert np.linalg.norm(Vt @ Vt.T - np.eye(10)) < 1e-5
    s_ref = np.linalg.svd(A.astype(np.float64), compute_uv=False)[:10]
    assert np.allclose(s, s_ref, rtol=1e-4)


def test_rsvd_truncation_quality(rng):
    # full-rank with fast decay: rank-k error ~ s_{k+1}
    m, n, k = 150, 90, 8
    A = _low_rank(rng, m, n, 60, decay=0.6).astype(np.float32)
    U, s, Vt = ctq.rsvd(A, k=k, p=8, n_iter=3, config=CFG)
    err = np.linalg.norm(
        (np.asarray(U, np.float64) * np.asarray(s, np.float64))
        @ np.asarray(Vt, np.float64) - A, 2)
    s_ref = np.linalg.svd(A.astype(np.float64), compute_uv=False)
    assert err < 3 * s_ref[k]          # HMT expectation bound, generous
    assert np.allclose(np.asarray(s, np.float64), s_ref[:k], rtol=1e-2)


def test_rsvd_complex(rng):
    A = (_low_rank(rng, 60, 40, 6, 0.8)
         + 1j * _low_rank(rng, 60, 40, 6, 0.8)).astype(np.complex64)
    U, s, Vt = ctq.rsvd(A, k=12, p=4, n_iter=2, config=CFG)
    U, s, Vt = (np.asarray(x) for x in (U, s, Vt))
    rec = (U * s) @ Vt
    assert np.linalg.norm(rec - A) / np.linalg.norm(A) < 1e-4
    assert np.linalg.norm(U.conj().T @ U - np.eye(12)) < 1e-4


def test_rsvd_bad_rank(rng):
    A = rng.standard_normal((20, 10)).astype(np.float32)
    with pytest.raises(ctq.QRShapeError):
        ctq.rsvd(A, k=11, config=CFG)


@pytest.mark.parametrize("shape", [(120, 50), (50, 120)])
def test_norm2_est(rng, shape):
    A = rng.standard_normal(shape).astype(np.float32)
    est = float(ctq.norm2_est(A, n_iter=12, config=CFG))
    ref = np.linalg.norm(A.astype(np.float64), 2)
    assert est <= ref * (1 + 1e-4)     # lower bound up to rounding
    assert est > 0.97 * ref            # converged for gaussian spectra


def test_rsvd_dist_matches_single(rng):
    from cuda_qr_tpu.parallel.mesh import row_mesh
    mesh = row_mesh(8)
    m, n, k = 8 * 40, 48, 6
    A = _low_rank(rng, m, n, 20, decay=0.6).astype(np.float32)
    U, s, Vt = ctq.rsvd_dist(A, k, mesh, p=6, n_iter=2, config=CFG)
    U, s, Vt = (np.asarray(x, np.float64) for x in (U, s, Vt))
    assert U.shape == (m, k) and Vt.shape == (k, n)
    s_ref = np.linalg.svd(A.astype(np.float64), compute_uv=False)
    assert np.allclose(s, s_ref[:k], rtol=1e-3)
    err = np.linalg.norm((U * s) @ Vt - A, 2)
    assert err < 3 * s_ref[k]
    assert np.linalg.norm(U.T @ U - np.eye(k)) < 1e-4


def test_eigh_rand_indefinite(rng):
    # symmetric with mixed-sign dominant eigenvalues: Rayleigh-Ritz must
    # recover both signs (a Nystrom-style approximation could not)
    m, r = 140, 10
    V = np.linalg.qr(rng.standard_normal((m, r)))[0]
    w = np.array([9.0, -7.5, 6.0, -4.8, 3.5, -2.6, 1.9, -1.3, 0.9, -0.6])
    A = ((V * w) @ V.T).astype(np.float32)
    w_est, V_est = ctq.eigh_rand(A, k=r, p=6, n_iter=2, config=CFG)
    w_est = np.asarray(w_est, np.float64)
    V_est = np.asarray(V_est, np.float64)
    assert w_est.shape == (r,) and V_est.shape == (m, r)
    assert np.allclose(w_est, w, rtol=1e-4, atol=1e-4)   # |w|-descending
    rec = (V_est * w_est) @ V_est.T
    assert np.linalg.norm(rec - A) / np.linalg.norm(A) < 1e-4
    assert np.linalg.norm(V_est.T @ V_est - np.eye(r)) < 1e-4


def test_eigh_rand_truncation_and_hermitian(rng):
    # complex Hermitian, full-rank decaying spectrum: rank-k error ~ |w_{k+1}|
    m, k = 96, 6
    X = (rng.standard_normal((m, m))
         + 1j * rng.standard_normal((m, m))) / np.sqrt(2 * m)
    Vf = np.linalg.qr(X)[0]
    w_full = 0.65 ** np.arange(m) * np.where(np.arange(m) % 2, -1.0, 1.0)
    A = ((Vf * w_full) @ Vf.conj().T).astype(np.complex64)
    w_est, V_est = ctq.eigh_rand(A, k=k, p=8, n_iter=3, config=CFG)
    w_est, V_est = np.asarray(w_est), np.asarray(V_est)
    assert np.allclose(w_est, w_full[:k], rtol=1e-3, atol=1e-4)
    err = np.linalg.norm((V_est * w_est) @ V_est.conj().T - A, 2)
    assert err < 3 * abs(w_full[k])
    with pytest.raises(ctq.QRShapeError):
        ctq.eigh_rand(rng.standard_normal((8, 6)).astype(np.float32), k=2,
                      config=CFG)


def test_eigh_rand_dist_matches_single(rng):
    from cuda_qr_tpu.parallel.mesh import row_mesh
    mesh = row_mesh(8)
    m, r, k = 8 * 20, 10, 6
    V = np.linalg.qr(rng.standard_normal((m, r)))[0]
    w = np.array([8.0, -6.5, 5.0, -3.8, 2.5, -1.6, 0.9, -0.5, 0.3, -0.2])
    A = ((V * w) @ V.T).astype(np.float32)
    w_est, V_est = ctq.eigh_rand_dist(A, k, mesh, p=6, n_iter=2, config=CFG)
    w_est = np.asarray(w_est, np.float64)
    V_est = np.asarray(V_est, np.float64)
    assert w_est.shape == (k,) and V_est.shape == (m, k)
    assert np.allclose(w_est, w[:k], rtol=1e-3, atol=1e-4)
    assert np.linalg.norm(V_est.T @ V_est - np.eye(k)) < 1e-4
    # the k-truncation reproduces A up to the dropped tail |w_{k+1}|
    err = np.linalg.norm((V_est * w_est) @ V_est.T - A, 2)
    assert err < 3 * abs(w[k])
    with pytest.raises(ctq.QRShapeError):
        ctq.eigh_rand_dist(A[: 8 * 20 - 4, : 8 * 20 - 4], k, mesh, config=CFG)


@pytest.mark.parametrize("target_cond", [10.0, 1e4])
def test_cond_est(rng, target_cond):
    m, n = 120, 40
    U = np.linalg.qr(rng.standard_normal((m, n)))[0]
    V = np.linalg.qr(rng.standard_normal((n, n)))[0]
    s = np.geomspace(1.0, 1.0 / target_cond, n)
    A = ((U * s) @ V.T).astype(np.float32)
    est = float(ctq.cond_est(A, n_iter=16, config=CFG))
    ref = target_cond
    assert 0.9 * ref < est < 1.05 * ref, (est, ref)


def test_rsvd_dist_complex(rng):
    from cuda_qr_tpu.parallel.mesh import row_mesh
    mesh = row_mesh(8)
    m, n, k = 8 * 24, 32, 5
    A = (_low_rank(rng, m, n, 12, 0.7)
         + 1j * _low_rank(rng, m, n, 12, 0.7)).astype(np.complex64)
    U, s, Vt = ctq.rsvd_dist(A, k, mesh, p=6, n_iter=2, config=CFG)
    U, s, Vt = (np.asarray(x) for x in (U, s, Vt))
    s_ref = np.linalg.svd(A.astype(np.complex128), compute_uv=False)
    assert np.allclose(s, s_ref[:k], rtol=1e-3)
    err = np.linalg.norm((U * s) @ Vt - A, 2)
    assert err < 3 * s_ref[k]
    assert np.linalg.norm(U.conj().T @ U - np.eye(k)) < 1e-4
