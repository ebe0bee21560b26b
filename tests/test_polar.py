"""QDWH polar decomposition: orthogonality, reconstruction, scipy parity."""

import numpy as np
import pytest
import scipy.linalg as sla

import jax.numpy as jnp

import cuda_qr_tpu as ctq
from cuda_qr_tpu.models.polar import _qdwh_schedule

CFG = ctq.QRConfig(dtype=jnp.float32, panel_width=16, scan_stages=2)


@pytest.fixture
def rng():
    return np.random.default_rng(12)


def _checks(A, U, H, side="right", tol=5e-6):
    wdt = np.complex128 if np.iscomplexobj(A) else np.float64
    U, H = np.asarray(U).astype(wdt), np.asarray(H).astype(wdt)
    k = min(A.shape)
    UU = U.T.conj() @ U if U.shape[0] >= U.shape[1] else U @ U.T.conj()
    assert np.linalg.norm(UU - np.eye(k)) < tol * k
    rec = U @ H if side == "right" else H @ U
    assert np.linalg.norm(rec - A) / np.linalg.norm(A) < tol
    assert np.abs(H - H.T.conj()).max() < tol * np.abs(H).max()
    # PSD up to round-off
    assert np.linalg.eigvalsh((H + H.T.conj()) / 2).min() > -tol * np.abs(H).max()


def test_polar_tall_f32(rng):
    A = rng.standard_normal((96, 48)).astype(np.float32)
    U, H = ctq.polar(A, config=CFG)
    _checks(A, U, H)
    Us, Hs = sla.polar(A.astype(np.float64))
    assert np.abs(np.asarray(U) - Us).max() < 1e-4


def test_polar_square_f64(rng):
    A = rng.standard_normal((64, 64))
    U, H = ctq.polar(A, config=CFG)
    _checks(A, U, H, tol=1e-12)
    Us, _ = sla.polar(A)
    assert np.abs(np.asarray(U) - Us).max() < 1e-12


def test_polar_ill_conditioned(rng):
    # cond 1e6 at fp32: orthogonality of U must still be O(eps); U itself
    # is only determined to ~cond * eps.
    Qa = np.linalg.qr(rng.standard_normal((80, 48)))[0]
    Qb = np.linalg.qr(rng.standard_normal((48, 48)))[0]
    s = np.geomspace(1.0, 1e-6, 48)
    A = ((Qa * s) @ Qb).astype(np.float32)
    U, H = ctq.polar(A, config=CFG)
    U = np.asarray(U, np.float64)
    assert np.linalg.norm(U.T @ U - np.eye(48)) < 5e-5
    _checks(A, U, H, tol=5e-5)


def test_polar_complex(rng):
    A = (rng.standard_normal((60, 40))
         + 1j * rng.standard_normal((60, 40))).astype(np.complex64)
    U, H = ctq.polar(A, config=CFG)
    _checks(A, np.asarray(U), np.asarray(H))
    Us, _ = sla.polar(A.astype(np.complex128))
    assert np.abs(np.asarray(U) - Us).max() < 1e-4


def test_polar_wide_and_left(rng):
    A = rng.standard_normal((40, 90)).astype(np.float32)
    U, H = ctq.polar(A)
    assert U.shape == (40, 90) and H.shape == (90, 90)
    _checks(A, U, H)
    Ul, Hl = ctq.polar(A, side="left")
    assert Ul.shape == (40, 90) and Hl.shape == (40, 40)
    _checks(A, Ul, Hl, side="left")
    Us, Hs = sla.polar(A.astype(np.float64), side="left")
    assert np.abs(np.asarray(Ul) - Us).max() < 1e-4


def test_polar_identity_like(rng):
    # Nearly-orthogonal input: schedule is short, result snaps to orthogonal.
    Q0 = np.linalg.qr(rng.standard_normal((32, 32)))[0].astype(np.float32)
    U, H = ctq.polar(Q0, l0=0.5, config=CFG)
    assert np.abs(np.asarray(U) - Q0.astype(np.float64)).max() < 1e-5
    assert np.abs(np.asarray(H) - np.eye(32)).max() < 1e-5


def test_polar_errors(rng):
    with pytest.raises(ctq.QRShapeError):
        ctq.polar(np.zeros((3, 3, 3), np.float32))
    with pytest.raises(ValueError):
        ctq.polar(np.eye(4, dtype=np.float32), side="up")


def test_svd_tall_f32(rng):
    A = rng.standard_normal((96, 48)).astype(np.float32)
    U, s, Vh = ctq.svd(A, config=CFG)
    U, s, Vh = (np.asarray(x, np.float64) for x in (U, s, Vh))
    assert np.linalg.norm((U * s) @ Vh - A) / np.linalg.norm(A) < 5e-6
    assert np.linalg.norm(U.T @ U - np.eye(48)) < 1e-4
    assert np.linalg.norm(Vh @ Vh.T - np.eye(48)) < 1e-4
    s_ref = np.linalg.svd(A.astype(np.float64), compute_uv=False)
    assert np.abs(s - s_ref).max() < 1e-4 * s_ref[0]
    assert (np.diff(s) <= 0).all()


def test_svd_wide_f64(rng):
    A = rng.standard_normal((40, 70))
    U, s, Vh = ctq.svd(A, config=CFG)
    U, s, Vh = (np.asarray(x) for x in (U, s, Vh))
    assert U.shape == (40, 40) and Vh.shape == (40, 70)
    assert np.linalg.norm((U * s) @ Vh - A) / np.linalg.norm(A) < 1e-12
    s_ref = np.linalg.svd(A, compute_uv=False)
    assert np.abs(s - s_ref).max() < 1e-12 * s_ref[0]


def test_svd_complex(rng):
    A = (rng.standard_normal((48, 32))
         + 1j * rng.standard_normal((48, 32))).astype(np.complex64)
    U, s, Vh = ctq.svd(A, config=CFG)
    U, s, Vh = np.asarray(U), np.asarray(s), np.asarray(Vh)
    assert np.linalg.norm((U * s) @ Vh - A) / np.linalg.norm(A) < 5e-6
    assert np.linalg.norm(U.conj().T @ U - np.eye(32)) < 1e-4
    s_ref = np.linalg.svd(A.astype(np.complex128), compute_uv=False)
    assert np.abs(s - s_ref).max() < 1e-4 * s_ref[0]


def test_svd_full_matrices_tall(rng):
    A = rng.standard_normal((80, 48)).astype(np.float32)
    U, s, Vh = ctq.svd(A, full_matrices=True, config=CFG)
    U, s, Vh = (np.asarray(x, np.float64) for x in (U, s, Vh))
    assert U.shape == (80, 80) and Vh.shape == (48, 48)
    assert np.linalg.norm(U.T @ U - np.eye(80)) < 2e-4
    Smat = np.zeros((80, 48))
    np.fill_diagonal(Smat, s)
    assert np.linalg.norm(U @ Smat @ Vh - A) / np.linalg.norm(A) < 5e-6


def test_svd_full_matrices_wide(rng):
    A = rng.standard_normal((32, 56))
    U, s, Vh = ctq.svd(A, full_matrices=True, config=CFG)
    U, s, Vh = (np.asarray(x) for x in (U, s, Vh))
    assert U.shape == (32, 32) and Vh.shape == (56, 56)
    assert np.linalg.norm(Vh @ Vh.T - np.eye(56)) < 1e-12 * 56
    Smat = np.zeros((32, 56))
    np.fill_diagonal(Smat, s)
    assert np.linalg.norm(U @ Smat @ Vh - A) / np.linalg.norm(A) < 1e-12


@pytest.fixture(scope="module")
def mesh():
    import jax
    from cuda_qr_tpu.parallel.mesh import row_mesh
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return row_mesh(8)


@pytest.mark.parametrize("strategy", ["allgather", "cholesky"])
def test_polar_dist_matches_local(rng, mesh, strategy):
    A = rng.standard_normal((256, 32)).astype(np.float32)
    U, H = ctq.polar_dist(A, mesh, config=CFG, strategy=strategy)
    _checks(A, np.asarray(U), np.asarray(H))
    Ul, _ = ctq.polar(A, config=CFG)
    assert np.abs(np.asarray(U) - np.asarray(Ul)).max() < 1e-5


def test_polar_dist_ill_conditioned_f64(rng, mesh):
    Qa = np.linalg.qr(rng.standard_normal((512, 48)))[0]
    Qb = np.linalg.qr(rng.standard_normal((48, 48)))[0]
    s = np.geomspace(1.0, 1e-9, 48)
    A = (Qa * s) @ Qb
    U, H = ctq.polar_dist(A, mesh, config=CFG)
    U64 = np.asarray(U)
    assert np.linalg.norm(U64.T @ U64 - np.eye(48)) < 1e-12 * 48
    _checks(A, U64, np.asarray(H), tol=1e-11)


def test_polar_dist_complex(rng, mesh):
    A = (rng.standard_normal((128, 16))
         + 1j * rng.standard_normal((128, 16))).astype(np.complex64)
    U, H = ctq.polar_dist(A, mesh, config=CFG)
    _checks(A, np.asarray(U), np.asarray(H))


def test_polar_dist_errors(rng, mesh):
    with pytest.raises(ctq.QRShapeError):
        ctq.polar_dist(np.zeros((16, 32), np.float32), mesh)  # wide
    with pytest.raises(ctq.QRShapeError):
        ctq.polar_dist(np.zeros((129, 8), np.float32), mesh)  # m % P != 0


def test_schedule_static_convergence():
    # The static scalar recurrence reaches 1 within a few steps for both
    # dtype floors, and every step is finite.
    for l0, eps in ((1.2e-8, 1.2e-7), (2e-17, 2.2e-16)):
        steps = _qdwh_schedule(l0, eps)
        assert 1 <= len(steps) <= 8
        l = l0
        for a, b, c, use_qr in steps:
            assert np.isfinite([a, b, c]).all() and a > 0 and c > 0
            assert use_qr == (c > 100.0)
            l = l * (a + b * l * l) / (1.0 + c * l * l)
        assert abs(1.0 - l) <= 5 * eps


def test_svd_dist_matches_numpy(rng, mesh):
    A = rng.standard_normal((256, 32)).astype(np.float32)
    U, s, Vh = ctq.svd_dist(A, mesh, config=CFG)
    U, s, Vh = (np.asarray(x, np.float64) for x in (U, s, Vh))
    A64 = A.astype(np.float64)
    assert np.linalg.norm((U * s) @ Vh - A64) / np.linalg.norm(A64) < 1e-5
    assert np.linalg.norm(U.T @ U - np.eye(32)) < 32 * 5e-6
    assert np.linalg.norm(Vh @ Vh.T - np.eye(32)) < 32 * 5e-6
    s_ref = np.linalg.svd(A64, compute_uv=False)
    assert np.abs(s - s_ref).max() < 1e-4 * s_ref[0]
    assert (np.diff(s) <= 1e-6).all()


def test_svd_dist_qdwh_eigh_f64(rng, mesh):
    # fully in-house distributed pipeline: no XLA eigensolver anywhere
    A = rng.standard_normal((128, 16))
    U, s, Vh = ctq.svd_dist(A, mesh,
                            config=ctq.QRConfig(dtype=jnp.float64,
                                                panel_width=16,
                                                scan_stages=2),
                            eigh_impl="qdwh")
    U, s, Vh = (np.asarray(x, np.float64) for x in (U, s, Vh))
    assert np.linalg.norm((U * s) @ Vh - A) / np.linalg.norm(A) < 1e-12
    assert np.linalg.norm(U.T @ U - np.eye(16)) < 1e-12 * 16
    s_ref = np.linalg.svd(A, compute_uv=False)
    assert np.abs(s - s_ref).max() < 1e-11 * s_ref[0]


def test_svd_dist_errors(rng, mesh):
    with pytest.raises(ctq.QRShapeError):
        ctq.svd_dist(np.zeros((16, 32), np.float32), mesh)  # wide
    with pytest.raises(ValueError):
        ctq.svd_dist(np.zeros((64, 8), np.float32), mesh, eigh_impl="nope")


def test_svd_dist_complex(rng, mesh):
    A = (rng.standard_normal((128, 16))
         + 1j * rng.standard_normal((128, 16))).astype(np.complex64)
    U, s, Vh = ctq.svd_dist(A, mesh, config=CFG)
    U = np.asarray(U, np.complex128)
    s = np.asarray(s, np.float64)
    Vh = np.asarray(Vh, np.complex128)
    A128 = A.astype(np.complex128)
    assert np.linalg.norm((U * s) @ Vh - A128) / np.linalg.norm(A128) < 2e-5
    assert np.linalg.norm(U.conj().T @ U - np.eye(16)) < 16 * 5e-6
    s_ref = np.linalg.svd(A128, compute_uv=False)
    assert np.abs(s - s_ref).max() < 2e-4 * s_ref[0]
