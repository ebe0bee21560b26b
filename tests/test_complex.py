"""Complex64 QR (LAPACK cgeqrf conventions: complex tau, real R diagonal)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_qr_tpu.models.qr import qr, qr_factor
from cuda_qr_tpu.ops.blocked import extract_r, orgqr, qr_blocked
from cuda_qr_tpu.ops.householder import geqr2, larft, make_reflector, unpack_v
from cuda_qr_tpu.utils.config import QRConfig


def _crand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape) +
                       1j * rng.standard_normal(shape), jnp.complex64)


def _check(Q, R, A, tol):
    Q, R, A = map(np.asarray, (Q, R, A))
    resid = np.linalg.norm(Q @ R - A) / np.linalg.norm(A)
    orth = np.linalg.norm(Q.conj().T @ Q - np.eye(Q.shape[1]))
    assert resid < tol, f"residual {resid:.3e}"
    assert orth < tol, f"orthogonality {orth:.3e}"
    assert np.allclose(R, np.triu(R), atol=1e-5), "R not upper triangular"


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_make_reflector_complex(rng):
    x = _crand(rng, 12)
    v, tau, beta = make_reflector(x, 3)
    v, tau, beta = map(np.asarray, (v, tau, beta))
    H = np.eye(12) - tau * np.outer(v, v.conj())
    y = H.conj().T @ np.asarray(x)
    # rows > 3 annihilated, row 3 becomes beta (real by clarfg convention)
    assert np.abs(y[4:]).max() < 1e-5
    assert abs(y[3] - beta) < 1e-5
    assert abs(np.imag(beta)) < 1e-6
    # H is unitary
    assert np.linalg.norm(H.conj().T @ H - np.eye(12)) < 1e-5


def test_geqr2_complex_residual(rng):
    A = _crand(rng, 16, 6)
    packed, tau = geqr2(A)
    V = unpack_v(packed, 0)
    T = larft(V, tau)
    Q = np.eye(16, dtype=np.complex64) - np.asarray(V) @ np.asarray(T) @ \
        np.asarray(V).conj().T
    R = np.triu(np.asarray(packed))[:6]
    _check(Q[:, :6], R, A, 1e-4)


@pytest.mark.parametrize("m,n", [(48, 48), (96, 33), (200, 64)])
def test_qr_blocked_complex(rng, m, n):
    A = _crand(rng, m, n)
    cfg = QRConfig(panel_width=16, scan_stages=2)
    fac = qr_blocked(A, cfg)
    assert fac.packed.dtype == jnp.complex64
    Q = orgqr(fac, m, n, cfg)
    R = extract_r(fac, n)
    _check(Q, R, A, 1e-4)
    # clarfg convention: R diagonal is real
    assert np.abs(np.imag(np.diagonal(np.asarray(R)))).max() < 1e-5


def test_qr_complex_modes(rng):
    A = _crand(rng, 20, 8)
    Q, R = qr(A)
    _check(Q, R, A, 1e-4)
    Qc, Rc = qr(A, mode="complete")
    assert Qc.shape == (20, 20) and Rc.shape == (20, 8)
    _check(Qc[:, :8], Rc[:8], A, 1e-4)
    assert np.linalg.norm(np.asarray(Qc).conj().T @ np.asarray(Qc)
                          - np.eye(20)) < 1e-4


def test_qr_complex_wide(rng):
    A = _crand(rng, 8, 20)
    Q, R = qr(A)
    _check(Q, R, A, 1e-4)


def test_ormqr_complex_roundtrip(rng):
    A = _crand(rng, 32, 12)
    res = qr_factor(A, QRConfig(panel_width=8, scan_stages=1))
    B = _crand(rng, 32, 5)
    # Q (Q^H B) == B
    back = res.apply_q(res.apply_qt(B))
    assert np.linalg.norm(np.asarray(back) - np.asarray(B)) < 1e-4


def test_complex_vs_numpy_r(rng):
    """|R| matches numpy's (phases may differ by column scaling)."""
    A = _crand(rng, 24, 10)
    _, R = qr(A)
    Rn = np.linalg.qr(np.asarray(A), mode="r")
    assert np.allclose(np.abs(np.asarray(R)), np.abs(Rn), atol=1e-4)


def test_complex_lstsq(rng):
    from cuda_qr_tpu.models.lstsq import lstsq
    A = _crand(rng, 40, 12)
    x_true = np.asarray(_crand(rng, 12, 3))
    b = np.asarray(A) @ x_true
    res = lstsq(A, jnp.asarray(b))
    assert np.linalg.norm(np.asarray(res.x) - x_true) < 1e-3
    assert np.all(np.asarray(res.residual_norm) < 1e-3)


def test_complex128(rng):
    import jax
    if not jax.config.jax_enable_x64:
        pytest.skip("needs x64")
    A = jnp.asarray(np.asarray(_crand(rng, 30, 14), np.complex128))
    Q, R = qr(A)
    _check(Q, R, A, 1e-12)


def test_complex_tsqr(rng):
    from cuda_qr_tpu.models.tsqr import tsqr, tsqr_r
    A = _crand(rng, 4096, 32)
    cfg = QRConfig(block_rows=512, use_pallas=False)
    Q, R = tsqr(A, cfg)
    _check(Q, R, A, 1e-4)
    # tsqr_r matches tsqr's R up to per-column reflector sign/phase
    R2 = tsqr_r(A, cfg)
    assert np.allclose(np.abs(np.asarray(R2)), np.abs(np.asarray(R)),
                       atol=1e-4)
    # cholqr2 leaf config must also route complex to Householder, not crash
    Q3, R3 = tsqr(A, cfg.replace(tsqr_leaf="cholqr2"))
    _check(Q3, R3, A, 1e-4)


def test_complex_caqr_bk_rejected_allgather_ok(rng):
    """The real-only basis-kernel combine rejects complex; the factor form
    works with combine='allgather' + a complex config (the models.caqr
    wrapper does this routing automatically -- test_caqr.py)."""
    import jax
    from cuda_qr_tpu.parallel.caqr import caqr_factor
    from cuda_qr_tpu.parallel.mesh import row_mesh, row_sharding
    from cuda_qr_tpu.utils.errors import QRShapeError
    mesh = row_mesh(min(8, len(jax.devices())))
    P = mesh.shape["rows"]
    A = _crand(rng, P * 16, 16)
    with pytest.raises(QRShapeError, match="allgather"):
        caqr_factor(A, mesh, QRConfig(panel_width=16, use_pallas=False),
                    combine="bk")
    cfg = QRConfig(panel_width=16, dtype=jnp.complex64, use_pallas=False,
                   use_chol_kernel=False)
    Ad = jax.device_put(jnp.asarray(A), row_sharding(mesh))
    _, R = caqr_factor(Ad, mesh, cfg, combine="allgather")
    Rn = np.linalg.qr(np.asarray(A, np.complex128), mode="r")
    assert np.allclose(np.abs(np.diagonal(np.asarray(R))),
                       np.abs(np.diagonal(Rn)), rtol=1e-4)
