"""Blocked QR driver (geqrf/orgqr/ormqr) properties.

Includes the misalignment cases that silently corrupt the reference
(SURVEY.md S4): arbitrary m and n must work via internal padding.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.ops.blocked import extract_r, orgqr, ormqr, qr_blocked
from cuda_qr_tpu.utils.config import QRConfig
from cuda_qr_tpu.utils.verify import check_qr

CFG32 = QRConfig(panel_width=16, dtype=jnp.float32, use_pallas=False)
CFG64 = QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False)


@pytest.mark.parametrize("m,n", [
    (32, 32), (64, 48), (48, 16),
    (30, 17),   # misaligned both dims (reference would corrupt, SURVEY.md S4)
    (100, 100), (37, 5), (16, 16),
])
@pytest.mark.parametrize("cfg", [CFG32, CFG64], ids=["f32", "f64"])
def test_blocked_qr(rng, m, n, cfg):
    A = rng.standard_normal((m, n)).astype(cfg.dtype)
    fac = qr_blocked(jnp.asarray(A), cfg)
    Q = orgqr(fac, m, n, cfg)
    R = extract_r(fac, n)
    chk = check_qr(A, Q, R)
    assert chk.residual < max(n, 16) * chk.eps, (m, n, chk)
    assert chk.orthogonality < 4 * max(n, 16) * chk.eps, (m, n, chk)
    assert chk.r_triangular == 0.0


def test_blocked_matches_unblocked(rng):
    """Blocked and unblocked paths must produce identical packed factors."""
    from cuda_qr_tpu.ops.householder import geqr2
    m, n = 48, 32
    A = rng.standard_normal((m, n))
    fac = qr_blocked(jnp.asarray(A), CFG64)
    packed_u, tau_u = geqr2(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(fac.packed[:m, :n]),
                               np.asarray(packed_u), atol=1e-13)
    np.testing.assert_allclose(np.asarray(fac.taus).ravel(),
                               np.asarray(tau_u), atol=1e-13)


def test_ormqr_roundtrip(rng):
    m, n, p = 40, 24, 7
    A = rng.standard_normal((m, n))
    B = rng.standard_normal((m, p))
    fac = qr_blocked(jnp.asarray(A), CFG64)
    QtB = ormqr(fac, jnp.asarray(B), transpose=True, config=CFG64)
    back = ormqr(fac, QtB, transpose=False, config=CFG64)
    np.testing.assert_allclose(np.asarray(back), B, atol=1e-12)
    # Q^T B via explicit Q must agree (full-height application).
    Qfull = orgqr(fac, m, m, CFG64)
    np.testing.assert_allclose(np.asarray(QtB), np.asarray(Qfull.T @ B),
                               atol=1e-12)


def test_qr_model_api(rng):
    from cuda_qr_tpu import qr, qr_factor
    A = rng.standard_normal((50, 20))
    Q, R = qr(A, CFG64)
    chk = check_qr(A, Q, R)
    assert chk.ok, chk
    res = qr_factor(A, CFG64)
    np.testing.assert_allclose(np.asarray(res.apply_qt(A)[:20]),
                               np.asarray(R), atol=1e-11)


def test_against_numpy_r_signs(rng):
    """R agrees with LAPACK up to the documented sign convention."""
    A = rng.standard_normal((64, 32))
    fac = qr_blocked(jnp.asarray(A), CFG64)
    R = np.asarray(extract_r(fac, 32))
    R_np = np.linalg.qr(A, mode="r")
    np.testing.assert_allclose(np.abs(R), np.abs(R_np), rtol=1e-10, atol=1e-12)


def test_qr_wide(rng):
    """m < n: reference forbids this outright (qr.c:465); we factor it."""
    from cuda_qr_tpu.models.qr import qr
    A = rng.standard_normal((20, 50))
    Q, R = qr(A, CFG64)
    assert Q.shape == (20, 20) and R.shape == (20, 50)
    np.testing.assert_allclose(np.asarray(Q @ R), A, atol=1e-11)
    np.testing.assert_allclose(np.asarray(Q.T @ Q), np.eye(20), atol=1e-12)
    assert np.abs(np.tril(np.asarray(R)[:, :20], -1)).max() < 1e-14


def test_qr_complete(rng):
    from cuda_qr_tpu.models.qr import qr
    A = rng.standard_normal((40, 24))
    Q, R = qr(A, CFG64, mode="complete")
    assert Q.shape == (40, 40) and R.shape == (40, 24)
    np.testing.assert_allclose(np.asarray(Q @ R), A, atol=1e-11)
    np.testing.assert_allclose(np.asarray(Q.T @ Q), np.eye(40), atol=1e-12)


def test_qr_batched(rng):
    from cuda_qr_tpu.models.qr import qr
    A = rng.standard_normal((3, 40, 24))
    Q, R = qr(A, CFG64)
    assert Q.shape == (3, 40, 24) and R.shape == (3, 24, 24)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(Q[i] @ R[i]), A[i], atol=1e-11)


def test_qr_batched_complete(rng):
    """Batched input must honor mode='complete' (square Q per element)."""
    from cuda_qr_tpu.models.qr import qr
    A = rng.standard_normal((2, 40, 24))
    Q, R = qr(A, CFG64, mode="complete")
    assert Q.shape == (2, 40, 40) and R.shape == (2, 40, 24)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(Q[i] @ R[i]), A[i], atol=1e-11)
        np.testing.assert_allclose(np.asarray(Q[i].T @ Q[i]), np.eye(40),
                                   atol=1e-12)
    Rr = qr(A, CFG64, mode="r")
    assert Rr.shape == (2, 24, 24)
    np.testing.assert_allclose(np.asarray(Rr), np.asarray(R[:, :24]),
                               atol=1e-12)


@pytest.mark.parametrize("method", ["geqr2", "geqrt", "cholqr2_hr"])
@pytest.mark.parametrize("driver", ["scan", "unrolled"])
def test_bfloat16_all_panel_methods(rng, method, driver):
    """bf16 input works with every panel method / driver combination
    (the scan driver used to crash on float32-vs-bf16 tau/T dtypes)."""
    m, n = 64, 32
    A = rng.standard_normal((m, n)).astype(np.float32)
    cfg = QRConfig(panel_width=16, dtype=jnp.bfloat16, panel_method=method,
                   driver=driver, use_pallas=(method != "geqr2"))
    fac = qr_blocked(jnp.asarray(A), cfg)
    assert fac.packed.dtype == jnp.bfloat16
    Q = orgqr(fac, m, n, cfg)
    R = extract_r(fac, n)
    chk = check_qr(A, Q, R)
    # bf16 has ~8 mantissa bits; eps(bf16) = 2^-8
    assert chk.residual < 4 * n * 2 ** -8, (method, driver, chk)


def test_fp64_geqrt_scan_fallback(rng):
    """fp64 + panel_method='geqrt' + scan driver must take the jnp fallback
    (the Pallas kernel does not compute fp64) and stay fp64 throughout."""
    m, n = 64, 32
    A = rng.standard_normal((m, n))
    cfg = QRConfig(panel_width=16, dtype=jnp.float64, panel_method="geqrt")
    fac = qr_blocked(jnp.asarray(A), cfg)
    assert fac.packed.dtype == jnp.float64
    chk = check_qr(A, orgqr(fac, m, n, cfg), extract_r(fac, n))
    assert chk.residual < n * chk.eps, chk


def test_qr_grad_matches_xla(rng):
    """qr is differentiable (custom VJP) and matches jnp.linalg.qr grads."""
    import jax
    from cuda_qr_tpu.models.qr import qr
    A = jnp.asarray(rng.standard_normal((12, 6)))

    def loss_ours(A):
        Q, R = qr(A, CFG64)
        return jnp.sum(Q * jnp.cos(R.sum())) + jnp.sum(R ** 2) * 0.1

    def loss_xla(A):
        Q, R = jnp.linalg.qr(A)
        # sign-align columns to our convention so the losses match
        s = jnp.sign(jnp.diagonal(R)) * jnp.sign(
            jnp.diagonal(qr(A, CFG64)[1]))
        Q, R = Q * s[None, :], R * s[:, None]
        return jnp.sum(Q * jnp.cos(R.sum())) + jnp.sum(R ** 2) * 0.1

    g1 = jax.grad(loss_ours)(A)
    g2 = jax.grad(loss_xla)(A)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-8)


def test_qr_grad_finite_difference(rng):
    import jax
    from cuda_qr_tpu.models.qr import qr
    A = np.asarray(rng.standard_normal((10, 5)))

    def loss(A):
        Q, R = qr(A, CFG64)
        return jnp.sum(R ** 2) + jnp.sum(Q[:, 0] ** 3)

    g = np.asarray(jax.grad(loss)(jnp.asarray(A)))
    eps = 1e-6
    for idx in [(0, 0), (3, 2), (9, 4)]:
        Ap = A.copy(); Ap[idx] += eps
        Am = A.copy(); Am[idx] -= eps
        fd = (float(loss(jnp.asarray(Ap))) - float(loss(jnp.asarray(Am)))) / (2 * eps)
        assert abs(fd - g[idx]) < 1e-5 * max(1, abs(fd)), (idx, fd, g[idx])


def test_qr_wide_complete(rng):
    from cuda_qr_tpu.models.qr import qr
    A = rng.standard_normal((16, 40))
    Q, R = qr(A, CFG64, mode="complete")
    assert Q.shape == (16, 16) and R.shape == (16, 40)
    np.testing.assert_allclose(np.asarray(Q @ R), A, atol=1e-11)
    np.testing.assert_allclose(np.asarray(Q.T @ Q), np.eye(16), atol=1e-12)


def test_qr_raw_mode_lapack_parity(rng):
    """mode='raw' returns transposed LAPACK geqrf storage: rebuild Q from
    (h, tau) with scipy and check the factorization."""
    import scipy.linalg as sla
    from cuda_qr_tpu.models.qr import qr
    m, n = 96, 40
    A = rng.standard_normal((m, n)).astype(np.float64)
    h, tau = qr(A, CFG64, mode="raw")
    h, tau = np.asarray(h), np.asarray(tau)
    assert h.shape == (n, m) and tau.shape == (n,)
    # R from the packed upper triangle
    R = np.triu(h.T[:n])
    # Q via LAPACK orgqr on the packed columns
    from scipy.linalg.lapack import dorgqr
    out = dorgqr(h.T[:, :n].copy(), tau)
    Qr = out[0]
    assert np.linalg.norm(Qr[:, :n] @ R - A) / np.linalg.norm(A) < 1e-13
    assert np.linalg.norm(Qr[:, :n].T @ Qr[:, :n] - np.eye(n)) < 1e-12


@pytest.mark.parametrize("stages,g", [(2, 8), (4, 4), (8, 2), (2, 4)])
def test_lookahead_group_widths(rng, stages, g):
    """Every (scan_stages, factor_lookahead) combination must factor
    identically well -- including kg == g (one group per stage), which takes
    the static exact-width trailing-update path, and kg > g, which takes the
    masked full-width path.  16 panels of width 16 at 256x256."""
    m = n = 256
    cfg = QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False,
                   scan_stages=stages, factor_lookahead=g)
    A = rng.standard_normal((m, n))
    fac = qr_blocked(jnp.asarray(A), cfg)
    Q = orgqr(fac, m, n, cfg)
    R = extract_r(fac, n)
    chk = check_qr(A, Q, R)
    assert chk.residual < n * chk.eps, (stages, g, chk)
    assert chk.orthogonality < 4 * n * chk.eps, (stages, g, chk)
    assert chk.r_triangular == 0.0


@pytest.mark.parametrize("sched,g", [
    ((2,) * 4 + (8,), 8),   # the tail schedule: exact-width everywhere
    ((1, 3, 4, 8), 4),      # mixed counts incl. non-power-of-two stage
    ((16,), 4),             # single stage == plain scan
])
def test_stage_schedule(rng, sched, g):
    """Non-uniform stage_schedule must factor identically well to the
    uniform ladder (16 panels of width 16 at 256x256), including tail
    stages whose panel count equals the lookahead width (kg == g path)."""
    m = n = 256
    cfg = QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False,
                   stage_schedule=sched, factor_lookahead=g)
    A = rng.standard_normal((m, n))
    fac = qr_blocked(jnp.asarray(A), cfg)
    Q = orgqr(fac, m, n, cfg)
    R = extract_r(fac, n)
    chk = check_qr(A, Q, R)
    assert chk.residual < n * chk.eps, (sched, g, chk)
    assert chk.orthogonality < 4 * n * chk.eps, (sched, g, chk)
    assert chk.r_triangular == 0.0


def test_stage_schedule_validation(rng):
    A = jnp.asarray(rng.standard_normal((64, 64)))
    bad = QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False,
                   stage_schedule=(2, 1))  # sums to 3, k = 4
    with pytest.raises(ValueError, match="stage_schedule"):
        qr_blocked(A, bad)


def test_stage_schedule_rejected_by_unrolled_driver(rng):
    """stage_schedule is a scan-driver knob: the unrolled driver must
    reject it loudly instead of silently ignoring it (ADVICE r4)."""
    A = jnp.asarray(rng.standard_normal((64, 64)))
    cfg = QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False,
                   driver="unrolled", stage_schedule=(2, 2))
    with pytest.raises(ValueError, match="scan-driver"):
        qr_blocked(A, cfg)
