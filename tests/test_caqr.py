"""Distributed CAQR on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.models.caqr import caqr, caqr_r
from cuda_qr_tpu.utils.config import QRConfig
from cuda_qr_tpu.utils.verify import check_qr

CFG = QRConfig(panel_width=8, dtype=jnp.float64, use_pallas=False)


@pytest.fixture(scope="module")
def mesh():
    from cuda_qr_tpu.parallel.mesh import row_mesh
    return row_mesh(8)


@pytest.mark.parametrize("combine", ["bk", "allgather"])
@pytest.mark.parametrize("m,n", [
    (128, 64),    # 2 panel-rows per shard
    (128, 128),   # square: last panels live on the last shard only
    (256, 96),
    (200, 50),    # needs padding
])
def test_caqr(rng, mesh, m, n, combine):
    A = rng.standard_normal((m, n))
    Q, R = caqr(jnp.asarray(A), mesh, CFG, combine=combine)
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.residual < 4 * max(n, 16) * chk.eps, (m, n, chk)
    assert chk.orthogonality < 8 * max(n, 16) * chk.eps, (m, n, chk)
    assert chk.r_triangular == 0.0


def test_caqr_bk_matches_allgather_r(rng, mesh):
    """Both combines factor the same matrix to the same R (up to row signs)."""
    A = rng.standard_normal((128, 64))
    _, Rb = caqr(jnp.asarray(A), mesh, CFG, combine="bk")
    _, Ra = caqr(jnp.asarray(A), mesh, CFG, combine="allgather")
    db = np.sign(np.diag(np.asarray(Rb)))
    da = np.sign(np.diag(np.asarray(Ra)))
    np.testing.assert_allclose(np.asarray(Rb) * db[:, None],
                               np.asarray(Ra) * da[:, None], atol=1e-11)


def test_caqr_bk_ill_conditioned_falls_back(rng, mesh):
    """cond(A) ~ 1e7 in fp32: the BK combine's CholeskyQR2 must detect the
    breakdown per panel and fall back to the stacked Householder QR."""
    n = 32
    cfg = QRConfig(panel_width=8, dtype=jnp.float32, use_pallas=False)
    U, _ = np.linalg.qr(rng.standard_normal((128, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = ((U * np.logspace(0, -7.2, n)) @ V.T).astype(np.float32)
    Q, R = caqr(jnp.asarray(A), mesh, cfg, combine="bk")
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.residual < 4 * n * chk.eps, chk
    assert chk.orthogonality < 8 * n * chk.eps, chk


def test_caqr_bk_rank_deficient(rng, mesh):
    cfg = QRConfig(panel_width=8, dtype=jnp.float32, use_pallas=False)
    A = rng.standard_normal((128, 32)).astype(np.float32)
    A[:, 3] = A[:, 2]  # exactly dependent columns within a panel
    Q, R = caqr(jnp.asarray(A), mesh, cfg, combine="bk")
    assert np.all(np.isfinite(np.asarray(Q)))
    resid = np.linalg.norm(np.float64(Q) @ np.float64(R) - A)
    assert resid < 1e-4 * np.linalg.norm(A)


def test_caqr_r_matches_single_chip(rng, mesh):
    """Distributed R must equal the single-chip blocked R up to row signs."""
    from cuda_qr_tpu.ops.blocked import extract_r, qr_blocked
    m, n = 128, 64
    A = rng.standard_normal((m, n))
    R_d = np.asarray(caqr_r(jnp.asarray(A), mesh, CFG))
    cfg1 = QRConfig(panel_width=8, dtype=jnp.float64, use_pallas=False)
    R_1 = np.asarray(extract_r(qr_blocked(jnp.asarray(A), cfg1), n))
    d = np.sign(np.diag(R_d)) * np.sign(np.diag(R_1))
    np.testing.assert_allclose(R_d * d[:, None], R_1, atol=1e-11)


def test_caqr_f32(rng, mesh):
    cfg = QRConfig(panel_width=16, dtype=jnp.float32, use_pallas=False)
    A = rng.standard_normal((256, 128)).astype(np.float32)
    Q, R = caqr(jnp.asarray(A), mesh, cfg)
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.residual < 4 * 128 * chk.eps, chk
    assert chk.orthogonality < 8 * 128 * chk.eps, chk


@pytest.mark.parametrize("m,n", [(128, 64), (128, 128), (256, 96)])
def test_caqr_cyclic_layout(rng, mesh, m, n):
    """Block-cyclic row distribution (BASELINE config 5's layout)."""
    A = rng.standard_normal((m, n))
    Q, R = caqr(jnp.asarray(A), mesh, CFG, layout="cyclic")
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.residual < 4 * max(n, 16) * chk.eps, (m, n, chk)
    assert chk.orthogonality < 8 * max(n, 16) * chk.eps, (m, n, chk)
    assert chk.r_triangular == 0.0


def test_caqr_cyclic_matches_block_r(rng, mesh):
    A = rng.standard_normal((128, 64))
    _, Rb = caqr(jnp.asarray(A), mesh, CFG, layout="block")
    _, Rc = caqr(jnp.asarray(A), mesh, CFG, layout="cyclic")
    db = np.sign(np.diag(np.asarray(Rb)))
    dc = np.sign(np.diag(np.asarray(Rc)))
    np.testing.assert_allclose(np.asarray(Rb) * db[:, None],
                               np.asarray(Rc) * dc[:, None], atol=1e-11)


def test_lstsq_dist_matches_local(rng, mesh):
    import numpy as np
    from cuda_qr_tpu.models.lstsq import lstsq, lstsq_dist
    from cuda_qr_tpu.utils.config import QRConfig
    cfg = QRConfig(panel_width=8, dtype=jnp.float32, use_pallas=False)
    m, n = 8 * 16, 24
    A = rng.standard_normal((m, n)).astype(np.float32)
    b = rng.standard_normal((m, 3)).astype(np.float32)
    got = lstsq_dist(A, b, mesh, cfg)
    ref = np.linalg.lstsq(A.astype(np.float64), b.astype(np.float64),
                          rcond=None)[0]
    assert np.allclose(np.asarray(got.x), ref, atol=n * 1e-5)
    r_ref = np.linalg.norm(A @ ref - b, axis=0)
    assert np.allclose(np.asarray(got.residual_norm), r_ref, rtol=1e-4)
    # single-rhs shape contract
    got1 = lstsq_dist(A, b[:, 0], mesh, cfg)
    assert got1.x.shape == (n,) and got1.residual_norm.shape == ()


@pytest.mark.parametrize("layout", ["block", "cyclic"])
def test_caqr_complex(rng, mesh, layout):
    """Complex CAQR routes to the allgather (Householder) combine."""
    cfg = QRConfig(panel_width=8, use_pallas=False)
    A = (rng.standard_normal((128, 40))
         + 1j * rng.standard_normal((128, 40))).astype(np.complex64)
    Q, R = caqr(jnp.asarray(A), mesh, cfg, layout=layout)
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.ok, chk


def test_caqr_complex_bk_rejected(rng, mesh):
    from cuda_qr_tpu.parallel.caqr import caqr_factor
    from cuda_qr_tpu.utils.errors import QRShapeError
    cfg = QRConfig(panel_width=8, dtype=jnp.complex64, use_pallas=False)
    A = jnp.ones((64, 16), jnp.complex64)
    with pytest.raises(QRShapeError):
        caqr_factor(A, mesh, cfg, combine="bk")


def test_lstsq_dist_complex(rng, mesh):
    from cuda_qr_tpu.models.lstsq import lstsq_dist
    cfg = QRConfig(panel_width=8, use_pallas=False)
    A = (rng.standard_normal((128, 24))
         + 1j * rng.standard_normal((128, 24))).astype(np.complex64)
    b = (rng.standard_normal((128, 2))
         + 1j * rng.standard_normal((128, 2))).astype(np.complex64)
    got = lstsq_dist(jnp.asarray(A), jnp.asarray(b), mesh, cfg)
    ref = np.linalg.lstsq(A.astype(np.complex128), b.astype(np.complex128),
                          rcond=None)[0]
    assert np.abs(np.asarray(got.x) - ref).max() < 24 * 1e-6
    r_ref = np.linalg.norm(A @ ref - b, axis=0)
    assert np.allclose(np.asarray(got.residual_norm), r_ref, rtol=1e-4)


@pytest.mark.parametrize("combine", ["bk", "allgather"])
@pytest.mark.parametrize("layout", ["block", "cyclic"])
def test_caqr_ormqr_matches_explicit_q(rng, mesh, combine, layout):
    import jax
    from cuda_qr_tpu.parallel.caqr import (caqr_factor, caqr_orgqr,
                                           caqr_ormqr, cyclic_permutation)
    from cuda_qr_tpu.parallel.mesh import row_sharding
    cfg = QRConfig(panel_width=8, dtype=jnp.float32, use_pallas=False)
    m, n, w = 8 * 16, 32, 5
    A = rng.standard_normal((m, n)).astype(np.float32)
    As = A
    if layout == "cyclic":
        perm, inv = cyclic_permutation(m, 8, 8)
        As = A[perm]
    Ad = jax.device_put(jnp.asarray(As), row_sharding(mesh))
    factors, R = caqr_factor(Ad, mesh, cfg, layout=layout, combine=combine)
    Q = np.asarray(caqr_orgqr(factors, mesh, n, cfg, layout=layout),
                   np.float64)  # storage order

    B = rng.standard_normal((m, w)).astype(np.float32)
    Bs = B[perm] if layout == "cyclic" else B
    Bd = jax.device_put(jnp.asarray(Bs), row_sharding(mesh))
    QtB = caqr_ormqr(factors, Bd, mesh, cfg, layout=layout, transpose=True)
    # the n coefficient rows live at the storage positions of R's rows
    # (logical top-n): for cyclic that's inv[:n], for block the literal top
    top = np.asarray(QtB)[inv[:n]] if layout == "cyclic" \
        else np.asarray(QtB)[:n]
    assert np.allclose(top, Q.T @ Bs, atol=n * 1e-6)

    # roundtrip: Q (Q^T B) == projection of B onto range(Q) for the top-n
    # block; with full-height apply, Q_full Q_full^T = I so roundtrip == B
    back = caqr_ormqr(factors, QtB, mesh, cfg, layout=layout,
                      transpose=False)
    assert np.allclose(np.asarray(back), Bs, atol=n * 1e-6)


def test_lstsq_dist_misaligned_shapes(rng, mesh):
    """m not divisible by P, n not a panel multiple: padding must be
    transparent (zero rows/columns fall out of the augmented triangle)."""
    from cuda_qr_tpu.models.lstsq import lstsq_dist
    cfg = QRConfig(panel_width=8, use_pallas=False)
    A = rng.standard_normal((100, 20)).astype(np.float32)
    b = rng.standard_normal(100).astype(np.float32)
    got = lstsq_dist(jnp.asarray(A), jnp.asarray(b), mesh, cfg)
    ref = np.linalg.lstsq(A.astype(np.float64), b.astype(np.float64),
                          rcond=None)[0]
    assert np.abs(np.asarray(got.x) - ref).max() < 20 * 1e-6
    assert abs(float(got.residual_norm)
               - np.linalg.norm(A @ ref - b)) < 1e-4
