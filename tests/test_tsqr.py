"""TSQR tree reduction properties."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.models.tsqr import tsqr, tsqr_r
from cuda_qr_tpu.utils.config import QRConfig
from cuda_qr_tpu.utils.verify import check_qr

CFG = QRConfig(block_rows=64, dtype=jnp.float64, use_pallas=False)


@pytest.mark.parametrize("m,n", [
    (64, 16),      # single block
    (256, 16),     # 4 leaves
    (1000, 16),    # padding + 16 leaves
    (640, 32),     # odd leaf count (10)
    (4096, 128),   # full panel width
])
def test_tsqr(rng, m, n):
    A = rng.standard_normal((m, n))
    Q, R = tsqr(jnp.asarray(A), CFG)
    chk = check_qr(A, Q, R)
    assert chk.residual < 4 * n * chk.eps, (m, n, chk)
    assert chk.orthogonality < 8 * n * chk.eps, (m, n, chk)
    assert chk.r_triangular == 0.0


def test_tsqr_r_matches_full(rng):
    A = rng.standard_normal((512, 24))
    _, R_full = tsqr(jnp.asarray(A), CFG)
    R_only = tsqr_r(jnp.asarray(A), CFG)
    np.testing.assert_allclose(np.asarray(R_only), np.asarray(R_full),
                               atol=1e-12)


def test_tsqr_f32(rng):
    cfg = QRConfig(block_rows=128, dtype=jnp.float32, use_pallas=False)
    A = rng.standard_normal((2048, 64)).astype(np.float32)
    Q, R = tsqr(jnp.asarray(A), cfg)
    chk = check_qr(A, Q, R)
    assert chk.residual < 4 * 64 * chk.eps, chk
    assert chk.orthogonality < 8 * 64 * chk.eps, chk


def test_tsqr_vs_lapack_r(rng):
    """|R| must agree with LAPACK's (TSQR R has per-row sign ambiguity)."""
    A = rng.standard_normal((512, 16))
    _, R = tsqr(jnp.asarray(A), CFG)
    R_np = np.linalg.qr(A, mode="r")
    d = np.sign(np.diag(np.asarray(R))) * np.sign(np.diag(R_np))
    np.testing.assert_allclose(np.asarray(R) * d[:, None], R_np, atol=1e-10)


@pytest.mark.parametrize("m,n", [(1000, 16), (4096, 128)])
def test_tsqr_cholqr2_leaves(rng, m, n):
    cfg = QRConfig(block_rows=256, dtype=jnp.float32, use_pallas=False,
                   tsqr_leaf="cholqr2")
    A = rng.standard_normal((m, n)).astype(np.float32)
    Q, R = tsqr(jnp.asarray(A), cfg)
    chk = check_qr(A, Q, R)
    assert chk.residual < 4 * n * chk.eps, chk
    assert chk.orthogonality < 8 * n * chk.eps, chk


def test_tsqr_cholqr2_fallback_rank_deficient(rng):
    """A rank-deficient leaf breaks Cholesky; the guard must fall back to
    Householder and still produce a valid factorization."""
    cfg = QRConfig(block_rows=64, dtype=jnp.float32, use_pallas=False,
                   tsqr_leaf="cholqr2")
    A = rng.standard_normal((256, 8)).astype(np.float32)
    A[:, 3] = A[:, 2]  # exactly dependent columns
    Q, R = tsqr(jnp.asarray(A), cfg)
    assert np.all(np.isfinite(np.asarray(Q)))
    resid = np.linalg.norm(np.float64(Q) @ np.float64(R) - A)
    assert resid < 1e-4 * np.linalg.norm(A)


def test_tsqr_cholqr2_direct_matches_tree_quality(rng):
    """The direct two-pass CholeskyQR2 path (m > block_rows, cholqr2) must
    hit the same tolerances as the tree, and tsqr_r must agree with it."""
    from cuda_qr_tpu.models.tsqr import tsqr_r
    m, n = 4096, 32
    cfg = QRConfig(block_rows=64, dtype=jnp.float32, use_pallas=False,
                   tsqr_leaf="cholqr2")
    A = rng.standard_normal((m, n)).astype(np.float32)
    Q, R = tsqr(jnp.asarray(A), cfg)
    chk = check_qr(A, Q, R)
    assert chk.residual < 4 * n * chk.eps, chk
    assert chk.orthogonality < 8 * n * chk.eps, chk
    assert chk.r_triangular == 0.0
    Rr = tsqr_r(jnp.asarray(A), cfg)
    d1 = np.sign(np.diag(np.asarray(R)))
    d2 = np.sign(np.diag(np.asarray(Rr)))
    np.testing.assert_allclose(np.asarray(R) * d1[:, None],
                               np.asarray(Rr) * d2[:, None], atol=2e-3)


def test_tsqr_cholqr2_direct_fallback_ill_conditioned(rng):
    """cond(A) >> 1/sqrt(eps_f32): the direct path's Cholesky breaks down and
    the lax.cond fallback must deliver the Householder tree's accuracy."""
    n = 16
    U, _ = np.linalg.qr(rng.standard_normal((2048, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = ((U * np.logspace(0, -7.5, n)) @ V.T).astype(np.float32)
    cfg = QRConfig(block_rows=64, dtype=jnp.float32, use_pallas=False,
                   tsqr_leaf="cholqr2")
    Q, R = tsqr(jnp.asarray(A), cfg)
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.orthogonality < 8 * n * chk.eps, chk


def test_tsqr_gradient_matches_qr():
    """tsqr shares the thin-QR custom VJP: grads match qr()'s and finite
    differences."""
    import jax
    from cuda_qr_tpu.models.qr import qr
    rng = np.random.default_rng(9)
    A = jnp.asarray(rng.standard_normal((96, 6)))
    cfg = QRConfig(block_rows=32, use_pallas=False, dtype=jnp.float64)

    def loss_tsqr(a):
        Q, R = tsqr(a, cfg)
        # sign-invariant loss (tsqr's R sign convention differs from qr's)
        return jnp.sum(Q ** 2 * jnp.arange(6)) + jnp.sum(R ** 2)

    def loss_qr(a):
        Q, R = qr(a, cfg)
        return jnp.sum(Q ** 2 * jnp.arange(6)) + jnp.sum(R ** 2)

    g_t = jax.grad(loss_tsqr)(A)
    g_q = jax.grad(loss_qr)(A)
    assert bool(jnp.all(jnp.isfinite(g_t)))
    e = 1e-6
    for (i, j) in [(0, 0), (50, 3), (95, 5)]:
        fd = (loss_tsqr(A.at[i, j].add(e))
              - loss_tsqr(A.at[i, j].add(-e))) / (2 * e)
        assert abs(fd - g_t[i, j]) < 1e-5 * max(1.0, abs(float(fd))), (i, j)
    # sign-invariant losses agree across algorithms too
    assert float(jnp.max(jnp.abs(g_t - g_q))) < 1e-8
