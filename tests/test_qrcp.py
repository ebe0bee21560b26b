"""Randomized blocked column-pivoted QR (ops/qrcp.py, models.qr.qr_pivoted).

Checks reconstruction through the permutation, pivot quality on matrices
with decaying spectra (the rank-revealing property LAPACK geqp3 provides
and the reference lacks entirely), truncated low-rank factorization error
against the optimal SVD truncation, and degenerate inputs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cuda_qr_tpu import QRConfig, qr_pivoted
from cuda_qr_tpu.utils.errors import QRShapeError


@pytest.fixture
def rng():
    return np.random.default_rng(12)


def _decaying(rng, m, n, decay):
    """Matrix with singular values decay**i."""
    U, _ = np.linalg.qr(rng.standard_normal((m, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = decay ** np.arange(n)
    return (U * s) @ V.T, s


def _check_pivoted(A, Q, R, piv, tol):
    A, Q, R = (np.asarray(x, np.float64) for x in (A, Q, R))
    piv = np.asarray(piv)
    assert sorted(piv.tolist()) == list(range(A.shape[1]))
    resid = np.linalg.norm(A[:, piv] - Q @ R) / max(np.linalg.norm(A), 1e-30)
    orth = np.abs(Q.T @ Q - np.eye(Q.shape[1])).max()
    assert resid < tol, resid
    assert orth < tol, orth
    assert np.abs(np.tril(R[:, :R.shape[0]], -1)).max() == 0.0


@pytest.mark.parametrize("m,n,nb", [(96, 64, 16), (130, 70, 16), (64, 64, 32)])
def test_qrcp_reconstructs(rng, m, n, nb):
    cfg = QRConfig(dtype=jnp.float32, panel_width=nb, scan_stages=2)
    A = rng.standard_normal((m, n)).astype(np.float32)
    Q, R, piv = qr_pivoted(A, cfg)
    _check_pivoted(A, Q, R, piv, 200 * n * np.finfo(np.float32).eps)


def test_qrcp_pivot_quality(rng):
    """On a geometrically decaying spectrum, |R_kk| must track sigma_k:
    greedy column pivoting keeps the R diagonal within a modest factor of
    the singular values (the rank-revealing property)."""
    n, nb = 96, 16
    cfg = QRConfig(dtype=jnp.float32, panel_width=nb, scan_stages=2)
    A, s = _decaying(rng, 128, n, 0.8)
    Q, R, piv = qr_pivoted(A.astype(np.float32), cfg)
    _check_pivoted(A, Q, R, piv, 200 * n * np.finfo(np.float32).eps)
    d = np.abs(np.diagonal(np.asarray(R)))[: n - 16]
    ratio = d / s[: n - 16]
    assert ratio.max() < 30 and ratio.min() > 1 / 30, (
        ratio.min(), ratio.max())


def test_qrcp_truncated_low_rank(rng):
    """Truncated QRCP error ~ optimal: a rank-r matrix plus noise is
    approximated to within a small factor of sigma_{r+1}."""
    m, n, r = 160, 96, 32
    cfg = QRConfig(dtype=jnp.float32, panel_width=16, scan_stages=2)
    A, s = _decaying(rng, m, n, 0.7)
    A32 = A.astype(np.float32)
    Q, R, piv = qr_pivoted(A32, cfg, rank=r)
    assert Q.shape == (m, r) and R.shape == (r, n)
    err = np.linalg.norm(A[:, np.asarray(piv)] -
                         np.asarray(Q, np.float64) @ np.asarray(R, np.float64))
    opt = np.linalg.norm(s[r:])  # Frobenius-optimal rank-r error
    assert err < 8 * opt + 1e-6, (err, opt)


def test_qrcp_rank_deficient_and_zero_cols(rng):
    """Exactly rank-deficient input: factorization stays finite and exact;
    zero columns sort last."""
    m, n, r = 80, 48, 20
    cfg = QRConfig(dtype=jnp.float32, panel_width=16, scan_stages=2)
    B = rng.standard_normal((m, r)).astype(np.float32)
    C = rng.standard_normal((r, n - 8)).astype(np.float32)
    A = np.concatenate([B @ C, np.zeros((m, 8), np.float32)], axis=1)
    Q, R, piv = qr_pivoted(A, cfg)
    _check_pivoted(A, Q, R, piv, 2000 * n * np.finfo(np.float32).eps)
    assert set(np.asarray(piv)[-8:].tolist()) == set(range(n - 8, n))
    d = np.abs(np.diagonal(np.asarray(R)))
    assert d[r:].max() < 1e-3 * d[0]  # rank revealed on the diagonal


def test_select_kernel_matches_jnp(rng):
    """Pallas selection kernel (interpret mode) picks the identical pivots,
    in the identical order, as the jnp fori_loop reference path."""
    import jax
    from cuda_qr_tpu.ops import qrcp as qmod
    from cuda_qr_tpu.ops.pallas_select import select_pivots_pallas, supported
    l, cand, nb = 64, 128, 32
    assert supported(l, cand, nb, jnp.float32)
    B = jnp.asarray(rng.standard_normal((l, cand)).astype(np.float32))
    norms = jnp.sum(B * B, axis=0)
    ord_k = np.asarray(select_pivots_pallas(B, norms, nb, interpret=True))

    # reference: the module's fori_loop body via _select_pivots with the
    # kernel disabled (config=None)
    ordsel = np.asarray(qmod._select_pivots(
        B, jnp.int32(0), nb, cand, jax.lax.Precision.HIGHEST))
    assert (ord_k == ordsel).all()
    assert sorted(ord_k[ord_k >= 0].tolist()) == list(range(nb))


def test_qrcp_with_select_kernel(rng):
    """End-to-end QRCP through the kernel-eligible path (interpret mode on
    CPU): nb=32 -> cand=128."""
    cfg = QRConfig(dtype=jnp.float32, panel_width=32, scan_stages=2)
    A = rng.standard_normal((160, 128)).astype(np.float32)
    Q, R, piv = qr_pivoted(A, cfg)
    _check_pivoted(A, Q, R, piv, 200 * 128 * np.finfo(np.float32).eps)


def test_qrcp_wide_raises(rng):
    A = rng.standard_normal((16, 32)).astype(np.float32)
    with pytest.raises(QRShapeError):
        qr_pivoted(A, QRConfig(panel_width=16))


def test_qrcp_bad_rank_raises(rng):
    A = rng.standard_normal((32, 16)).astype(np.float32)
    with pytest.raises(QRShapeError):
        qr_pivoted(A, QRConfig(panel_width=16), rank=17)
