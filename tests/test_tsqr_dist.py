"""Distributed TSQR on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.parallel.mesh import row_mesh, row_sharding
from cuda_qr_tpu.parallel.tsqr_dist import tsqr_dist
from cuda_qr_tpu.utils.config import QRConfig
from cuda_qr_tpu.utils.verify import check_qr

CFG = QRConfig(block_rows=64, dtype=jnp.float64, use_pallas=False)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return row_mesh(8)


@pytest.mark.parametrize("strategy", ["allgather", "butterfly", "cholesky"])
@pytest.mark.parametrize("m,n", [(512, 16), (2048, 32)])
def test_tsqr_dist(rng, mesh, strategy, m, n):
    A = rng.standard_normal((m, n))
    Ad = jax.device_put(jnp.asarray(A), row_sharding(mesh))
    Q, R = tsqr_dist(Ad, mesh, CFG, strategy=strategy)
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.residual < 4 * n * chk.eps, (strategy, chk)
    assert chk.orthogonality < 8 * n * chk.eps, (strategy, chk)
    assert chk.r_triangular == 0.0


@pytest.mark.parametrize("strategy", ["allgather", "butterfly"])
def test_tsqr_dist_matches_single_chip_residual(rng, mesh, strategy):
    """Distributed and single-chip TSQR factor the same matrix equally well
    (R may differ in signs; both must be valid factorizations)."""
    from cuda_qr_tpu.models.tsqr import tsqr
    A = rng.standard_normal((1024, 16))
    Q1, R1 = tsqr(jnp.asarray(A), CFG)
    Ad = jax.device_put(jnp.asarray(A), row_sharding(mesh))
    Q2, R2 = tsqr_dist(Ad, mesh, CFG, strategy=strategy)
    d1 = np.sign(np.diag(np.asarray(R1)))
    d2 = np.sign(np.diag(np.asarray(R2)))
    np.testing.assert_allclose(np.asarray(R1) * d1[:, None],
                               np.asarray(R2) * d2[:, None], atol=1e-11)


def test_tsqr_dist_cholesky_fallback_ill_conditioned(rng, mesh):
    """cond(A) >> 1/sqrt(eps_f32) must trip the cholesky strategy's guard
    and fall back to the stacked Householder combine."""
    n = 16
    cfg = QRConfig(block_rows=64, dtype=jnp.float32, use_pallas=False)
    U, _ = np.linalg.qr(rng.standard_normal((1024, n)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = ((U * np.logspace(0, -7.2, n)) @ V.T).astype(np.float32)
    Ad = jax.device_put(jnp.asarray(A), row_sharding(mesh))
    Q, R = tsqr_dist(Ad, mesh, cfg, strategy="cholesky")
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.orthogonality < 8 * n * chk.eps, chk


def test_tsqr_dist_butterfly_rejects_non_pow2(rng):
    """Butterfly partner indexing (s ^ step) is only valid for 2^k shards;
    other counts must raise instead of silently mis-factoring."""
    mesh6 = row_mesh(6)
    A = rng.standard_normal((96, 8))
    Ad = jax.device_put(jnp.asarray(A), row_sharding(mesh6))
    with pytest.raises(ValueError, match="power-of-two"):
        tsqr_dist(Ad, mesh6, CFG, strategy="butterfly")


def test_tsqr_dist_sharding_preserved(rng, mesh):
    """Q comes back sharded over rows; R replicated."""
    A = rng.standard_normal((512, 16))
    Ad = jax.device_put(jnp.asarray(A), row_sharding(mesh))
    Q, R = tsqr_dist(Ad, mesh, CFG)
    assert Q.sharding.spec == row_sharding(mesh).spec


@pytest.mark.parametrize("strategy", ["allgather", "butterfly"])
def test_tsqr_dist_complex(rng, mesh, strategy):
    import jax
    from cuda_qr_tpu.parallel.mesh import row_sharding
    cfg = QRConfig(panel_width=8, use_pallas=False)
    B = (rng.standard_normal((8 * 32, 8))
         + 1j * rng.standard_normal((8 * 32, 8))).astype(np.complex64)
    Bd = jax.device_put(jnp.asarray(B), row_sharding(mesh))
    Q, R = tsqr_dist(Bd, mesh, cfg, strategy=strategy)
    chk = check_qr(B, np.asarray(Q), np.asarray(R))
    assert chk.ok, chk


def test_tsqr_dist_complex_cholesky_rejected(rng, mesh):
    cfg = QRConfig(panel_width=8, use_pallas=False)
    B = jnp.ones((8 * 16, 8), jnp.complex64)
    with pytest.raises(ValueError, match="real-only"):
        tsqr_dist(B, mesh, cfg, strategy="cholesky")
