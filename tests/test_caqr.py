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


@pytest.mark.parametrize("m,n", [
    (128, 64),    # 2 panel-rows per shard
    (128, 128),   # square: last panels live on the last shard only
    (256, 96),
    (200, 50),    # needs padding
])
def test_caqr(rng, mesh, m, n):
    A = rng.standard_normal((m, n))
    Q, R = caqr(jnp.asarray(A), mesh, CFG)
    chk = check_qr(A, np.asarray(Q), np.asarray(R))
    assert chk.residual < 4 * max(n, 16) * chk.eps, (m, n, chk)
    assert chk.orthogonality < 8 * max(n, 16) * chk.eps, (m, n, chk)
    assert chk.r_triangular == 0.0


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
