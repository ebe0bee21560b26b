"""Random-shape fuzz sweep across the public API (CPU, fast configs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.models.qr import qr
from cuda_qr_tpu.utils.config import QRConfig
from cuda_qr_tpu.utils.verify import check_qr

CFG = QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False)
CFG_FAST = QRConfig(panel_width=16, dtype=jnp.float64)  # cholqr2_hr


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_shapes_and_values(seed):
    rng = np.random.default_rng(100 + seed)
    m = int(rng.integers(1, 200))
    n = int(rng.integers(1, 200))
    kind = seed % 3
    A = rng.standard_normal((m, n))
    if kind == 1:
        A[:, rng.integers(0, n)] = 0.0            # dead column
    elif kind == 2:
        A *= np.logspace(0, 4, n)[None, :]        # graded columns
    cfg = CFG if seed % 2 else CFG_FAST
    Q, R = qr(jnp.asarray(A), cfg)
    k = min(m, n)
    assert Q.shape == (m, k) and R.shape == (k, n)
    chk = check_qr(A, np.asarray(Q) @ np.eye(k), np.asarray(R)) \
        if m >= n else None
    resid = np.linalg.norm(np.asarray(Q, np.float64) @ np.asarray(R, np.float64) - A)
    scale = max(np.linalg.norm(A), 1.0)
    assert resid / scale < 4 * max(m, n, 16) * np.finfo(np.float64).eps, \
        (seed, m, n, kind, resid / scale)
    orth = np.linalg.norm(np.asarray(Q, np.float64).T @ np.asarray(Q, np.float64) - np.eye(k))
    assert orth < 8 * max(m, n, 16) * np.finfo(np.float64).eps, (seed, m, n, orth)
