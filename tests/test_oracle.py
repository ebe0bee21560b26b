"""Native C oracle: validity envelope, golden parity, and TPU-path cross-check.

The golden tau fixture was obtained by *running* the reference's compiled
qr.c host binary (fixed 6x4 problem, srand(12), qr.c:461-523) and recording
its printed output -- the same discipline SURVEY.md S4 used to establish the
reference's validity envelope.
"""

import ctypes

import numpy as np
import pytest

from cuda_qr_tpu.oracle import binding

# Printed by the reference host oracle (qr.c:302) for its fixed 6x4 problem.
REFERENCE_TAUS_6x4 = [1.105875, 1.437911, 1.556454, 1.382508,
                      1.629178, 1.088601, 2.000000, 2.000000]


def reference_input_6x4():
    """The exact matrix the reference main builds: srand(12), col-major
    rand()/RAND_MAX fill (qr.c:468-473), via libc so the stream matches."""
    libc = ctypes.CDLL("libc.so.6")
    libc.srand(12)
    vals = [libc.rand() / 2147483647 for _ in range(24)]
    return np.array(vals).reshape((4, 6)).T


def test_golden_parity_with_reference():
    A = reference_input_6x4()
    packed, tau = binding.mmqr(A.copy(), 4, 2)
    np.testing.assert_allclose(tau, REFERENCE_TAUS_6x4, atol=5e-7)
    resid, orth = binding.qr_check(A, *binding.explicit_qr(packed, tau, 4, 2))
    assert resid < 1e-14 and orth < 1e-14


@pytest.mark.parametrize("m,n,pr,pc", [
    (6, 4, 4, 2), (12, 8, 8, 4), (64, 16, 8, 4), (64, 32, 16, 8),
    (244, 64, 64, 4), (160, 128, 64, 16),
])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_oracle_envelope(rng, m, n, pr, pc, dtype):
    """SURVEY.md S4 validity envelope, both dtypes."""
    A = rng.standard_normal((m, n)).astype(dtype)
    resid, orth = binding.factor_and_check(A, pr, pc)
    tol = 1e-13 if dtype == np.float64 else 1e-5
    assert resid < tol * n, (m, n, resid)
    assert orth < tol * n * 10, (m, n, orth)


@pytest.mark.parametrize("m,n,pr,pc", [
    (30, 8, 8, 4),    # misaligned m
    (64, 13, 8, 4),   # misaligned n
    (6, 4, 8, 4),     # m < pr
    (16, 20, 8, 4),   # n > m
])
def test_oracle_rejects_misaligned(rng, m, n, pr, pc):
    """The reference silently corrupts on these (SURVEY.md S4); the oracle
    must reject them with a clean error instead."""
    A = rng.standard_normal((m, n))
    with pytest.raises(ValueError):
        binding.mmqr(A, pr, pc)


def test_oracle_zero_column_guard():
    A = np.zeros((8, 4))
    A[:, 2] = np.arange(8, dtype=np.float64)
    packed, tau = binding.mmqr(A.copy(), 4, 2)
    assert np.all(np.isfinite(packed)) and np.all(np.isfinite(tau))


def _signnorm(R):
    """Normalize an upper-triangular R to positive diagonal (QR is unique up
    to a diagonal sign matrix, so paths with different panel schedules can
    only be compared after normalization)."""
    d = np.sign(np.diag(R))
    d = np.where(d == 0, 1, d)
    return R * d[:, None]


@pytest.mark.parametrize("m,n,pr,pc", [(64, 32, 16, 8), (96, 32, 32, 16)])
def test_oracle_vs_tpu_path(rng, m, n, pr, pc):
    """The sliding-panel oracle and the full-height blocked TPU path must
    produce the same R up to the diagonal sign matrix."""
    import jax.numpy as jnp
    from cuda_qr_tpu.ops.blocked import extract_r, qr_blocked
    from cuda_qr_tpu.utils.config import QRConfig

    A = rng.standard_normal((m, n))
    packed, tau = binding.mmqr(A.copy(), pr, pc)
    R_oracle = np.triu(packed[:n, :])
    cfg = QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False)
    R_tpu = np.asarray(extract_r(qr_blocked(jnp.asarray(A), cfg), n))
    np.testing.assert_allclose(_signnorm(R_oracle), _signnorm(R_tpu),
                               atol=1e-11)


def test_oracle_main_binary():
    """Standalone harness builds, runs, verifies, and emits JSON."""
    import json
    import os
    import subprocess
    d = os.path.dirname(binding.__file__)
    subprocess.run(["make", "-C", d, "qr_oracle_main"], check=True,
                   capture_output=True)
    out = subprocess.run([os.path.join(d, "qr_oracle_main"), "64", "32", "16",
                          "8"], check=True, capture_output=True, text=True)
    rec = json.loads(out.stdout)
    assert rec["residual"] < 1e-13 and rec["m"] == 64


def test_oracle_baseline_config1():
    """BASELINE.json config 1: 1024^2 fp64 on the C oracle (sliding panel),
    residual + orthogonality at fp64 LAPACK tolerance."""
    rng = np.random.default_rng(12)
    A = rng.standard_normal((1024, 1024))
    resid, orth = binding.factor_and_check(A, 64, 16)
    assert resid < 1024 * 2.3e-16 * 20, resid
    assert orth < 1024 * 2.3e-16 * 200, orth
