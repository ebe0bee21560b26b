"""r5 follow-up: MIXED stage ladder, coarse end -- 8192^2, reps=30.

sweep_r5 found the MIXED ordering REVERSES the HIGHEST one: s16_g4
(26.27 ms raw / 22.54 net) beats s32_g4 (28.26 / 24.74).  With trailing
GEMMs at 2x rate, per-stage fixed costs (stage assembly copies, scan
overhead) weigh twice as much relative to the GEMM work, so the ladder
optimum shifts coarser.  This probes the next rungs down: s8 with one
g=8 group per stage (kg==g exact-width) and s8_g4.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_qr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cuda_qr_tpu.ops.blocked import extract_r, orgqr, qr_blocked  # noqa: E402
from cuda_qr_tpu.utils.config import QRConfig  # noqa: E402
from cuda_qr_tpu.utils.timing import bench, qr_flops  # noqa: E402

m = n = 8192
eps = float(np.finfo(np.float32).eps)
rng = np.random.default_rng(12)
A_np = rng.standard_normal((m, n)).astype(np.float32)
A = jnp.asarray(A_np)
HIGH = jax.lax.Precision.HIGH

CANDIDATES = [
    ("mixed_s8_g8", QRConfig(dtype=jnp.float32, scan_stages=8,
                             factor_lookahead=8, trailing_precision=HIGH)),
    ("mixed_s8_g4", QRConfig(dtype=jnp.float32, scan_stages=8,
                             factor_lookahead=4, trailing_precision=HIGH)),
    ("mixed_s16_g4_rerun", QRConfig(dtype=jnp.float32, scan_stages=16,
                                    factor_lookahead=4,
                                    trailing_precision=HIGH)),
]

for name, cfg in CANDIDATES:
    t0 = time.monotonic()
    r = bench(lambda a, c=cfg: qr_blocked(a, c), A, reps=30,
              flops=qr_flops(m, n))
    fac = qr_blocked(A, cfg)
    Q64 = np.asarray(orgqr(fac, m, n, cfg), np.float64)
    R64 = np.asarray(extract_r(fac, n), np.float64)
    A64 = A_np.astype(np.float64)
    resid = float(np.linalg.norm(Q64 @ R64 - A64) / np.linalg.norm(A64))
    orth = float(np.linalg.norm(Q64.T @ Q64 - np.eye(n)))
    del fac, Q64, R64, A64
    print(json.dumps({
        "config": name,
        "steady_ms": round(r.steady_s * 1e3, 2),
        "steady_net_ms": round(r.steady_net_s * 1e3, 2),
        "gflops": round(r.gflops, 1),
        "rtt_ms": round(r.rtt_s * 1e3, 1),
        "compile_s": round(r.compile_s, 1),
        "reps": 30,
        "residual": float(f"{resid:.3e}"),
        "orthogonality": float(f"{orth:.3e}"),
        "resid_ok": resid < n * eps,
        "orth_ok": orth < n * eps * 4,
        "wall_s": round(time.monotonic() - t0, 1),
    }), flush=True)
