"""Round-5 certified precision-mode sweep: 8192^2 fp32 at reps=30.

VERDICT r4 item 1: promote the MIXED mode (bf16x3 trailing GEMMs, panel
math at HIGHEST) to the bench headline, with both acceptance bounds gated
per candidate -- residual < n*eps AND orthogonality < n*eps*4, the same
bounds utils/verify.py enforces for full-precision fp32 runs.  The
certificate for why MIXED meets them is structural (docs/PERF.md
"Precision-mode certificate"): panel factorization (V/T quality, which
bounds Q's orthogonality) always runs at HIGHEST; the trailing update
adds ONE bf16x3-rounded GEMM term per panel application to the backward
error of R only, so the residual grows by ~k * eps_bf16x3 * ||A|| --
measured 4.8e-05 at 8192^2, 20x under the n*eps = 9.8e-04 bound.

Candidates (same session, reps=30, float64 host accuracy per candidate):
  - mixed_s32_g4   : the headline candidate (BENCH_r04 phase-5 config)
  - highest_s32_g4 : the r4 full-precision headline (control)
  - mixed_s16_g4   : the r3 sweep's 22.65 ms net MIXED row, re-confirmed
The winner is re-measured at reps=60 on the SAME executable (no compile)
to quantify the residual RTT/reps share in the raw number.
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
    ("mixed_s32_g4", QRConfig(dtype=jnp.float32, scan_stages=32,
                              factor_lookahead=4,
                              trailing_precision=HIGH)),
    ("highest_s32_g4", QRConfig(dtype=jnp.float32, scan_stages=32,
                                factor_lookahead=4)),
    ("mixed_s16_g4", QRConfig(dtype=jnp.float32, scan_stages=16,
                              factor_lookahead=4,
                              trailing_precision=HIGH)),
]


def measure(name, cfg, reps):
    t0 = time.monotonic()
    r = bench(lambda a, c=cfg: qr_blocked(a, c), A, reps=reps,
              flops=qr_flops(m, n))
    fac = qr_blocked(A, cfg)
    Q64 = np.asarray(orgqr(fac, m, n, cfg), np.float64)
    R64 = np.asarray(extract_r(fac, n), np.float64)
    A64 = A_np.astype(np.float64)
    resid = float(np.linalg.norm(Q64 @ R64 - A64) / np.linalg.norm(A64))
    orth = float(np.linalg.norm(Q64.T @ Q64 - np.eye(n)))
    del fac, Q64, R64, A64
    rec = {
        "config": name,
        "steady_ms": round(r.steady_s * 1e3, 2),
        "steady_net_ms": round(r.steady_net_s * 1e3, 2),
        "gflops": round(r.gflops, 1),
        "rtt_ms": round(r.rtt_s * 1e3, 1),
        "compile_s": round(r.compile_s, 1),
        "reps": reps,
        "residual": float(f"{resid:.3e}"),
        "orthogonality": float(f"{orth:.3e}"),
        "resid_ok": resid < n * eps,
        "orth_ok": orth < n * eps * 4,
        "wall_s": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(rec))
    sys.stdout.flush()
    return rec


for name, cfg in CANDIDATES:
    measure(name, cfg, reps=30)

# RTT-share check on the headline candidate: same executable, reps=60.
measure("mixed_s32_g4_reps60", CANDIDATES[0][1], reps=60)
