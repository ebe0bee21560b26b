"""Round-4c headline sweep: taper-aware stage schedules at 8192^2, reps=30.

The r4 anatomy (docs/PERF.md "Where the time goes") shows the remaining gap
to the GEMM bound lives in the trailing-update taper: late stages run
skinny GEMMs far below MXU peak while panels cost only 61 us each.  The new
QRConfig.stage_schedule keeps the early exact-width discipline (2 panels
per stage) but batches the tapered tail into deep lookahead groups --
g*nb-deep reflectors keep the MXU fed when the width is small.  Every
candidate stage still satisfies kg == g (static exact-width updates).

  - s32_g4        : the landed headline (control, cached)
  - tail8x2_g8    : (2,)*24 + (8,)*2  -- last 16 panels as two g=8 groups
  - prog248_g8    : (2,)*16 + (4,)*4 + (8,)*2 -- progressive 2/4/8 deepening

One JSON line per candidate with float64 host residual + orthogonality.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_qr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cuda_qr_tpu.ops.blocked import extract_r, orgqr, qr_blocked  # noqa: E402
from cuda_qr_tpu.utils.config import QRConfig  # noqa: E402
from cuda_qr_tpu.utils.timing import bench, qr_flops  # noqa: E402

m = n = 8192
rng = np.random.default_rng(12)
A_np = rng.standard_normal((m, n)).astype(np.float32)
A = jnp.asarray(A_np)

CANDIDATES = [
    ("s32_g4", QRConfig(dtype=jnp.float32, scan_stages=32,
                        factor_lookahead=4)),
    ("tail8x2_g8", QRConfig(dtype=jnp.float32,
                            stage_schedule=(2,) * 24 + (8,) * 2,
                            factor_lookahead=8)),
    ("prog248_g8", QRConfig(dtype=jnp.float32,
                            stage_schedule=(2,) * 16 + (4,) * 4 + (8,) * 2,
                            factor_lookahead=8)),
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
    del Q64, R64, fac
    print(json.dumps({
        "key": name, "raw_ms": round(r.steady_s * 1e3, 2),
        "net_ms": round(r.steady_net_s * 1e3, 2),
        "rtt_ms": round(r.rtt_s * 1e3, 1),
        "raw_tflops": round(r.gflops / 1e3, 1),
        "net_tflops": round((r.net_gflops or 0.0) / 1e3, 1),
        "compile_s": round(r.compile_s, 1),
        "residual": float(f"{resid:.3e}"),
        "orthogonality": float(f"{orth:.3e}"),
        "elapsed_s": round(time.monotonic() - t0, 1)}), flush=True)
