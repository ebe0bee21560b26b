"""Round-4b headline sweep: nb=256 panels at 8192^2 fp32, reps=30.

VERDICT r3 item 1 names nb=256 + the 256-wide fused Mosaic Cholesky as the
remaining untried headline lever (the r3 nb=256 probe ran host-contended and
was inconclusive).  The arithmetic: at nb=256 the panel count halves
(k=32), halving the per-panel fixed cost (one fused-chol chain + one Newton
chain + dispatch glue ~ 100-150 us each -- the bulk of the current 10.6 ms
gap to the 28 ms exact-GEMM bound), while the panel GEMM volume doubles
(~8 m n nb extra FLOPs: ~9% of the factor at nb=128, ~19% at nb=256) and
the trailing updates run at double reflector depth (better MXU shapes).

Candidates keep the r4 exact-width discipline (every stage holds exactly
one lookahead group, the kg==g path):

  - s32_g4_nb128 : the landed r4 headline (control, cached executable)
  - s16_g2_nb256 : k=32, 2 panels/stage -- the direct nb=256 analog
  - s8_g4_nb256  : k=32, 4 panels/stage -- coarser stages, deeper groups

Each candidate prints one JSON line with float64 host residual +
orthogonality (sweep_r3.py discipline) the moment it is measured.
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
    ("s32_g4_nb128", QRConfig(dtype=jnp.float32, scan_stages=32,
                              factor_lookahead=4)),
    ("s16_g2_nb256", QRConfig(dtype=jnp.float32, panel_width=256,
                              scan_stages=16, factor_lookahead=2)),
    ("s8_g4_nb256", QRConfig(dtype=jnp.float32, panel_width=256,
                             scan_stages=8, factor_lookahead=4)),
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
