"""Round-3 tail sweep: factor_lookahead=8 candidates at 8192^2 fp32.

ROADMAP round-4 item 1: the (s16, la4) headline is 52.2 ms (53% of the
26.5 TF/s fp32-HIGHEST ceiling).  lookahead=8 halves the masked full-width
update count and doubles GEMM depth to K=1024 per sweep, at the cost of
coarser stage slicing (s8: trailing widths shrink every 8 panels instead of
every 4).  Each candidate prints one JSON line as soon as it is measured so
a killed run still yields data.
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
    ("s8_la8", QRConfig(dtype=jnp.float32, scan_stages=8,
                        factor_lookahead=8)),
    ("s16_la4", QRConfig(dtype=jnp.float32, scan_stages=16,
                         factor_lookahead=4)),  # current headline (control)
]

for name, cfg in CANDIDATES:
    t0 = time.monotonic()
    r = bench(lambda a, c=cfg: qr_blocked(a, c), A, reps=10,
              flops=qr_flops(m, n))
    # float64 host residual per candidate (sweep_r3.py discipline): a
    # config that got faster by going numerically wrong must be caught by
    # the sweep itself, not by a later bench phase.
    fac = qr_blocked(A, cfg)
    Q64 = np.asarray(orgqr(fac, m, n, cfg), np.float64)
    R64 = np.asarray(extract_r(fac, n), np.float64)
    A64 = A_np.astype(np.float64)
    resid = float(np.linalg.norm(Q64 @ R64 - A64) / np.linalg.norm(A64))
    orth = float(np.linalg.norm(Q64.T @ Q64 - np.eye(n)))
    del fac, Q64, R64, A64
    print(json.dumps({
        "config": name,
        "steady_ms": round(r.steady_s * 1e3, 1),
        "steady_net_ms": round(r.steady_net_s * 1e3, 1),
        "gflops": round(r.gflops, 1),
        "rtt_ms": round(r.rtt_s * 1e3, 1),
        "compile_s": round(r.compile_s, 1),
        "residual": float(f"{resid:.3e}"),
        "orthogonality": float(f"{orth:.3e}"),
        "wall_s": round(time.monotonic() - t0, 1),
    }))
    sys.stdout.flush()
