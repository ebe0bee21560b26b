"""Round-4 headline sweep: 8192^2 fp32 at reps=30.

The round-3 flip to (s8, g8) rested on one reps=10 same-day run where the
s16 control regressed (ADVICE r3 flagged this).  This sweep re-runs the
head-to-head at reps=30 — the sweep table's own standard — and adds the two
untried exact-width candidates where every stage holds exactly one
lookahead group (kg==g path, ops/blocked.py:270-287):

  - s16_g4  : r3's long-time headline, 2 groups of 4 per stage (control)
  - s8_g8   : r3-tail flip winner at reps=10, 2 groups of 8 per stage
  - s16_g8  : kg==g with g=8 — one 512-deep exact-width update per stage
  - s32_g4  : kg==g with g=4 — finest exact-width slicing

Each candidate prints one JSON line (with float64 host residual +
orthogonality, sweep_r3.py discipline) the moment it is measured.
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
    ("s16_g4", QRConfig(dtype=jnp.float32, scan_stages=16,
                        factor_lookahead=4)),
    ("s8_g8", QRConfig(dtype=jnp.float32, scan_stages=8,
                       factor_lookahead=8)),
    ("s16_g8", QRConfig(dtype=jnp.float32, scan_stages=16,
                        factor_lookahead=8)),
    ("s32_g4", QRConfig(dtype=jnp.float32, scan_stages=32,
                        factor_lookahead=4)),
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
        "wall_s": round(time.monotonic() - t0, 1),
    }))
    sys.stdout.flush()
