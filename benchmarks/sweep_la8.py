"""Round-3 tail sweep: factor_lookahead=8 candidates at 8192^2 fp32.

ROADMAP round-4 item 1: the (s16, la4) headline is 52.2 ms (53% of the
26.5 TF/s fp32-HIGHEST ceiling).  lookahead=8 halves the masked full-width
update count and doubles GEMM depth to K=1024 per sweep, at the cost of
coarser stage slicing (s8: trailing widths shrink every 8 panels instead of
every 4).  Each candidate prints one JSON line as soon as it is measured so
a killed run still yields data.
"""

import json
import sys
import time

from cuda_qr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cuda_qr_tpu.ops.blocked import qr_blocked  # noqa: E402
from cuda_qr_tpu.utils.config import QRConfig  # noqa: E402
from cuda_qr_tpu.utils.timing import bench, qr_flops  # noqa: E402

m = n = 8192
rng = np.random.default_rng(12)
A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

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
    print(json.dumps({
        "config": name,
        "steady_ms": round(r.steady_s * 1e3, 1),
        "steady_net_ms": round(r.steady_net_s * 1e3, 1),
        "gflops": round(r.gflops, 1),
        "rtt_ms": round(r.rtt_s * 1e3, 1),
        "compile_s": round(r.compile_s, 1),
        "wall_s": round(time.monotonic() - t0, 1),
    }))
    sys.stdout.flush()
