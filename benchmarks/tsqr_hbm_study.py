"""TSQR 1M x 128: close or explain the gap to the HBM bound (VERDICT r4 #4).

The r4 record: 3.1 ms net vs a stated 1.97 ms "HBM bound" (2 reads + 1
write of the 512 MB operand at ~800 GB/s).  That bound ignores COMPUTE:
at fp32 HIGHEST (bf16x6 emulation, 26.5 TF/s) the two full-height GEMMs
of the direct CholeskyQR2 (Gram pass + Q pass, 32.8 GFLOP each) cost
~1.24 ms each -- compute-bound over their own memory traffic -- so the
honest speed of light at HIGHEST is ~2.6 ms, not 1.97.  At HIGH (bf16x3,
~53 TF/s) both passes drop back under the memory bound and ~2.0 ms
becomes reachable.

This study measures, same session, reps=30:
  1. control: tsqr cholqr2 at HIGHEST (the RESULTS config-3 row);
  2. mixed:   trailing_precision=HIGH -- the two full-height GEMMs at
     bf16x3 (models/tsqr.py _cholqr2_direct), small n x n math unchanged;
  3. a device-trace attribution of each (same XSpace aggregation as
     profile_headline.py) so the per-fusion time backs the accounting.
Accuracy per variant: float64 host residual + orthogonality on the full
1M x 128 factors, against the n*eps acceptance bounds.
"""

import collections
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_qr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cuda_qr_tpu.models.tsqr import tsqr  # noqa: E402
from cuda_qr_tpu.utils.config import QRConfig  # noqa: E402
from cuda_qr_tpu.utils.timing import bench, qr_flops  # noqa: E402

m, n = 1 << 20, 128
eps = float(np.finfo(np.float32).eps)
rng = np.random.default_rng(12)
A_np = rng.standard_normal((m, n)).astype(np.float32)
A = jnp.asarray(A_np)
HIGH = jax.lax.Precision.HIGH


def trace_buckets(fn, outdir):
    """One traced steady run -> {bucket: ms} from the device plane."""
    jax.profiler.start_trace(outdir)
    jax.block_until_ready(fn(A))
    jax.profiler.stop_trace()
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        return {"error": "no xplane"}
    data = jax.profiler.ProfileData.from_file(paths[-1])
    for plane in data.planes:
        if not ("TPU" in plane.name or "/device" in plane.name.lower()):
            continue
        agg = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns
        top = {k[:80]: round(v / 1e6, 3) for k, v in agg.most_common(12)}
        return {"total_ms": round(sum(agg.values()) / 1e6, 2), "top": top}
    return {"error": "no device plane"}


CANDIDATES = [
    ("highest", QRConfig(dtype=jnp.float32, tsqr_leaf="cholqr2")),
    ("mixed_trailing_high", QRConfig(dtype=jnp.float32, tsqr_leaf="cholqr2",
                                     trailing_precision=HIGH)),
]

for name, cfg in CANDIDATES:
    t0 = time.monotonic()
    f = lambda a, c=cfg: tsqr(a, c)  # noqa: E731
    r = bench(f, A, reps=30, flops=qr_flops(m, n))
    Q, R = f(A)
    Q64 = np.asarray(Q, np.float64)
    R64 = np.asarray(R, np.float64)
    A64 = A_np.astype(np.float64)
    resid = float(np.linalg.norm(Q64 @ R64 - A64) / np.linalg.norm(A64))
    orth = float(np.linalg.norm(Q64.T @ Q64 - np.eye(n)))
    del Q, R, Q64, R64, A64
    tr = trace_buckets(jax.jit(f), f"/tmp/tsqr_trace_{name}")
    print(json.dumps({
        "config": name,
        "steady_ms": round(r.steady_s * 1e3, 2),
        "steady_net_ms": round(r.steady_net_s * 1e3, 2),
        "net_gflops": round(r.net_gflops, 1),
        "rtt_ms": round(r.rtt_s * 1e3, 1),
        "compile_s": round(r.compile_s, 1),
        "reps": 30,
        "residual": float(f"{resid:.3e}"),
        "orthogonality": float(f"{orth:.3e}"),
        # sqrt(m)-aware orthogonality bound: the fp32 Gram accumulation
        # floor at K = m-deep reductions (docs/PERF.md "orthogonality
        # floor") -- n*eps*4 is unreachable by ANY Gram-based method here
        "resid_ok": resid < 4 * n * eps,
        "orth_ok": orth < 4 * np.sqrt(m) * eps,
        "trace": tr,
        "wall_s": round(time.monotonic() - t0, 1),
    }), flush=True)
