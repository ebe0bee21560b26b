"""Device-trace attribution of the 8192^2 headline factor.

Captures a jax.profiler trace of one steady-state qr_blocked run at the
headline config and aggregates per-op device durations from the XSpace via
jax.profiler.ProfileData -- no TensorBoard, no TensorFlow.  This is the
ground-truth follow-up to benchmarks/panel_anatomy.py's in-graph loop
estimates: the anatomy bounds components from outside; the trace shows the
actual schedule (GEMM shapes, fusions, copies) XLA emitted, per stage.

Output: one JSON line per device plane with the top-N ops by total self
time, plus a bucketed rollup (convolution/dot vs fusion vs copy vs other).

Usage: python benchmarks/profile_headline.py [n] [outdir]
(If the axon tunnel exposes no device plane, says so honestly -- host-side
planes alone cannot attribute device time.)
"""

import collections
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_qr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cuda_qr_tpu.ops.blocked import qr_blocked  # noqa: E402
from cuda_qr_tpu.utils.config import QRConfig  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/qr_trace"
    cfg = QRConfig(dtype=jnp.float32, scan_stages=32 if n >= 4096 else 4,
                   factor_lookahead=4)
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    f = jax.jit(lambda a: qr_blocked(a, cfg))
    jax.block_until_ready(f(A))  # compile + warm
    jax.block_until_ready(f(A))

    jax.profiler.start_trace(outdir)
    jax.block_until_ready(f(A))
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(
        outdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print(json.dumps({"error": "no xplane.pb produced", "dir": outdir}))
        return
    data = jax.profiler.ProfileData.from_file(paths[-1])
    found_device = False
    for plane in data.planes:
        name = plane.name
        is_dev = ("TPU" in name or "/device" in name.lower()
                  or "axon" in name.lower())
        if not is_dev:
            continue
        found_device = True
        agg = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                agg[ev.name] += dur
                cnt[ev.name] += 1
        total_ms = sum(agg.values()) / 1e6
        buckets = collections.Counter()
        for k, v in agg.items():
            lk = k.lower()
            if "fusion" in lk:
                buckets["fusion"] += v
            elif "dot" in lk or "convolution" in lk or "gemm" in lk:
                buckets["dot"] += v
            elif "copy" in lk or "transpose" in lk or "concatenate" in lk:
                buckets["copy"] += v
            elif "custom" in lk or "mosaic" in lk:
                buckets["custom/mosaic"] += v
            else:
                buckets["other"] += v
        top = agg.most_common(30)
        print(json.dumps({
            "plane": name,
            "total_ms": round(total_ms, 2),
            "buckets_ms": {k: round(v / 1e6, 2)
                           for k, v in buckets.most_common()},
            "top_ops": [{"name": k[:120], "ms": round(v / 1e6, 3),
                         "count": cnt[k]} for k, v in top],
        }), flush=True)
    if not found_device:
        print(json.dumps({
            "error": "no device plane in trace (axon tunnel may not "
                     "export TPU-side events)",
            "planes": [p.name for p in data.planes]}))


if __name__ == "__main__":
    main()
