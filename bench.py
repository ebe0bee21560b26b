"""Headline benchmark: blocked QR GFLOP/s at 4096x4096 fp32 on one chip.

Baseline: the best vendor-library number in BASELINE.md -- MAGMA
magma_sgeqrf2_gpu at 4096^2 fp32 = 299 GFLOP/s (timing.txt:23; the
reference's own MMQR reaches 3.77 GFLOP/s there).  vs_baseline > 1 means we
beat MAGMA's throughput; the reference's own kernel is ~80x below that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cuda_qr_tpu.ops.blocked import extract_r, orgqr, qr_blocked
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops
    from cuda_qr_tpu.utils.verify import check_qr

    m = n = 4096
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:  # CPU fallback keeps the bench runnable anywhere
        m = n = 512
    cfg = QRConfig(dtype=jnp.float32, use_pallas=on_tpu)
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

    r = bench(lambda a: qr_blocked(a, cfg), A, reps=3, flops=qr_flops(m, n))

    # always-on verification (the reference shipped its check commented out,
    # qr.cu:822-850)
    fac = qr_blocked(A, cfg)
    Q = orgqr(fac, m, n, cfg)
    R = extract_r(fac, n)
    chk = check_qr(np.asarray(A), np.asarray(Q), np.asarray(R))

    baseline_gflops = 299.0  # MAGMA sgeqrf2 4096^2 fp32, BASELINE.md
    value = r.gflops
    print(json.dumps({
        "metric": f"qr_gflops_{m}x{n}_fp32",
        "value": round(value, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(value / baseline_gflops, 2),
        "steady_ms": round(r.steady_s * 1e3, 1),
        "compile_s": round(r.compile_s, 1),
        "residual": float(f"{chk.residual:.3e}"),
        "orthogonality": float(f"{chk.orthogonality:.3e}"),
        "backend": jax.default_backend(),
    }))
    return 0 if chk.residual < n * chk.eps else 1


if __name__ == "__main__":
    sys.exit(main())
