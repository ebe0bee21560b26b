"""Config sweep for the r3 left-looking driver: stages x lookahead x nb.

Each candidate is a fresh factor executable (now only ~30-60 MB / a few
minutes of remote compile, so sweeping is affordable -- the r2 driver's
~200 MB executables made this same sweep cost hours).  Measures the 8192^2
fp32 factor at reps=30 (tunnel RTT amortized; rtt_ms reported anyway) and
verifies the residual in float64 on the host for every candidate.

Usage: sweep_r3.py [key ...]   (default: all)
Prints one JSON line per candidate; paste winners into docs/PERF.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANDIDATES = {
    # key: (n, panel_width, scan_stages, factor_lookahead)
    "s16_g4_nb128": (8192, 128, 16, 4),    # r2 default
    "s8_g8_nb128": (8192, 128, 8, 8),      # r3-tail headline (kg==g exact)
    "s8_g4_nb256": (8192, 256, 8, 4),      # wide panels, r3-driver re-try
    "s32_g2_nb128": (8192, 128, 32, 2),    # tighter slicing, shallow merge
    "s16_g4_nb128_hi": (8192, 128, 16, 4),  # trailing at HIGH (bf16x3)
    # r4 candidates (VERDICT r3 item 1): one more lookahead doubling --
    # kg == g == 16 keeps the exact-width static trailing slice while
    # quartering the full-width update count vs g=4 and deepening the
    # merged reflector to K=2048.  The merge tree's own O(g^2 nb^2 m)
    # GEMM cost grows linearly in g; s2_g32 probes where that crosses.
    "s4_g16_nb128": (8192, 128, 4, 16),
    "s2_g32_nb128": (8192, 128, 2, 32),
    "s4_g16_nb128_hi": (8192, 128, 4, 16),  # MIXED form of the candidate
}


def main():
    from cuda_qr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from cuda_qr_tpu.ops.blocked import extract_r, orgqr, qr_blocked
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    keys = sys.argv[1:] or list(CANDIDATES)
    rng = np.random.default_rng(12)
    A_np = rng.standard_normal((8192, 8192)).astype(np.float32)
    A = jnp.asarray(A_np)
    for key in keys:
        n, nb, st, g = CANDIDATES[key]
        kw = dict(dtype=jnp.float32, panel_width=nb, scan_stages=st,
                  factor_lookahead=g)
        if key.endswith("_hi"):
            kw["trailing_precision"] = jax.lax.Precision.HIGH
        cfg = QRConfig(**kw)
        r = bench(lambda a: qr_blocked(a, cfg), A, reps=30,
                  flops=qr_flops(n, n))
        fac = qr_blocked(A, cfg)
        Q64 = np.asarray(orgqr(fac, n, n, cfg), np.float64)
        R64 = np.asarray(extract_r(fac, n), np.float64)
        A64 = A_np.astype(np.float64)
        resid = float(np.linalg.norm(Q64 @ R64 - A64) / np.linalg.norm(A64))
        orth = float(np.linalg.norm(Q64.T @ Q64 - np.eye(n)))
        print(json.dumps({
            "key": key, "steady_ms": round(r.steady_s * 1e3, 2),
            "net_ms": round(r.steady_net_s * 1e3, 2),
            "rtt_ms": round(r.rtt_s * 1e3, 1),
            "gflops": round(r.gflops, 1),
            "net_gflops": round(r.net_gflops or 0, 1),
            "compile_s": round(r.compile_s, 1),
            "residual": float(f"{resid:.3e}"),
            "orthogonality": float(f"{orth:.3e}"),
            "backend": jax.default_backend()}), flush=True)
        del fac


if __name__ == "__main__":
    main()
