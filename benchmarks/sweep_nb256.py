"""Panel-width sweep for the 8192^2 fp32 headline: nb=128/s16 vs nb=256/s8.

ROADMAP r3 item 1: decide whether nb=256 becomes the headline bench config.
Measures factor-only and factor+explicit-Q (the honest, XLA-comparable
number) plus host-f64 residual/orthogonality for each config.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from cuda_qr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from cuda_qr_tpu.ops.blocked import extract_r, orgqr, qr_blocked
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    m = n = 8192
    if jax.default_backend() != "tpu":
        print("needs the real TPU", file=sys.stderr)
        return 1
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    H = jax.lax.Precision.HIGHEST

    configs = {
        "nb128_s16": QRConfig(dtype=jnp.float32, scan_stages=16),
        "nb256_s8": QRConfig(dtype=jnp.float32, panel_width=256,
                             scan_stages=8),
        "nb256_s8_agg8": QRConfig(dtype=jnp.float32, panel_width=256,
                                  scan_stages=8, apply_aggregate=8),
        "nb256_s4": QRConfig(dtype=jnp.float32, panel_width=256,
                             scan_stages=4),
        # MIXED preset on both panel widths (ROADMAP r3 item 4): trailing +
        # orgqr GEMMs at HIGH (bf16x3), panels at HIGHEST.
        "nb128_s16_mixed": QRConfig(
            dtype=jnp.float32, scan_stages=16,
            trailing_precision=jax.lax.Precision.HIGH,
            orgqr_precision=jax.lax.Precision.HIGH),
        "nb256_s8_mixed": QRConfig(
            dtype=jnp.float32, panel_width=256, scan_stages=8,
            trailing_precision=jax.lax.Precision.HIGH,
            orgqr_precision=jax.lax.Precision.HIGH),
    }
    if len(sys.argv) > 1:
        configs = {k: v for k, v in configs.items() if k in sys.argv[1:]}

    fused = "--fused" in sys.argv  # also time the single factor+Q program
    for name, cfg in configs.items():
        r = bench(lambda a, c=cfg: qr_blocked(a, c), A, reps=3,
                  flops=qr_flops(m, n))

        # Q+R as the SUM of the factor and orgqr programs: the fused
        # factor+orgqr jit is a second giant executable (~25 min through
        # the degraded tunnel, and cache loads cost the same); the sum
        # needs only the small orgqr program (~30 s compile, measured).
        fac = qr_blocked(A, cfg)

        @jax.jit
        def q_and_r(fac, c=cfg):
            return orgqr(fac, m, n, c), extract_r(fac, n)

        rq = bench(q_and_r, fac, reps=3)

        # Residual norms in a SEPARATE small program over the outputs:
        # inlining would recompile the whole pipeline per config.
        @jax.jit
        def residuals(a, Q, R):
            resid = jnp.linalg.norm(
                jnp.einsum("ij,jk->ik", Q, R, precision=H) - a
            ) / jnp.linalg.norm(a)
            orth = jnp.linalg.norm(
                jnp.einsum("ij,ik->jk", Q, Q, precision=H)
                - jnp.eye(n, dtype=a.dtype))
            return resid, orth

        Qf, Rf = q_and_r(fac)
        resid, orth = (float(x) for x in residuals(A, Qf, Rf))
        del Qf, Rf
        rec = {
            "config": name, "factor_ms": round(r.steady_s * 1e3, 1),
            "gflops": round(r.gflops, 0),
            "q_plus_r_ms": round((r.steady_s + rq.steady_s) * 1e3, 1),
            "q_plus_r_form": "sum",
            "orgqr_ms": round(rq.steady_s * 1e3, 1),
            "residual": float(f"{resid:.3e}"),
            "orthogonality": float(f"{orth:.3e}"),
            "compile_s": round(r.compile_s + rq.compile_s, 1),
        }
        print(json.dumps(rec), flush=True)
        if fused:
            @jax.jit
            def qr_full(a, c=cfg):
                f = qr_blocked(a, c)
                return orgqr(f, m, n, c), extract_r(f, n)

            rf = bench(qr_full, A, reps=3)
            rec["q_plus_r_fused_ms"] = round(rf.steady_s * 1e3, 1)
            rec["fused_compile_s"] = round(rf.compile_s, 1)
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
