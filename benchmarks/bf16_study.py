"""bf16 end-to-end QR study (ROADMAP r4 item 3).

Question: what does a TRUE bf16 factorization (dtype=bfloat16 through the
whole blocked driver -- storage, panels, trailing updates -- not just
bf16x3 trailing GEMMs like MIXED) buy, and can one fp32 refinement pass
recover fp32-grade factors?

The refinement is CholeskyQR-style on the explicit Q plus one residual
correction of R, all in fp32 at HIGHEST:

    S   = chol(Q^T Q)^T            # Q's departure from orthogonality
    Q'  = Q S^{-1}                 # now orthonormal to fp32
    R'  = triu(Q'^T A)             # residual-optimal R for this Q'

Expectation (recorded either way): Q' orthogonality lands at fp32 levels
(CholeskyQR squares the orthogonality error: (n*eps_bf16)^2 ~ eps_f32
territory while cond(Q) ~ 1 + n*eps_bf16 stays far under the CholeskyQR
breakdown bound), but the RESIDUAL can only reach the subspace quality of
the bf16 Q -- ||(I - Q'Q'^T) A|| is set by the bf16 factorization's
backward error (~eps_bf16 * ||A||) and no cheap correction moves it.  So
bf16-end-to-end + refinement is an ORTHONORMAL-BASIS factory (orth/rangefinder
use cases), not a linear-solver path: lstsq/solve must stay on fp32 or
MIXED.  This script measures both numbers so the claim is data, not theory.

Usage:  python benchmarks/bf16_study.py [m] [--reps R]
Prints one JSON row per variant; CPU fallback runs a small shape so the
logic is testable anywhere.

Reference analog: the `Scalar` compile-time dtype axis (qr.cu:17) -- the
reference could build fp32 or fp64 binaries but had no reduced-precision
story at all.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    reps = 10
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i:i + 2]

    from cuda_qr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from cuda_qr_tpu.ops.blocked import extract_r, orgqr, qr_blocked
    from cuda_qr_tpu.utils.config import MIXED_CONFIG, QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    on_tpu = jax.default_backend() == "tpu"
    m = int(argv[0]) if argv else (4096 if on_tpu else 256)
    n = m
    H = jax.lax.Precision.HIGHEST

    rng = np.random.default_rng(12)
    A32 = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

    def q_and_r(A, cfg):
        fac = qr_blocked(A, cfg)
        return orgqr(fac, m, n, cfg), extract_r(fac, n)

    @jax.jit
    def refine32(Q, A):
        """One fp32 CholeskyQR orthogonality pass + residual-optimal R."""
        Q = Q.astype(jnp.float32)
        G = jnp.einsum("ji,jk->ik", Q, Q, precision=H)
        S = jnp.linalg.cholesky(G)                   # G = S S^T
        Qr = jax.scipy.linalg.solve_triangular(
            S, Q.T, lower=True).T                    # Q S^{-T}
        Rr = jnp.triu(jnp.einsum("ji,jk->ik", Qr, A, precision=H))
        return Qr, Rr

    @jax.jit
    def quality(A, Q, R):
        resid = jnp.linalg.norm(
            jnp.einsum("ij,jk->ik", Q.astype(jnp.float32),
                       R.astype(jnp.float32), precision=H) - A
        ) / jnp.linalg.norm(A)
        orth = jnp.linalg.norm(
            jnp.einsum("ij,ik->jk", Q.astype(jnp.float32),
                       Q.astype(jnp.float32), precision=H)
            - jnp.eye(n, dtype=jnp.float32))
        return resid, orth

    def row(tag, cfg, A, refine=False):
        r = bench(lambda a: qr_blocked(a, cfg), A, reps=reps,
                  flops=qr_flops(m, n))
        Q, R = q_and_r(A, cfg)
        rec = {"variant": tag, "m": m,
               "factor_ms": round(r.steady_net_s * 1e3, 2),
               "gflops": round(r.gflops, 1),
               "compile_s": round(r.compile_s, 1)}
        resid, orth = (float(x) for x in quality(A32, Q, R))
        rec |= {"residual": float(f"{resid:.3e}"),
                "orthogonality": float(f"{orth:.3e}")}
        if refine:
            rr = bench(lambda q: refine32(q, A32)[0], Q, reps=reps)
            Qr, Rr = refine32(Q, A32)
            resid, orth = (float(x) for x in quality(A32, Qr, Rr))
            rec |= {"refine_ms": round(rr.steady_net_s * 1e3, 2),
                    "refined_residual": float(f"{resid:.3e}"),
                    "refined_orthogonality": float(f"{orth:.3e}")}
        print(json.dumps(rec))
        sys.stdout.flush()
        return rec

    stages = 16 if (on_tpu and m >= 8192) else (8 if m >= 2048 else 2)
    f32 = QRConfig(dtype=jnp.float32, scan_stages=stages)
    row("fp32_highest", f32, A32)
    row("mixed_bf16x3_trailing",
        MIXED_CONFIG.replace(scan_stages=stages), A32)
    # bf16 end-to-end: bf16 storage + panels + updates.  The Pallas chol
    # kernel and geqrt are fp32-only; the driver's jnp paths handle bf16
    # (fp32 carries, cast-back at panel boundaries -- ops/blocked.py:203).
    bf16 = QRConfig(dtype=jnp.bfloat16, scan_stages=stages,
                    use_chol_kernel=False)
    A16 = A32.astype(jnp.bfloat16)
    rec = row("bf16_end_to_end", bf16, A16, refine=True)

    n_eps32 = n * float(jnp.finfo(jnp.float32).eps)
    print(json.dumps({
        "verdict": "refined bf16 Q is an fp32-grade orthonormal basis"
        if rec.get("refined_orthogonality", 1.0) < n_eps32
        else "refinement did NOT reach fp32 orthogonality",
        "residual_note": "residual stays at bf16 backward-error level "
                         "(basis factory, not a solver path)",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
