"""Characterize the jnp.linalg.eigh dependency (VERDICT r2 item 8).

`svd`/`eigh_rand` (models/polar.py, models/rsvd.py) delegate the Hermitian
eigendecomposition to XLA's `jnp.linalg.eigh`.  This study measures that
lowering's accuracy and throughput on the real TPU at 1024-8192, and -- now
that models/eigh.py exists -- the in-house QDWH-eig divide-and-conquer on
the same inputs, so the svd/eigh_rand routing decision is recorded from
data (docs/PERF.md "eigh dependency" section).

Prints one JSON line per (impl, size): steady ms, eigenvalue error vs numpy
float64 (relative, against |w|_max), residual ||A V - V diag(w)||_F/||A||_F
and orthogonality ||V^T V - I||_F measured in float64 on the host.

Usage: eigh_study.py [sizes...] [--own] [--own-only] [--own-mixed]
(--own adds the in-house rows; --own-only skips the jnp rows, for
re-measuring the in-house path against already-recorded XLA rows;
--own-mixed adds an in-house row whose internal QR trailing updates run
at bf16x3 -- the certified-MIXED trade applied inside QDWH-eig, accuracy
reported so the trade is auditable).
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

    from cuda_qr_tpu.utils.timing import bench

    on_tpu = jax.default_backend() == "tpu"
    own_only = "--own-only" in sys.argv
    own_mixed = "--own-mixed" in sys.argv
    own = "--own" in sys.argv or own_only
    argv = [a for a in sys.argv[1:]
            if a not in ("--own", "--own-only", "--own-mixed")]
    sizes = [int(a) for a in argv] if argv else (
        [1024, 2048, 4096, 8192] if on_tpu else [256])
    rng = np.random.default_rng(7)

    for n in sizes:
        # Symmetric test matrix with a known, moderately decaying spectrum:
        # G + G^T has GOE statistics (eigenvalues in [-2 sqrt(2n), 2 sqrt(2n)],
        # no tiny relative gaps), a fair case for tridiagonalization-based eigh.
        G = rng.standard_normal((n, n)).astype(np.float32)
        S = (G + G.T) / np.sqrt(2 * n)
        Sd = jnp.asarray(S)

        w64 = np.linalg.eigvalsh(S.astype(np.float64))
        S64 = S.astype(np.float64)

        impls = {} if (own_only or own_mixed) else {
            "jnp.linalg.eigh": jax.jit(jnp.linalg.eigh)}
        if own:
            from cuda_qr_tpu.models.eigh import eigh as own_eigh
            impls["cuda_qr_tpu.eigh"] = lambda a: own_eigh(a)
        if own_mixed:
            from cuda_qr_tpu.models.eigh import eigh as own_eigh
            from cuda_qr_tpu.utils.config import DEFAULT_CONFIG
            mixed = DEFAULT_CONFIG.replace(
                trailing_precision=jax.lax.Precision.HIGH)
            impls["cuda_qr_tpu.eigh[mixed]"] = (
                lambda a: own_eigh(a, mixed))

        for name, fn in impls.items():
            r = bench(fn, Sd, reps=10 if on_tpu else 3)
            w, V = fn(Sd)
            wd = np.asarray(w, dtype=np.float64)
            Vd = np.asarray(V, dtype=np.float64)
            resid = (np.linalg.norm(S64 @ Vd - Vd * wd[None, :])
                     / np.linalg.norm(S64))
            orth = np.linalg.norm(Vd.T @ Vd - np.eye(n))
            werr = np.max(np.abs(np.sort(wd) - w64)) / np.max(np.abs(w64))
            print(json.dumps({
                "op": name, "n": n,
                "backend": jax.default_backend(),
                "steady_ms": round(r.steady_s * 1e3, 1),
                "steady_net_ms": round(r.steady_net_s * 1e3, 1),
                "rtt_ms": round(r.rtt_s * 1e3, 1),
                "compile_s": round(r.compile_s, 1),
                "eigval_rel_err": float(f"{werr:.3e}"),
                "residual": float(f"{resid:.3e}"),
                "orthogonality": float(f"{orth:.3e}"),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
