"""Headline benchmark: blocked QR GFLOP/s at 4096x4096 fp32 on one chip.

Baseline: the best vendor-library number in BASELINE.md -- MAGMA
magma_sgeqrf2_gpu at 4096^2 fp32 = 299 GFLOP/s (timing.txt:23; the
reference's own MMQR reaches 3.77 GFLOP/s there).  vs_baseline > 1 means we
beat MAGMA's throughput; the reference's own kernel is ~80x below that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys

# NOTE: persistent-cache loads on the CPU backend log a spurious XLA
# "prefer-no-gather not supported on the host" ERROR pair to stderr (a
# same-host tuning-flag quirk; the machine-tagged cache dir in
# utils/cache.py guards real cross-host moves).  It cannot be silenced
# from here -- the container's sitecustomize imports jax before this file
# runs -- but stdout carries only the JSON record.


def main():
    from cuda_qr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # 2nd+ process skips the ~4 min remote compile

    import numpy as np
    import jax
    import jax.numpy as jnp

    from cuda_qr_tpu.ops.blocked import extract_r, orgqr, qr_blocked
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    m = n = 8192
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:  # CPU fallback keeps the bench runnable anywhere
        m = n = 512
    # 16 stages at 8192^2 (k=64 panels): every stage holds kg=4 panels, so
    # the lookahead group width g=4 is exact and the masked-update waste is
    # minimal -- measured 75.8 ms vs 80.0 ms at 8 stages (docs/PERF.md).
    cfg = QRConfig(dtype=jnp.float32, scan_stages=16 if on_tpu else 8)
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))

    r = bench(lambda a: qr_blocked(a, cfg), A, reps=3, flops=qr_flops(m, n))

    # Honest end-to-end number: factor + explicit Q formation in one jit --
    # directly comparable to XLA's jnp.linalg.qr (which returns Q and R).
    @jax.jit
    def qr_full(a):
        fac = qr_blocked(a, cfg)
        return orgqr(fac, m, n, cfg), extract_r(fac, n)

    r_qr = bench(qr_full, A, reps=3)

    # Always-on verification (the reference shipped its check commented out,
    # qr.cu:822-850).  Norms are computed on-device at HIGHEST matmul
    # precision and fetched as scalars: pulling full matrices through the
    # host link would dominate the bench wall-clock.  Q/R enter as ARGUMENTS
    # rather than by calling qr_full inside the jit: inlining would compile
    # the whole factor+orgqr pipeline a third time (~minutes each through
    # the remote-compile tunnel, measured), for zero benefit.
    H = jax.lax.Precision.HIGHEST

    @jax.jit
    def residuals(A, Q, R):
        resid = jnp.linalg.norm(
            jnp.einsum("ij,jk->ik", Q, R, precision=H) - A) / jnp.linalg.norm(A)
        orth = jnp.linalg.norm(
            jnp.einsum("ij,ik->jk", Q, Q, precision=H) -
            jnp.eye(n, dtype=A.dtype))
        return resid, orth

    Qh, Rh = qr_full(A)
    resid, orth = (float(x) for x in residuals(A, Qh, Rh))
    del Qh, Rh
    eps = float(jnp.finfo(jnp.float32).eps)

    # Mosaic-compile smoke for the Pallas geqrt kernel: CI runs it only in
    # interpret mode on CPU, so this is the one place a compiled-mode
    # regression would surface (VERDICT r1, weak #5).  Small and cached.
    geqrt_resid = None
    if on_tpu:
        gm, gn = 512, 256
        gcfg = QRConfig(dtype=jnp.float32, panel_method="geqrt",
                        scan_stages=1)
        Ag = jnp.asarray(rng.standard_normal((gm, gn)).astype(np.float32))

        @jax.jit
        def geqrt_resid_fn(Ag):
            fac = qr_blocked(Ag, gcfg)
            Qg = orgqr(fac, gm, gn, gcfg)
            Rg = extract_r(fac, gn)
            return jnp.linalg.norm(
                jnp.einsum("ij,jk->ik", Qg, Rg, precision=H) - Ag
            ) / jnp.linalg.norm(Ag)

        geqrt_resid = float(geqrt_resid_fn(Ag))
        assert geqrt_resid < gn * eps, (
            f"compiled Pallas geqrt regressed: residual {geqrt_resid:.3e}")

    baseline_gflops = 299.0  # MAGMA sgeqrf2 4096^2 fp32 -- the best vendor
    # number in BASELINE.md (no cuSOLVER 8192^2 figure was ever published
    # by the reference; its own MMQR reaches 3.77 GFLOP/s)
    value = r.gflops
    print(json.dumps({
        "metric": f"qr_gflops_{m}x{n}_fp32",
        "value": round(value, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(value / baseline_gflops, 2),
        "steady_ms": round(r.steady_s * 1e3, 1),
        "q_plus_r_ms": round(r_qr.steady_s * 1e3, 1),
        "compile_s": round(r.compile_s, 1),
        "residual": float(f"{resid:.3e}"),
        "orthogonality": float(f"{orth:.3e}"),
        "geqrt_mosaic_residual": (
            float(f"{geqrt_resid:.3e}") if geqrt_resid is not None else None),
        "backend": jax.default_backend(),
    }))
    return 0 if resid < n * eps else 1


if __name__ == "__main__":
    # The axon remote-compile tunnel occasionally drops a response mid-read
    # (a retry compiles from its warm cache and succeeds in seconds) and
    # goes UNAVAILABLE for multi-minute stretches (it recovers on its own)
    # -- so back off between attempts instead of failing fast.
    #
    # Watchdog: when the tunnel is fully down, backend init inside main()
    # BLOCKS forever (jax.devices() nanosleep-retries; no exception ever
    # fires), which would hang the harness.  A hard exit after 90 min
    # turns that into a recordable failure.  Generous bound: a cold 8192^2
    # compile through a degraded tunnel measured ~3600 s once; normally the
    # persistent cache makes this seconds.
    import os
    import threading
    import time
    watchdog = threading.Timer(5400, lambda: os._exit(3))
    watchdog.daemon = True
    watchdog.start()
    for attempt in range(5):
        try:
            sys.exit(main())
        except Exception as e:  # noqa: BLE001 - last attempt re-raises
            if attempt == 4:
                raise
            wait = 30 * (attempt + 1)
            print(f"# bench attempt {attempt + 1} failed ({e!r}); "
                  f"retrying in {wait}s", file=sys.stderr)
            time.sleep(wait)
