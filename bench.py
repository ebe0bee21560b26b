"""Headline benchmark: certified-MIXED blocked QR at 8192x8192 fp32, one chip.

Headline mode (r5): MIXED -- panel factorization at HIGHEST (bf16x6 fp32
emulation; V/T quality bounds Q's orthogonality), trailing-update GEMMs at
HIGH (bf16x3, ~2x MXU rate).  Certificate (docs/PERF.md "Precision-mode
certificate"): the trailing update adds ONE bf16x3-rounded GEMM term per
panel application to R's backward error only, so the residual stays well
under the n*eps acceptance bound while orthogonality is unchanged from
HIGHEST.  BOTH bounds are measured and gated here every run: residual <
n*eps AND orthogonality < n*eps*4 -- the same bounds utils/verify.py
enforces for full-precision fp32.  The full-precision HIGHEST factor is
kept as a gated control phase.

reps=30 on TPU (r5): the timed loop queues reps calls and forces one
scalar, so each rep carries ~RTT/reps of tunnel latency -- at reps=10 and
RTT ~100 ms that inflated the captured raw number by ~10 ms/call
(docs/PERF.md "dispatch-floor illusion"); reps=30 matches the sweep
discipline every README number uses.  The headline MIXED phase runs at
reps=60: the r5 sweep measured a further ~1.6 ms of per-dispatch overhead
amortized between reps=30 and reps=60 on the same executable, and sixty
26-ms calls cost under 2 s -- compile time, not measurement time, is the
budget constraint.

Baseline: the best vendor-library number in BASELINE.md -- MAGMA
magma_sgeqrf2_gpu at 4096^2 fp32 = 299 GFLOP/s (timing.txt:23; the
reference's own MMQR reaches 3.77 GFLOP/s there).  vs_baseline > 1 means we
beat MAGMA's throughput; the reference's own kernel is ~80x below that.

Timeout-proofing (round 2 ran out of clock and recorded NOTHING): the
record is emitted incrementally -- one complete JSON line right after the
first measurement, then a richer line after each later phase.  Whoever
parses the LAST complete JSON line on stdout always gets the best available
record, even if the process is killed mid-phase.  A soft deadline skips the
remaining phases when the tunnel is degraded, so the process exits cleanly
with a partial record instead of being killed with a full one unprinted.
"""

import json
import os
import sys
import time

T0 = time.monotonic()
# Leave phases unstarted once this much wall-clock is spent: better to exit
# rc=0 with a partial record than be killed mid-compile with a rich one
# queued.  Round 1's full bench fit in ~400 s through a healthy tunnel.
SOFT_DEADLINE_S = float(os.environ.get("BENCH_SOFT_DEADLINE_S", "1500"))

RECORD: dict = {}


def emit() -> None:
    """Print the full record as one JSON line and flush immediately."""
    print(json.dumps(RECORD))
    sys.stdout.flush()


def time_left() -> float:
    return SOFT_DEADLINE_S - (time.monotonic() - T0)


# NOTE: persistent-cache loads on the CPU backend log a spurious XLA
# "prefer-no-gather not supported on the host" ERROR pair to stderr (a
# same-host tuning-flag quirk; the machine-tagged cache dir in
# utils/cache.py guards real cross-host moves).  It cannot be silenced
# from here -- the container's sitecustomize imports jax before this file
# runs -- but stdout carries only the JSON record.


def main():
    from cuda_qr_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # 2nd+ process skips the remote compile

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
    # 32 stages x lookahead 4 at 8192^2 (k=64 panels): each stage holds 2
    # panels, so every trailing update runs at its EXACT stage width (the
    # kg==g path).  reps=30 ladder: s32_g4 38.6 ms > s16_g4 39.6 > s16_g8
    # 39.4 > s8_g8 41.9 (benchmarks/sweep_r4.py, docs/PERF.md r4).
    cfg = QRConfig(dtype=jnp.float32, scan_stages=32 if on_tpu else 8,
                   factor_lookahead=4)
    # The certified throughput mode: trailing GEMMs at HIGH.  The MIXED
    # stage-ladder optimum is COARSER than HIGHEST's s32 (sweep_r5,
    # 2026-08-21, reps=30: mixed s16_g4 26.27 ms raw / 22.54 net beats
    # mixed s32_g4 28.26 / 24.74): with trailing at 2x rate, per-stage
    # fixed costs weigh double, so the ladder optimum shifts down.
    mcfg = QRConfig(dtype=jnp.float32, scan_stages=16 if on_tpu else 8,
                    factor_lookahead=4,
                    trailing_precision=jax.lax.Precision.HIGH)
    reps = 30 if on_tpu else 3
    hreps = 60 if on_tpu else 3  # headline phase only (module docstring)
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    eps = float(jnp.finfo(jnp.float32).eps)

    baseline_gflops = 299.0  # MAGMA sgeqrf2 4096^2 fp32 -- the best vendor
    # number in BASELINE.md (no cuSOLVER 8192^2 figure was ever published
    # by the reference; its own MMQR reaches 3.77 GFLOP/s)

    H = jax.lax.Precision.HIGHEST

    @jax.jit
    def q_and_r(fac):
        # orgqr runs at HIGHEST under BOTH configs (MIXED keeps Q-formation
        # at full precision by design, utils/config.py), so one compiled
        # program serves the mixed and control factors alike.
        return orgqr(fac, m, n, cfg), extract_r(fac, n)

    @jax.jit
    def residuals(A, Q, R):
        resid = jnp.linalg.norm(
            jnp.einsum("ij,jk->ik", Q, R, precision=H) - A
        ) / jnp.linalg.norm(A)
        orth = jnp.linalg.norm(
            jnp.einsum("ij,ik->jk", Q, Q, precision=H) -
            jnp.eye(n, dtype=A.dtype))
        return resid, orth

    # ---- Phase 0: insurance rung.  A 1024^2 record costs ~1 min even
    # through a degraded tunnel; each 8192^2 factor program costs minutes
    # to tens of minutes to compile OR cache-load through the tunnel
    # (docs/PERF.md "Compile economics"), so without this rung any harness
    # timeout below that records nothing (round 2's failure mode).  The
    # later phases overwrite this line. ----
    if on_tpu:
        ms = 1024
        As = jnp.asarray(rng.standard_normal((ms, ms)).astype(np.float32))
        rs = bench(lambda a: qr_blocked(a, QRConfig(dtype=jnp.float32,
                                                    scan_stages=4)),
                   As, reps=30, flops=qr_flops(ms, ms))
        RECORD.update({
            "metric": f"qr_gflops_{ms}x{ms}_fp32",
            "value": round(rs.gflops, 1),
            "unit": "GFLOP/s",
            "vs_baseline": round(rs.gflops / baseline_gflops, 2),
            "steady_ms": round(rs.steady_s * 1e3, 1),
            "steady_net_ms": round(rs.steady_net_s * 1e3, 1),
            "rtt_ms": round(rs.rtt_s * 1e3, 1),
            "compile_s": round(rs.compile_s, 1),
            "backend": jax.default_backend(),
            "note": "insurance rung; 8192^2 phases follow",
        })
        emit()
        del As
        RECORD.pop("note")

    # ---- Phase 1: certified-MIXED factor headline + its accuracy gates.
    # Guard: each 8192^2 compile costs ~270 s on a healthy tunnel; if the
    # insurance rung already ate most of the budget (measured 2026-08-20: a
    # degraded tunnel took 1472 s to compile the 1024^2 program), exit
    # CLEANLY with the insurance record instead of being watchdog-killed
    # mid-compile. ----
    if on_tpu and time_left() < 300:
        RECORD["skipped_after"] = "insurance"
        emit()
        return 0
    r = bench(lambda a: qr_blocked(a, mcfg), A, reps=hreps,
              flops=qr_flops(m, n))
    RECORD.update({
        "metric": f"qr_gflops_{m}x{n}_fp32",
        "value": round(r.gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(r.gflops / baseline_gflops, 2),
        "precision_mode": "mixed_certified (panels HIGHEST, trailing "
                          "bf16x3; resid and orth gated below)",
        "steady_ms": round(r.steady_s * 1e3, 1),
        # device-time estimate with the forced-sync tunnel RTT share
        # removed (utils/timing.py steady_net_s); steady_ms stays the
        # conservative headline
        "steady_net_ms": round(r.steady_net_s * 1e3, 1),
        "rtt_ms": round(r.rtt_s * 1e3, 1),
        "reps": hreps,
        "compile_s": round(r.compile_s, 1),
        "backend": jax.default_backend(),
    })
    emit()

    # Accuracy gates for the headline (always-on verification -- the
    # reference shipped its check commented out, qr.cu:822-850).  Norms are
    # computed on-device at HIGHEST precision and fetched as scalars:
    # pulling full matrices through the host link would dominate wall-clock.
    verified_ok = None
    if time_left() >= 120 or not on_tpu:
        fac = qr_blocked(A, mcfg)
        Qm, Rm = q_and_r(fac)
        resid, orth = (float(x) for x in residuals(A, Qm, Rm))
        del fac, Qm, Rm
        verified_ok = (resid < n * eps) and (orth < n * eps * 4)
        RECORD["residual"] = float(f"{resid:.3e}")
        RECORD["orthogonality"] = float(f"{orth:.3e}")
        RECORD["verified_ok"] = verified_ok
        emit()
    else:
        RECORD["skipped_after"] = "mixed_factor"
        emit()
        return 0

    # ---- Phase 2: full-precision HIGHEST control factor (the r4 headline
    # config), gated on the same bounds. ----
    highest_ok = None
    if on_tpu and time_left() < 300:
        RECORD["skipped_after"] = "mixed_verified"
        emit()
        return 0
    rh = bench(lambda a: qr_blocked(a, cfg), A, reps=reps,
               flops=qr_flops(m, n))
    RECORD["highest_ms"] = round(rh.steady_s * 1e3, 1)
    RECORD["highest_net_ms"] = round(rh.steady_net_s * 1e3, 1)
    RECORD["highest_gflops"] = round(rh.gflops, 1)
    RECORD["highest_compile_s"] = round(rh.compile_s, 1)
    emit()

    # ---- Phase 3: + explicit Q on the HIGHEST factors.  The Q+R number
    # comparable to XLA's jnp.linalg.qr is reported as the SUM of the
    # factor and orgqr programs (orgqr consumes the complete factorization,
    # so a fused program cannot overlap them -- measured round 2: fused
    # 88-91 ms vs 71-76 + ~16 ms parts).  Summing avoids compiling the
    # factor pipeline a SECOND time inside a fused jit: each 8192^2
    # executable costs minutes through the remote-compile tunnel, and
    # round 2's bench died exactly there. ----
    if time_left() < 60:
        RECORD["skipped_after"] = "highest_factor"
        emit()
        return 0

    fach = qr_blocked(A, cfg)
    r_q = bench(q_and_r, fach, reps=reps)
    RECORD["q_plus_r_ms"] = round((rh.steady_s + r_q.steady_s) * 1e3, 1)
    RECORD["q_plus_r_net_ms"] = round(
        (rh.steady_net_s + r_q.steady_net_s) * 1e3, 1)
    RECORD["q_plus_r_form"] = "factor+orgqr program sum (HIGHEST)"
    RECORD["q_plus_r_compile_s"] = round(r_q.compile_s, 1)
    emit()

    if time_left() >= 60:
        Qh, Rh = q_and_r(fach)
        residh, orthh = (float(x) for x in residuals(A, Qh, Rh))
        del Qh, Rh, fach
        highest_ok = (residh < n * eps) and (orthh < n * eps * 4)
        RECORD["highest_residual"] = float(f"{residh:.3e}")
        RECORD["highest_orthogonality"] = float(f"{orthh:.3e}")
        RECORD["highest_ok"] = highest_ok
        emit()
    else:
        RECORD["skipped_after"] = "q_plus_r"
        emit()
        return 0

    # ---- Phase 4: Mosaic-compile smoke for the Pallas geqrt kernel: CI
    # runs it only in interpret mode on CPU, so this is the one place a
    # compiled-mode regression would surface.  Small and cached.  The
    # result is EMITTED BEFORE it is asserted: a kernel regression must be
    # reported, not silently fatal (round-2 lesson). ----
    geqrt_ok = None
    if on_tpu and time_left() >= 60:
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
        geqrt_ok = geqrt_resid < gn * eps
        RECORD["geqrt_mosaic_residual"] = float(f"{geqrt_resid:.3e}")
        RECORD["geqrt_mosaic_ok"] = geqrt_ok
        emit()

    # ---- Phase 5: true bf16 END-TO-END factor (dtype=bfloat16 storage +
    # trailing; panels upcast internally) + one fp32 CholeskyQR refinement
    # of Q.  Published with BOTH metrics: refinement recovers fp32-grade
    # orthogonality, the residual stays at bf16 backward-error scale (a
    # basis factory, not a solver -- docs/PERF.md "bf16 end-to-end").
    # Run at 4096^2 to bound the extra compile. ----
    if on_tpu and time_left() >= 300:
        from cuda_qr_tpu.ops.smalllinalg import cholesky_with_inv
        nb16 = 4096
        bcfg = QRConfig(dtype=jnp.bfloat16, scan_stages=8)
        A32 = jnp.asarray(rng.standard_normal((nb16, nb16))
                          .astype(np.float32))
        Ab = A32.astype(jnp.bfloat16)
        rb = bench(lambda a: qr_blocked(a, bcfg), Ab, reps=reps,
                   flops=qr_flops(nb16, nb16))

        @jax.jit
        def bf16_metrics(Ab, A32):
            fac = qr_blocked(Ab, bcfg)
            Qb = orgqr(fac, nb16, nb16, bcfg).astype(jnp.float32)
            Rb = extract_r(fac, nb16).astype(jnp.float32)
            G = jnp.einsum("ij,ik->jk", Qb, Qb, precision=H)
            _, Li = cholesky_with_inv(G, precision=H)
            Qr = jnp.einsum("ij,kj->ik", Qb, Li, precision=H)
            Rr = jnp.triu(jnp.einsum("ij,ik->jk", Qr, A32, precision=H))
            nrm = jnp.linalg.norm(A32)
            eye = jnp.eye(nb16, dtype=jnp.float32)
            raw_res = jnp.linalg.norm(
                jnp.einsum("ij,jk->ik", Qb, Rb, precision=H) - A32) / nrm
            raw_orth = jnp.linalg.norm(
                jnp.einsum("ij,ik->jk", Qb, Qb, precision=H) - eye)
            ref_res = jnp.linalg.norm(
                jnp.einsum("ij,jk->ik", Qr, Rr, precision=H) - A32) / nrm
            ref_orth = jnp.linalg.norm(
                jnp.einsum("ij,ik->jk", Qr, Qr, precision=H) - eye)
            return raw_res, raw_orth, ref_res, ref_orth

        raw_res, raw_orth, ref_res, ref_orth = (
            float(x) for x in bf16_metrics(Ab, A32))
        del A32, Ab
        RECORD["bf16_e2e_ms"] = round(rb.steady_s * 1e3, 1)
        RECORD["bf16_e2e_net_ms"] = round(rb.steady_net_s * 1e3, 1)
        RECORD["bf16_e2e_gflops"] = round(rb.gflops, 1)
        RECORD["bf16_e2e_size"] = nb16
        RECORD["bf16_raw_residual"] = float(f"{raw_res:.3e}")
        RECORD["bf16_raw_orthogonality"] = float(f"{raw_orth:.3e}")
        RECORD["bf16_refined_residual"] = float(f"{ref_res:.3e}")
        RECORD["bf16_refined_orthogonality"] = float(f"{ref_orth:.3e}")
        # contract: fp32-grade orthogonality after refinement; residual
        # bounded by the bf16 backward error (cannot be refined away)
        RECORD["bf16_ok"] = bool(ref_orth < nb16 * eps * 4
                                 and ref_res < 8 * 2.0 ** -8)
        emit()

    ok = (verified_ok is not False) and (highest_ok is not False) \
        and (geqrt_ok is not False)
    return 0 if ok else 1


if __name__ == "__main__":
    # The axon remote-compile tunnel occasionally drops a response mid-read
    # (a retry compiles from its warm cache and succeeds in seconds) and
    # goes UNAVAILABLE for multi-minute stretches (it recovers on its own)
    # -- so back off between attempts instead of failing fast.
    #
    # Watchdog: when the tunnel is fully down, backend init inside main()
    # BLOCKS forever (jax.devices() nanosleep-retries; no exception ever
    # fires), which would hang the harness.  A hard exit turns that into a
    # recordable failure; any record already emitted survives on stdout.
    import threading

    def _die():
        if not RECORD:
            # Nothing was measured: the axon tunnel swallowed the first
            # remote compile (observed hung >35 min with <1 min of process
            # CPU time; it can stay down for hours).  Emit an honest
            # zero-value record so the harness parses a diagnosis instead
            # of recording nothing (round 2's rc=124 failure mode).
            print(json.dumps({
                "metric": "qr_gflops_8192x8192_fp32", "value": 0.0,
                "unit": "GFLOP/s", "vs_baseline": 0.0,
                "error": "axon tunnel unavailable: first remote compile "
                         "never returned within the watchdog window",
            }))
            sys.stdout.flush()
        print("# bench watchdog fired (tunnel hang)", file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    watchdog = threading.Timer(SOFT_DEADLINE_S + 600, _die)
    watchdog.daemon = True
    watchdog.start()
    for attempt in range(5):
        try:
            sys.exit(main())
        except Exception as e:  # noqa: BLE001 - last attempt re-raises
            if attempt == 4 or time_left() < 120:
                raise
            wait = 30 * (attempt + 1)
            print(f"# bench attempt {attempt + 1} failed ({e!r}); "
                  f"retrying in {wait}s", file=sys.stderr)
            time.sleep(wait)
