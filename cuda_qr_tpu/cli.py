"""CLI harness: `python -m cuda_qr_tpu <cmd> ...`.

TPU-native counterpart of the reference's benchmark mains (qr.cu:709-857,
`./qr_device.exe m n`), with the fixes SURVEY.md flags: sizes are padded
internally instead of silently rounded to the panel grid (qr.cu:722-734),
verification is always on instead of commented out (qr.cu:822-850), timing
separates compile from steady state instead of folding allocs+copies in
(qr.cu:775-788), and results are structured JSON instead of hand-copied
stdout (timing.txt).

Commands:
  factor m n   -- blocked QR benchmark + verification
  tsqr m n     -- tall-skinny TSQR benchmark + verification
  lstsq m n k  -- least-squares solve benchmark
  compare m n  -- our QR vs XLA's jnp.linalg.qr (the MAGMA-comparator
                  analog, qr.cu:555-565)
  oracle m n pr pc -- run the native C oracle end to end
  caqr m n [--devices D] [--layout block|cyclic] -- distributed CAQR over
                  the available devices (use JAX_PLATFORMS=cpu +
                  --xla_force_host_platform_device_count for a virtual mesh)
  pivoted m n [--rank r] [--decay d] -- rank-revealing randomized QRCP
                  (optionally truncated at rank r; decay < 1 generates a
                  geometrically decaying spectrum)
  batched b m n -- batched small-matrix QR (sCholQR3) over a (b, m, n) stack
  update m n   -- rank-1 qr_update benchmark vs a full refactor
  decomp k m n -- LQ/RQ/QL benchmark + verification (k in {lq, rq, ql})
  rsvd m n     -- randomized rank-k SVD benchmark on a decaying spectrum
                  (--sym: symmetric eigh_rand benchmark instead)
  polar m n    -- QDWH polar decomposition benchmark + verification
  dist KIND m n [--devices D] -- distributed solver over a row mesh
                  (KIND in {tsqr, lstsq, polar, svd, rsvd, eigh-rand});
                  same virtual-mesh setup as caqr
"""

from __future__ import annotations

import argparse
import json
import sys


def _config(args):
    import jax
    import jax.numpy as jnp
    from .utils.config import QRConfig
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    dtype = {"f32": jnp.float32, "f64": jnp.float64,
             "bf16": jnp.bfloat16}[args.dtype]
    extra = {}
    if getattr(args, "stages", None) is not None:
        extra["scan_stages"] = args.stages
    if getattr(args, "lookahead", None) is not None:
        extra["factor_lookahead"] = args.lookahead
    if getattr(args, "stage_schedule", None):
        extra["stage_schedule"] = tuple(
            int(x) for x in args.stage_schedule.split(","))
    if getattr(args, "mixed", False):
        extra["trailing_precision"] = jax.lax.Precision.HIGH
    return QRConfig(dtype=dtype, use_pallas=not args.no_pallas,
                    tsqr_leaf=args.tsqr_leaf, **extra)


def _emit(rec):
    print(json.dumps(rec))


def cmd_factor(args):
    import numpy as np
    import jax.numpy as jnp
    from .ops.blocked import extract_r, orgqr, qr_blocked
    from .utils.timing import bench, qr_flops
    from .utils.verify import check_qr

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    A = jnp.asarray(rng.standard_normal((args.m, args.n)), dtype=cfg.dtype)
    r = bench(lambda a: qr_blocked(a, cfg), A, reps=args.trials,
              flops=qr_flops(args.m, args.n))
    rec = {"cmd": "factor", "m": args.m, "n": args.n, "dtype": args.dtype,
           "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1),
           "gflops": round(r.gflops, 1)}
    if not args.no_verify:
        fac = qr_blocked(A, cfg)
        chk = check_qr(np.asarray(A, np.float64),
                       np.asarray(orgqr(fac, args.m, args.n, cfg)),
                       np.asarray(extract_r(fac, args.n)))
        rec |= {"residual": chk.residual, "orthogonality": chk.orthogonality,
                "ok": chk.ok}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_tsqr(args):
    import numpy as np
    import jax.numpy as jnp
    from .models.tsqr import tsqr
    from .utils.timing import bench, qr_flops
    from .utils.verify import check_qr

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    A = jnp.asarray(rng.standard_normal((args.m, args.n)), dtype=cfg.dtype)
    r = bench(lambda a: tsqr(a, cfg), A, reps=args.trials,
              flops=qr_flops(args.m, args.n))
    rec = {"cmd": "tsqr", "m": args.m, "n": args.n, "dtype": args.dtype,
           "leaf": cfg.tsqr_leaf, "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1), "gflops": round(r.gflops, 1)}
    if not args.no_verify:
        Q, R = tsqr(A, cfg)
        chk = check_qr(np.asarray(A, np.float64), np.asarray(Q), np.asarray(R))
        rec |= {"residual": chk.residual, "orthogonality": chk.orthogonality,
                "ok": chk.ok}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_lstsq(args):
    import numpy as np
    import jax.numpy as jnp
    from .models.lstsq import lstsq
    from .utils.timing import bench

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    A = jnp.asarray(rng.standard_normal((args.m, args.n)), dtype=cfg.dtype)
    B = jnp.asarray(rng.standard_normal((args.m, args.k)), dtype=cfg.dtype)
    r = bench(lambda a, b: lstsq(a, b, cfg), A, B, reps=args.trials)
    res = lstsq(A, B, cfg)
    x_np, *_ = np.linalg.lstsq(np.asarray(A, np.float64),
                               np.asarray(B, np.float64), rcond=None)
    err = float(np.max(np.abs(np.asarray(res.x, np.float64) - x_np))
                / max(1.0, float(np.max(np.abs(x_np)))))
    _emit({"cmd": "lstsq", "m": args.m, "n": args.n, "k": args.k,
           "dtype": args.dtype, "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1), "rel_err_vs_lapack": err})
    return 0


def cmd_compare(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from .ops.blocked import extract_r, orgqr, qr_blocked
    from .utils.timing import bench, qr_flops

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    A = jnp.asarray(rng.standard_normal((args.m, args.n)), dtype=cfg.dtype)
    fl = qr_flops(args.m, args.n)
    ours = bench(lambda a: qr_blocked(a, cfg), A, reps=args.trials, flops=fl)

    # Honest comparison: XLA's jnp.linalg.qr returns explicit (Q, R), so the
    # like-for-like number on our side is factor + orgqr in one jit.
    @jax.jit
    def qr_full(a):
        fac = qr_blocked(a, cfg)
        return orgqr(fac, args.m, args.n, cfg), extract_r(fac, args.n)

    ours_qr = bench(qr_full, A, reps=args.trials)
    xla = bench(jax.jit(lambda a: jnp.linalg.qr(a)), A, reps=args.trials,
                flops=fl)
    _emit({"cmd": "compare", "m": args.m, "n": args.n, "dtype": args.dtype,
           "ours_factor_ms": round(ours.steady_s * 1e3, 1),
           "ours_factor_gflops": round(ours.gflops, 1),
           "ours_q_plus_r_ms": round(ours_qr.steady_s * 1e3, 1),
           "xla_q_plus_r_ms": round(xla.steady_s * 1e3, 1),
           "q_plus_r_speedup_vs_xla": round(
               xla.steady_s / ours_qr.steady_s, 2)})
    return 0


def cmd_caqr(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from .models.caqr import caqr
    from .parallel.mesh import row_mesh
    from .utils.timing import bench
    from .utils.verify import check_qr

    cfg = _config(args)
    n_dev = args.devices or len(jax.devices())
    if len(jax.devices()) < n_dev:
        print(f"error: {n_dev} devices requested, "
              f"{len(jax.devices())} available "
              f"({jax.default_backend()}); for a virtual mesh use "
              "--platform cpu with "
              "XLA_FLAGS=--xla_force_host_platform_device_count=N",
              file=sys.stderr)
        return 2
    mesh = row_mesh(n_dev)
    rng = np.random.default_rng(args.seed)
    A = rng.standard_normal((args.m, args.n)).astype(np.float64)
    Aj = jnp.asarray(A, dtype=cfg.dtype)
    r = bench(lambda a: caqr(a, mesh, cfg, layout=args.layout), Aj,
              reps=args.trials)
    rec = {"cmd": "caqr", "m": args.m, "n": args.n, "devices": n_dev,
           "layout": args.layout, "dtype": args.dtype,
           "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1)}
    if not args.no_verify:
        Q, R = caqr(Aj, mesh, cfg, layout=args.layout)
        chk = check_qr(A, np.asarray(Q), np.asarray(R))
        rec |= {"residual": chk.residual, "orthogonality": chk.orthogonality,
                "ok": chk.ok}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_pivoted(args):
    import numpy as np
    import jax.numpy as jnp
    from .models.qr import qr_pivoted
    from .utils.timing import bench, qr_flops

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    A = rng.standard_normal((args.m, args.n))
    if args.decay < 1.0:  # decaying spectrum: the rank-revealing use case
        U, _ = np.linalg.qr(rng.standard_normal((args.m, args.n)))
        V, _ = np.linalg.qr(rng.standard_normal((args.n, args.n)))
        A = (U * args.decay ** np.arange(args.n)) @ V.T
    Aj = jnp.asarray(A, dtype=cfg.dtype)
    r = bench(lambda a: qr_pivoted(a, cfg, rank=args.rank), Aj,
              reps=args.trials, flops=qr_flops(args.m, args.n))
    rec = {"cmd": "pivoted", "m": args.m, "n": args.n, "dtype": args.dtype,
           "rank": args.rank, "decay": args.decay,
           "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1), "gflops": round(r.gflops, 1)}
    if not args.no_verify:
        Q, R, piv = qr_pivoted(Aj, cfg, rank=args.rank)
        Qn = np.asarray(Q, np.float64)
        Rn = np.asarray(R, np.float64)
        resid = float(np.linalg.norm(A[:, np.asarray(piv)] - Qn @ Rn)
                      / np.linalg.norm(A))
        orth = float(np.abs(Qn.T @ Qn - np.eye(Qn.shape[1])).max())
        eps = float(jnp.finfo(cfg.dtype).eps)
        ok = (resid < args.n * eps) if args.rank is None else (orth < 1e-4)
        rec |= {"residual": resid, "orthogonality": orth, "ok": ok}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_oracle(args):
    import numpy as np
    from .oracle import binding

    rng = np.random.default_rng(args.seed)
    A = rng.standard_normal((args.m, args.n))
    resid, orth = binding.factor_and_check(A, args.pr, args.pc)
    _emit({"cmd": "oracle", "m": args.m, "n": args.n, "pr": args.pr,
           "pc": args.pc, "residual": resid, "orthogonality": orth})
    return 0 if resid < 1e-12 * args.n else 2


def cmd_batched(args):
    import numpy as np
    import jax.numpy as jnp
    from .models.batched import qr_batched
    from .utils.timing import bench, qr_flops

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    A = jnp.asarray(rng.standard_normal((args.b, args.m, args.n)),
                    dtype=cfg.dtype)
    r = bench(lambda a: qr_batched(a, cfg), A, reps=args.trials,
              flops=args.b * qr_flops(args.m, args.n))
    rec = {"cmd": "batched", "b": args.b, "m": args.m, "n": args.n,
           "dtype": args.dtype, "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1), "gflops": round(r.gflops, 1)}
    if not args.no_verify:
        Q, R = qr_batched(A, cfg)
        Qn = np.asarray(Q, np.float64)
        Rn = np.asarray(R, np.float64)
        An = np.asarray(A, np.float64)
        resid = float(np.linalg.norm(Qn @ Rn - An) /
                      max(np.linalg.norm(An), 1.0))
        orth = float(max(np.linalg.norm(q.T @ q - np.eye(args.n))
                         for q in Qn))
        eps = float(jnp.finfo(cfg.dtype).eps)
        rec |= {"residual": resid, "orthogonality": orth,
                "ok": resid < args.n * eps and orth < 4 * args.n * eps}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_update(args):
    import numpy as np
    import jax.numpy as jnp
    from .models.qr import qr
    from .models.update import qr_rank1_update
    from .utils.timing import bench
    from .utils.verify import check_qr

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    A = rng.standard_normal((args.m, args.n))
    Q, R = qr(jnp.asarray(A, dtype=cfg.dtype), cfg)
    u = jnp.asarray(rng.standard_normal(args.m), dtype=cfg.dtype)
    v = jnp.asarray(rng.standard_normal(args.n), dtype=cfg.dtype)
    r_up = bench(lambda q, rr: qr_rank1_update(q, rr, u, v), Q, R,
                 reps=args.trials)
    r_ref = bench(lambda a: qr(a, cfg),
                  jnp.asarray(A + np.outer(u, v), dtype=cfg.dtype),
                  reps=args.trials)
    rec = {"cmd": "update", "m": args.m, "n": args.n, "dtype": args.dtype,
           "update_ms": round(r_up.steady_s * 1e3, 2),
           "refactor_ms": round(r_ref.steady_s * 1e3, 2),
           "compile_s": round(r_up.compile_s, 1)}
    if not args.no_verify:
        Q1, R1 = qr_rank1_update(Q, R, u, v)
        chk = check_qr(A + np.outer(np.asarray(u, np.float64),
                                    np.asarray(v, np.float64)),
                       np.asarray(Q1), np.asarray(R1))
        rec |= {"residual": chk.residual, "orthogonality": chk.orthogonality,
                "ok": chk.residual_ok and chk.orthogonality_ok}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_decomp(args):
    import numpy as np
    import jax.numpy as jnp
    from .models import decomp
    from .utils.timing import bench, qr_flops

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    A = jnp.asarray(rng.standard_normal((args.m, args.n)), dtype=cfg.dtype)
    fn = {"lq": decomp.lq, "rq": decomp.rq, "ql": decomp.ql}[args.kind]
    r = bench(lambda a: fn(a, cfg), A, reps=args.trials,
              flops=qr_flops(max(args.m, args.n), min(args.m, args.n)))
    rec = {"cmd": "decomp", "kind": args.kind, "m": args.m, "n": args.n,
           "dtype": args.dtype, "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1), "gflops": round(r.gflops, 1)}
    if not args.no_verify:
        X, Y = fn(A, cfg)
        X, Y = np.asarray(X, np.float64), np.asarray(Y, np.float64)
        A64 = np.asarray(A, np.float64)
        resid = float(np.linalg.norm(X @ Y - A64) / np.linalg.norm(A64))
        k = min(args.m, args.n)
        orthf = Y @ Y.T if args.kind in ("lq", "rq") else X.T @ X
        rec |= {"residual": resid,
                "orthogonality": float(np.linalg.norm(orthf - np.eye(k))),
                "ok": resid < max(args.m, args.n) * 1.2e-7}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_polar(args):
    import numpy as np
    import jax.numpy as jnp
    from .models.polar import polar
    from .utils.timing import bench

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    # controllable conditioning so the QDWH schedule is exercised honestly
    k = min(args.m, args.n)
    U = np.linalg.qr(rng.standard_normal((args.m, k)))[0]
    V = np.linalg.qr(rng.standard_normal((args.n, k)))[0]
    s = np.geomspace(1.0, 1.0 / max(args.cond, 1.0), k)
    A = jnp.asarray((U * s) @ V.T, dtype=cfg.dtype)
    r = bench(lambda a: polar(a, config=cfg), A, reps=args.trials)
    rec = {"cmd": "polar", "m": args.m, "n": args.n, "cond": args.cond,
           "dtype": args.dtype, "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1)}
    if not args.no_verify:
        Up, Hp = polar(A, config=cfg)
        Up = np.asarray(Up, np.float64)
        Hp = np.asarray(Hp, np.float64)
        A64 = np.asarray(A, np.float64)
        UU = Up.T @ Up if args.m >= args.n else Up @ Up.T
        orth = float(np.linalg.norm(UU - np.eye(k)))
        resid = float(np.linalg.norm(Up @ Hp - A64) / np.linalg.norm(A64))
        rec |= {"residual": resid, "orthogonality": orth,
                "ok": resid < k * 1.2e-7 and orth < k * 1.2e-7}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_svd(args):
    import numpy as np
    import jax.numpy as jnp
    from .models.polar import svd
    from .utils.timing import bench

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    k = min(args.m, args.n)
    U = np.linalg.qr(rng.standard_normal((args.m, k)))[0]
    V = np.linalg.qr(rng.standard_normal((args.n, k)))[0]
    s_true = np.geomspace(1.0, 1.0 / max(args.cond, 1.0), k)
    A = jnp.asarray((U * s_true) @ V.T, dtype=cfg.dtype)
    r = bench(lambda a: svd(a, config=cfg, eigh_impl=args.eigh_impl), A,
              reps=args.trials)
    rec = {"cmd": "svd", "m": args.m, "n": args.n, "cond": args.cond,
           "eigh_impl": args.eigh_impl, "dtype": args.dtype,
           "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1)}
    if not args.no_verify:
        Us, ss, Vh = svd(A, config=cfg, eigh_impl=args.eigh_impl)
        Us = np.asarray(Us, np.float64)
        ss = np.asarray(ss, np.float64)
        Vh = np.asarray(Vh, np.float64)
        A64 = np.asarray(A, np.float64)
        resid = float(np.linalg.norm((Us * ss) @ Vh - A64)
                      / np.linalg.norm(A64))
        orth = float(max(np.linalg.norm(Us.T @ Us - np.eye(k)),
                         np.linalg.norm(Vh @ Vh.T - np.eye(k))))
        serr = float(np.abs(ss - s_true).max() / s_true[0])
        eps = 1.2e-7 if args.dtype != "f64" else 2.3e-16
        rec |= {"residual": resid, "orthogonality": orth,
                "sv_rel_err": serr,
                "ok": resid < k * eps and orth < 4 * k * eps}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_dist(args):
    """Distributed-solver harness over a row mesh (`dist KIND m n`).

    Runs the `_dist` variant of a solver on `--devices` row shards and
    verifies it against the same float64 host checks the single-device
    subcommands use.  On CPU pass --platform cpu with
    XLA_FLAGS=--xla_force_host_platform_device_count=N for a virtual mesh
    -- the same harness drives a real ICI mesh unchanged (the SPMD code is
    mesh-shape-agnostic; SURVEY.md S2's jobfile analog).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from .parallel.mesh import row_mesh
    from .utils.timing import bench

    cfg = _config(args)
    n_dev = args.devices or len(jax.devices())
    if len(jax.devices()) < n_dev:
        print(f"error: {n_dev} devices requested, "
              f"{len(jax.devices())} available ({jax.default_backend()})",
              file=sys.stderr)
        return 2
    if args.m % n_dev:
        print(f"error: m={args.m} must divide the mesh ({n_dev} shards)",
              file=sys.stderr)
        return 2
    # tsqr/polar/svd run a shard-local thin QR of an (m/P x n) block, so
    # m/P >= n; the randomized kinds factor (m/P x rank+8) iterates
    # instead, and lstsq's augmented CAQR only needs m % P == 0.
    min_cols = {"tsqr": args.n, "polar": args.n, "svd": args.n,
                "rsvd": args.rank + 8, "eigh-rand": args.rank + 8,
                "lstsq": 0}[args.kind]
    if args.m // n_dev < min_cols:
        print(f"error: {args.kind} needs m/devices >= {min_cols}, got "
              f"{args.m}/{n_dev} = {args.m // n_dev}", file=sys.stderr)
        return 2
    mesh = row_mesh(n_dev)
    rng = np.random.default_rng(args.seed)
    kind = args.kind
    rec = {"cmd": f"{kind}_dist", "m": args.m, "n": args.n,
           "devices": n_dev, "dtype": args.dtype}
    eps = 1.2e-7 if args.dtype != "f64" else 2.3e-16
    k = min(args.m, args.n)

    if kind == "tsqr":
        from .parallel.tsqr_dist import tsqr_dist
        from .utils.verify import check_qr
        A = rng.standard_normal((args.m, args.n))
        Aj = jnp.asarray(A, cfg.dtype)
        r = bench(lambda a: tsqr_dist(a, mesh, cfg,
                                      strategy=args.strategy),
                  Aj, reps=args.trials)
        rec["strategy"] = args.strategy
        if not args.no_verify:
            Q, R = tsqr_dist(Aj, mesh, cfg, strategy=args.strategy)
            chk = check_qr(A, np.asarray(Q), np.asarray(R))
            rec |= {"residual": chk.residual,
                    "orthogonality": chk.orthogonality, "ok": chk.ok}
    elif kind == "lstsq":
        from .models.lstsq import lstsq_dist
        A = rng.standard_normal((args.m, args.n))
        b = rng.standard_normal((args.m,))
        Aj, bj = jnp.asarray(A, cfg.dtype), jnp.asarray(b, cfg.dtype)
        r = bench(lambda a: lstsq_dist(a, bj, mesh, cfg).x, Aj,
                  reps=args.trials)
        if not args.no_verify:
            x = np.asarray(lstsq_dist(Aj, bj, mesh, cfg).x, np.float64)
            x_ref = np.linalg.lstsq(A, b, rcond=None)[0]
            err = float(np.linalg.norm(x - x_ref)
                        / max(np.linalg.norm(x_ref), 1e-30))
            # cond(A)~sqrt(m/n) here; forward error amplifies eps by cond
            rec |= {"x_rel_err": err, "ok": err < 100 * args.n * eps}
    elif kind in ("polar", "svd"):
        from .models.polar import polar_dist, svd_dist
        U = np.linalg.qr(rng.standard_normal((args.m, k)))[0]
        V = np.linalg.qr(rng.standard_normal((args.n, k)))[0]
        s_true = np.geomspace(1.0, 1.0 / max(args.cond, 1.0), k)
        A64 = (U * s_true) @ V.T
        Aj = jnp.asarray(A64, cfg.dtype)
        rec["cond"] = args.cond
        if kind == "polar":
            r = bench(lambda a: polar_dist(a, mesh, config=cfg)[0], Aj,
                      reps=args.trials)
            if not args.no_verify:
                Up, Hp = polar_dist(Aj, mesh, config=cfg)
                Up = np.asarray(Up, np.float64)
                Hp = np.asarray(Hp, np.float64)
                orth = float(np.linalg.norm(Up.T @ Up - np.eye(k)))
                resid = float(np.linalg.norm(Up @ Hp - A64)
                              / np.linalg.norm(A64))
                rec |= {"residual": resid, "orthogonality": orth,
                        "ok": resid < k * eps and orth < k * eps}
        else:
            r = bench(lambda a: svd_dist(a, mesh, config=cfg,
                                         eigh_impl=args.eigh_impl)[0], Aj,
                      reps=args.trials)
            rec["eigh_impl"] = args.eigh_impl
            if not args.no_verify:
                Us, ss, Vh = svd_dist(Aj, mesh, config=cfg,
                                      eigh_impl=args.eigh_impl)
                Us = np.asarray(Us, np.float64)
                ss = np.asarray(ss, np.float64)
                Vh = np.asarray(Vh, np.float64)
                resid = float(np.linalg.norm((Us * ss) @ Vh - A64)
                              / np.linalg.norm(A64))
                orth = float(max(np.linalg.norm(Us.T @ Us - np.eye(k)),
                                 np.linalg.norm(Vh @ Vh.T - np.eye(k))))
                rec |= {"residual": resid, "orthogonality": orth,
                        "sv_rel_err": float(np.abs(ss - s_true).max()
                                            / s_true[0]),
                        "ok": resid < k * eps and orth < 4 * k * eps}
    elif kind == "rsvd":
        from .models.rsvd import rsvd_dist
        r_full = min(args.m, args.n, 4 * args.rank)
        U = np.linalg.qr(rng.standard_normal((args.m, r_full)))[0]
        V = np.linalg.qr(rng.standard_normal((args.n, r_full)))[0]
        s = args.decay ** np.arange(r_full)
        A64 = (U * s) @ V.T
        Aj = jnp.asarray(A64, cfg.dtype)
        rec["rank"] = args.rank
        r = bench(lambda a: rsvd_dist(a, args.rank, mesh,
                                      n_iter=args.iters, config=cfg)[0],
                  Aj, reps=args.trials)
        if not args.no_verify:
            Uk, sk, Vtk = rsvd_dist(Aj, args.rank, mesh,
                                    n_iter=args.iters, config=cfg)
            err = np.linalg.norm(
                (np.asarray(Uk, np.float64) * np.asarray(sk, np.float64))
                @ np.asarray(Vtk, np.float64) - A64, 2)
            tail = s[args.rank] if args.rank < r_full else 0.0
            rec |= {"err2": float(err), "s_next": float(tail),
                    "ok": bool(err < 3 * tail + max(args.m, args.n) * 1e-6)}
    else:  # eigh-rand
        from .models.rsvd import eigh_rand_dist
        m = args.m
        r_full = min(m, 4 * args.rank)
        V = np.linalg.qr(rng.standard_normal((m, r_full)))[0]
        w = (args.decay ** np.arange(r_full)
             * np.where(np.arange(r_full) % 2, -1.0, 1.0))
        A64 = (V * w) @ V.T
        Aj = jnp.asarray(A64, cfg.dtype)
        rec["rank"] = args.rank
        r = bench(lambda a: eigh_rand_dist(a, args.rank, mesh,
                                           n_iter=args.iters, config=cfg)[1],
                  Aj, reps=args.trials)
        if not args.no_verify:
            wk, Vk = eigh_rand_dist(Aj, args.rank, mesh,
                                    n_iter=args.iters, config=cfg)
            wk = np.asarray(wk, np.float64)
            Vk = np.asarray(Vk, np.float64)
            err = np.linalg.norm((Vk * wk) @ Vk.T - A64, 2)
            tail = abs(w[args.rank]) if args.rank < r_full else 0.0
            rec |= {"err2": float(err), "w_next": float(tail),
                    "ok": bool(err < 3 * tail + m * 1e-6)}

    rec |= {"steady_ms": round(r.steady_s * 1e3, 2),
            "compile_s": round(r.compile_s, 1)}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_rsvd(args):
    import numpy as np
    import jax.numpy as jnp
    from .models.rsvd import rsvd
    from .utils.timing import bench

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    if getattr(args, "sym", False):
        return _cmd_eigh_rand(args, cfg, rng)
    # spectrum with controllable decay so the truncation error is meaningful
    r_full = min(args.m, args.n)
    U = np.linalg.qr(rng.standard_normal((args.m, r_full)))[0]
    V = np.linalg.qr(rng.standard_normal((args.n, r_full)))[0]
    s = args.decay ** np.arange(r_full)
    A = jnp.asarray((U * s) @ V.T, dtype=cfg.dtype)
    r = bench(lambda a: rsvd(a, args.rank, n_iter=args.iters, config=cfg),
              A, reps=args.trials)
    rec = {"cmd": "rsvd", "m": args.m, "n": args.n, "rank": args.rank,
           "dtype": args.dtype, "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1)}
    if not args.no_verify:
        Uk, sk, Vtk = rsvd(A, args.rank, n_iter=args.iters, config=cfg)
        rec_err = np.linalg.norm(
            (np.asarray(Uk, np.float64) * np.asarray(sk, np.float64))
            @ np.asarray(Vtk, np.float64) - np.asarray(A, np.float64), 2)
        tail = s[args.rank] if args.rank < r_full else 0.0
        rec |= {"err2": float(rec_err), "s_next": float(tail),
                "ok": bool(rec_err < 3 * tail + max(args.m, args.n) * 1e-6)}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def _cmd_eigh_rand(args, cfg, rng):
    """rsvd --sym: randomized Hermitian eigendecomposition benchmark on a
    symmetric matrix with an alternating-sign decaying spectrum."""
    import numpy as np
    import jax.numpy as jnp
    from .models.rsvd import eigh_rand
    from .utils.timing import bench

    m = args.m
    # Rank-limited Haar basis (like benchmarks/run_all.py): a full m x m
    # host-side QR is O(m^3) and would dominate wall time at large m; the
    # tail |w[rank]| acceptance check only needs r_full > rank eigenpairs.
    r_full = min(m, 4 * args.rank)
    V = np.linalg.qr(rng.standard_normal((m, r_full)))[0]
    w = (args.decay ** np.arange(r_full)
         * np.where(np.arange(r_full) % 2, -1.0, 1.0))
    A = jnp.asarray((V * w) @ V.T, dtype=cfg.dtype)
    r = bench(lambda a: eigh_rand(a, args.rank, n_iter=args.iters,
                                  config=cfg), A, reps=args.trials)
    rec = {"cmd": "eigh_rand", "m": m, "rank": args.rank,
           "dtype": args.dtype, "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1)}
    if not args.no_verify:
        wk, Vk = eigh_rand(A, args.rank, n_iter=args.iters, config=cfg)
        wk = np.asarray(wk, np.float64)
        Vk = np.asarray(Vk, np.float64)
        err = np.linalg.norm((Vk * wk) @ Vk.T - np.asarray(A, np.float64), 2)
        tail = abs(w[args.rank]) if args.rank < m else 0.0
        rec |= {"err2": float(err), "w_next": float(tail),
                "ok": bool(err < 3 * tail + m * 1e-6)}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def cmd_eigh(args):
    import numpy as np
    import jax.numpy as jnp
    from .models.eigh import eigh
    from .utils.timing import bench

    cfg = _config(args)
    rng = np.random.default_rng(args.seed)
    n = args.m
    # GOE-like symmetric matrix: dense spectrum, no pathological gaps
    G = rng.standard_normal((n, n))
    A = jnp.asarray((G + G.T) / np.sqrt(2 * n), dtype=cfg.dtype)
    r = bench(lambda a: eigh(a, cfg, base_n=args.base_n), A,
              reps=args.trials)
    rec = {"cmd": "eigh", "n": n, "dtype": args.dtype,
           "base_n": args.base_n,
           "steady_ms": round(r.steady_s * 1e3, 2),
           "compile_s": round(r.compile_s, 1)}
    if not args.no_verify:
        w, V = eigh(A, cfg, base_n=args.base_n)
        w = np.asarray(w, np.float64)
        V = np.asarray(V, np.float64)
        A64 = np.asarray(A, np.float64)
        resid = float(np.linalg.norm(A64 @ V - V * w[None, :])
                      / np.linalg.norm(A64))
        orth = float(np.linalg.norm(V.T @ V - np.eye(n)))
        werr = float(np.abs(np.sort(w) - np.linalg.eigvalsh(A64)).max()
                     / np.abs(w).max())
        eps = 1.2e-7 if args.dtype != "f64" else 2.3e-16
        rec |= {"residual": resid, "orthogonality": orth,
                "eigval_rel_err": werr,
                # V is a depth-O(log n) product of QRCP bases and Jacobi
                # rotations; 4n*eps matches the batched-orthogonality
                # convention above (cmd_batched)
                "ok": resid < n * eps and orth < 4 * n * eps}
    _emit(rec)
    return 0 if rec.get("ok", True) else 2


def main(argv=None):
    from .utils.cache import enable_persistent_cache
    enable_persistent_cache()  # amortize XLA compiles across CLI invocations

    p = argparse.ArgumentParser(prog="cuda_qr_tpu", description=__doc__)
    p.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                   help="force the JAX platform. NOTE: this container's "
                        "sitecustomize registers the TPU backend "
                        "programmatically and the JAX_PLATFORMS env var is "
                        "ignored -- use this flag (it calls "
                        "jax.config.update before any device access), e.g. "
                        "for a virtual CPU mesh with "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=8")
    p.add_argument("--dtype", choices=["f32", "f64", "bf16"], default="f32")
    p.add_argument("--trials", type=int, default=3)  # qr.cu:25
    p.add_argument("--seed", type=int, default=12)   # qr.cu:765
    p.add_argument("--no-verify", action="store_true")
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--mixed", action="store_true",
                   help="certified-MIXED precision mode: trailing-update "
                        "GEMMs at bf16x3 (~2x MXU rate), panel math at "
                        "HIGHEST -- the CLI form of the bench headline "
                        "mode (and of the reference's whole-pipeline "
                        "Scalar macro, qr.cu:17).  Verification gates "
                        "(resid < n*eps, orth < 4n*eps) stay on")
    p.add_argument("--tsqr-leaf", choices=["householder", "cholqr2"],
                   default="householder")
    p.add_argument("--stages", type=int, default=None,
                   help="scan driver stages (QRConfig.scan_stages)")
    p.add_argument("--lookahead", type=int, default=None,
                   help="factor lookahead group width")
    p.add_argument("--stage-schedule", type=str, default=None,
                   help="comma-separated panels-per-stage (overrides "
                        "--stages; must sum to the panel count), e.g. "
                        "2,2,2,8 -- see QRConfig.stage_schedule. Only "
                        "applies to direct QR factorization subcommands "
                        "(factor/tsqr/compare): composite solvers run "
                        "internal QRs whose panel counts the schedule "
                        "cannot match")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, np_ in [("factor", 2), ("tsqr", 2), ("compare", 2)]:
        sp = sub.add_parser(name)
        sp.add_argument("m", type=int)
        sp.add_argument("n", type=int)
    sp = sub.add_parser("lstsq")
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp.add_argument("k", type=int, nargs="?", default=1)
    sp = sub.add_parser("oracle")
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp.add_argument("pr", type=int)
    sp.add_argument("pc", type=int)
    sp = sub.add_parser("caqr")
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp.add_argument("--devices", type=int, default=None)
    sp.add_argument("--layout", choices=["block", "cyclic"], default="block")
    sp = sub.add_parser("pivoted")
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp.add_argument("--rank", type=int, default=None)
    sp.add_argument("--decay", type=float, default=1.0)
    sp = sub.add_parser("batched")
    sp.add_argument("b", type=int)
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp = sub.add_parser("update")
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp = sub.add_parser("decomp")
    sp.add_argument("kind", choices=["lq", "rq", "ql"])
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp = sub.add_parser("rsvd")
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp.add_argument("--rank", type=int, default=16)
    sp.add_argument("--iters", type=int, default=2)
    sp.add_argument("--decay", type=float, default=0.8)
    sp.add_argument("--sym", action="store_true",
                    help="square symmetric input: benchmark eigh_rand "
                         "instead of rsvd (n is ignored)")
    sp = sub.add_parser("polar")
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp.add_argument("--cond", type=float, default=100.0)
    sp = sub.add_parser("eigh")
    sp.add_argument("m", type=int)
    sp.add_argument("--base-n", type=int, default=128)
    sp = sub.add_parser("svd")
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp.add_argument("--cond", type=float, default=100.0)
    sp.add_argument("--eigh-impl", choices=("xla", "qdwh"), default="xla")
    sp = sub.add_parser("dist")
    sp.add_argument("kind", choices=["tsqr", "lstsq", "polar", "svd",
                                     "rsvd", "eigh-rand"])
    sp.add_argument("m", type=int)
    sp.add_argument("n", type=int)
    sp.add_argument("--devices", type=int, default=None)
    sp.add_argument("--strategy",
                    choices=["allgather", "butterfly", "cholesky"],
                    default="allgather", help="tsqr combine strategy")
    sp.add_argument("--cond", type=float, default=100.0)
    sp.add_argument("--rank", type=int, default=16)
    sp.add_argument("--iters", type=int, default=2)
    sp.add_argument("--decay", type=float, default=0.8)
    sp.add_argument("--eigh-impl", choices=("xla", "qdwh"), default="xla",
                    help="Hermitian eigensolver for `dist svd` (xla = "
                         "jnp.linalg.eigh; qdwh = the in-house QDWH-eig "
                         "D&C -- see docs/PERF.md 'eigh routing')")
    args = p.parse_args(argv)
    if args.stage_schedule and args.cmd not in ("factor", "tsqr", "compare"):
        # ADVICE r4: composite solvers (eigh/svd/polar/...) run internal
        # QRs at their own panel counts; a user schedule cannot sum to all
        # of them and would raise an unrelated trace-time error deep inside.
        p.error("--stage-schedule only applies to the direct QR "
                "factorization subcommands (factor/tsqr/compare)")
    if args.platform == "cpu":  # "tpu" = default platform priority
        import jax
        jax.config.update("jax_platforms", "cpu")
    for dim in ("m", "n", "k", "pr", "pc", "b"):
        if getattr(args, dim, 1) < 1:
            p.error(f"{dim} must be >= 1, got {getattr(args, dim)}")
    if (args.cmd not in ("decomp", "rsvd", "polar")  # those take wide inputs
            and getattr(args, "n", 0) > getattr(args, "m", 0)):
        p.error(f"need n <= m, got m={args.m} n={args.n}")
    return {"factor": cmd_factor, "tsqr": cmd_tsqr, "lstsq": cmd_lstsq,
            "compare": cmd_compare, "oracle": cmd_oracle,
            "caqr": cmd_caqr, "pivoted": cmd_pivoted,
            "batched": cmd_batched, "update": cmd_update,
            "decomp": cmd_decomp, "rsvd": cmd_rsvd,
            "polar": cmd_polar, "eigh": cmd_eigh,
            "svd": cmd_svd, "dist": cmd_dist}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
