"""Run the five BASELINE.json configs and regenerate RESULTS.md.

Usage: python benchmarks/run_all.py [--quick]

Config 5 (distributed CAQR on a v5p-16 mesh) cannot run on this single-chip
environment; it is validated functionally on a virtual 8-device CPU mesh at
reduced size, which exercises the identical shard_map/collective code path
the real mesh would run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timing(r):
    """Uniform timing fields for every TPU row (VERDICT r3 item 4: raw
    steady time, the net-of-RTT device-time estimate, and the measured
    tunnel RTT, so no row can hide under the link-latency floor)."""
    d = {"steady_ms": round(r.steady_s * 1e3, 1),
         "steady_net_ms": round(r.steady_net_s * 1e3, 1),
         "rtt_ms": round(r.rtt_s * 1e3, 1),
         "reps": r.reps}
    if r.flops is not None:
        d["gflops"] = round(r.gflops, 1)
        d["net_gflops"] = round(r.net_gflops, 1)
    return d


def config1_oracle():
    """Unblocked/sliding-panel Householder 1024^2 fp64 on the C oracle."""
    d = os.path.join(REPO, "cuda_qr_tpu", "oracle")
    subprocess.run(["make", "-C", d, "qr_oracle_main"], check=True,
                   capture_output=True)
    out = subprocess.run([os.path.join(d, "qr_oracle_main"),
                          "1024", "1024", "64", "16", "1"],
                         check=True, capture_output=True, text=True)
    rec = json.loads(out.stdout)
    rec["config"] = "1: oracle 1024^2 fp64 (C, sliding-panel)"
    return rec


def config2_blocked(quick: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.ops.blocked import qr_blocked, orgqr, extract_r
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    n = 1024 if quick else 4096
    cfg = QRConfig(dtype=jnp.float32, scan_stages=8)
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    r = bench(lambda a: qr_blocked(a, cfg), A, reps=10, flops=qr_flops(n, n))
    H = jax.lax.Precision.HIGHEST

    @jax.jit
    def resid(A):
        fac = qr_blocked(A, cfg)
        Q = orgqr(fac, n, n, cfg)
        R = extract_r(fac, n)
        return (jnp.linalg.norm(jnp.einsum("ij,jk->ik", Q, R, precision=H) - A)
                / jnp.linalg.norm(A))

    return {"config": f"2: blocked QR {n}^2 fp32 panel 128",
            **_timing(r),
            "residual": float(f"{float(resid(A)):.3e}"),
            "backend": jax.default_backend()}


def config2b_fp64(quick: bool):
    """Config 2's fp64 half.  The v5e MXU has no fp64 datapath (XLA emulates
    it orders of magnitude slower than the HIGHEST-precision fp32 path), so
    the fp64 result is produced on the CPU backend -- the honest equivalent
    of the reference's Scalar=double build (qr.c:11), which also ran on CPU.
    """
    env = dict(os.environ)
    n = 1024 if quick else 4096
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_enable_x64', True);"
        "import numpy as np, jax.numpy as jnp, time, json;"
        "import sys; sys.path.insert(0, %r);"
        "from cuda_qr_tpu.ops.blocked import qr_blocked, orgqr, extract_r;"
        "from cuda_qr_tpu.utils.config import QRConfig;"
        "from cuda_qr_tpu.utils.verify import check_qr;"
        "n=%d;"
        "cfg=QRConfig(dtype=jnp.float64, use_pallas=False, scan_stages=8);"
        "rng=np.random.default_rng(12);"
        "A=rng.standard_normal((n,n));"
        "t0=time.time(); fac=qr_blocked(jnp.asarray(A), cfg);"
        "Q=orgqr(fac,n,n,cfg); R=extract_r(fac,n);"
        "Q.block_until_ready(); dt=time.time()-t0;"
        "c=check_qr(A,np.asarray(Q),np.asarray(R));"
        "print(json.dumps({'residual':c.residual,'orthogonality':"
        "c.orthogonality,'wall_s':round(dt,1),"
        "'n_eps':n*float(c.eps)}))" % (REPO, n))
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["config"] = (f"2b: blocked QR {n}^2 fp64 (CPU backend -- no fp64 "
                     "MXU on TPU; reference's Scalar=double was CPU too)")
    return rec


def config3_tsqr(quick: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.models.tsqr import tsqr
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    m = 131072 if quick else 1_048_576
    n = 128
    cfg = QRConfig(dtype=jnp.float32, block_rows=1024, tsqr_leaf="cholqr2")
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    # reps=30: at reps=10 the row sat within ~RTT/reps of the pure link
    # latency on a 100 ms-RTT day (VERDICT r3) -- device time was unresolved
    r = bench(lambda a: tsqr(a, cfg), A, reps=30, flops=qr_flops(m, n))
    H = jax.lax.Precision.HIGHEST
    Q, R = tsqr(A, cfg)
    resid = float(jnp.linalg.norm(
        jnp.einsum("ij,jk->ik", Q, R, precision=H) - A) / jnp.linalg.norm(A))
    orth = float(jnp.linalg.norm(
        jnp.einsum("ij,ik->jk", Q, Q, precision=H)
        - jnp.eye(n, dtype=Q.dtype)))
    # Speed of light from the r5 trace accounting (docs/PERF.md "TSQR
    # speed of light"): the Gram pass streams at the fp32 operand-split
    # feed rate (~360 GB/s, precision-insensitive -- measured), the Q pass
    # at HBM peak (~819 GB/s), plus ~0.2 ms chol-chain glue.
    sol_ms = (m * n * 4 / 360e9 + 2 * m * n * 4 / 819e9) * 1e3 + 0.2
    eps = float(jnp.finfo(jnp.float32).eps)
    return {"config": f"3: TSQR {m}x{n} fp32 (cholqr2 leaves)",
            **_timing(r),
            "sol_ms": round(sol_ms, 2),
            "residual": float(f"{resid:.3e}"),
            # sqrt(m)*eps floor for Gram-based paths (docs/PERF.md);
            # n*eps orthogonality needs tsqr_leaf="householder"
            "orthogonality": float(f"{orth:.3e}"),
            "orth_ok_sqrt_m": bool(orth < 4 * np.sqrt(m) * eps),
            "backend": jax.default_backend()}


def config4_lstsq(quick: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.models.lstsq import lstsq
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench

    m, n = (2048, 512) if quick else (8192, 2048)
    cfg = QRConfig(dtype=jnp.float32, scan_stages=8)
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    x_true = jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32))
    b = A @ x_true
    r = bench(lambda a, bb: lstsq(a, bb, cfg), A, b, reps=10)
    res = lstsq(A, b, cfg)
    err = float(jnp.max(jnp.abs(res.x - x_true)) / jnp.max(jnp.abs(x_true)))
    return {"config": f"4: lstsq (orgqr/ormqr + trsm) {m}x{n} fp32",
            **_timing(r),
            "x_rel_err": float(f"{err:.3e}"),
            "backend": jax.default_backend()}


def config5_caqr():
    """Functional validation of distributed CAQR on a virtual CPU mesh."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    code = (
        "import os; os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')"
        "+' --xla_force_host_platform_device_count=8';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import numpy as np, jax.numpy as jnp, time, json;"
        "import sys; sys.path.insert(0, %r);"
        "from cuda_qr_tpu.models.caqr import caqr;"
        "from cuda_qr_tpu.parallel.mesh import row_mesh;"
        "from cuda_qr_tpu.utils.config import QRConfig;"
        "from cuda_qr_tpu.utils.verify import check_qr;"
        "cfg=QRConfig(panel_width=32, dtype=jnp.float32, use_pallas=False);"
        "rng=np.random.default_rng(12); A=rng.standard_normal((1024,512))"
        ".astype(np.float32);"
        "t0=time.time(); Q,R=caqr(jnp.asarray(A), row_mesh(8), cfg);"
        "Q.block_until_ready(); dt=time.time()-t0;"
        "c=check_qr(A,np.asarray(Q),np.asarray(R));"
        "print(json.dumps({'residual':c.residual,'orthogonality':"
        "c.orthogonality,'wall_s':round(dt,1)}))" % REPO)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["config"] = ("5: distributed CAQR, 8-shard virtual mesh 1024x512 "
                     "fp32 (v5p-16 65536^2 needs real multi-chip)")
    return rec



def extras_decomp(quick: bool):
    """Beyond-parity: LQ of a wide fp32 matrix (scipy-family surface)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.models.decomp import lq
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    m, n = (512, 1024) if quick else (4096, 8192)
    cfg = QRConfig(dtype=jnp.float32, scan_stages=8)
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    r = bench(lambda a: lq(a, cfg), A, reps=10, flops=qr_flops(n, m))
    L, Q = lq(A, cfg)
    L64 = np.asarray(L, np.float64)
    Q64 = np.asarray(Q, np.float64)
    A64 = np.asarray(A, np.float64)
    resid = float(np.linalg.norm(L64 @ Q64 - A64) / np.linalg.norm(A64))
    return {"config": f"x1: LQ {m}x{n} fp32 (wide)",
            **_timing(r),
            "residual": float(f"{resid:.3e}"),
            "backend": jax.default_backend()}


def extras_rsvd(quick: bool):
    """Beyond-parity: randomized SVD of a tall matrix with spectral decay."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.models.rsvd import rsvd
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench

    m, n, k = (4096, 256, 32) if quick else (65536, 512, 64)
    cfg = QRConfig(dtype=jnp.float32)
    rng = np.random.default_rng(12)
    # geometric spectrum: rank-k truncation error is s_{k+1} = 0.9^k
    r_full = n
    U = np.linalg.qr(rng.standard_normal((m, r_full)))[0]
    V = np.linalg.qr(rng.standard_normal((n, r_full)))[0]
    sv = 0.9 ** np.arange(r_full)
    A = jnp.asarray(((U * sv) @ V.T).astype(np.float32))
    r = bench(lambda a: rsvd(a, k, n_iter=2, config=cfg), A, reps=10)
    Uk, sk, Vtk = rsvd(A, k, n_iter=2, config=cfg)
    err = float(np.linalg.norm(
        (np.asarray(Uk, np.float64) * np.asarray(sk, np.float64))
        @ np.asarray(Vtk, np.float64) - np.asarray(A, np.float64), 2))
    return {"config": f"x2: rsvd {m}x{n} rank {k} (q=2)",
            **_timing(r),
            "err2": float(f"{err:.3e}"),
            "s_next": float(f"{0.9 ** k:.3e}"),
            "backend": jax.default_backend()}


def extras_eigh_rand(quick: bool):
    """Beyond-parity: randomized Hermitian eigendecomposition (indefinite
    alternating-sign spectrum -- the case a Nystrom approximation cannot
    handle)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.models.rsvd import eigh_rand
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench

    m, k = (1024, 16) if quick else (8192, 64)
    cfg = QRConfig(dtype=jnp.float32)
    rng = np.random.default_rng(12)
    r_full = min(m, 4 * k)
    V = np.linalg.qr(rng.standard_normal((m, r_full)))[0]
    w = 0.9 ** np.arange(r_full) * np.where(np.arange(r_full) % 2, -1., 1.)
    A = jnp.asarray(((V * w) @ V.T).astype(np.float32))
    r = bench(lambda a: eigh_rand(a, k, n_iter=2, config=cfg), A, reps=10)
    wk, Vk = eigh_rand(A, k, n_iter=2, config=cfg)
    wk, Vk = np.asarray(wk, np.float64), np.asarray(Vk, np.float64)
    err = float(np.linalg.norm(
        (Vk * wk) @ Vk.T - np.asarray(A, np.float64), 2))
    return {"config": f"x5: eigh_rand {m}^2 rank {k} (q=2, indefinite)",
            **_timing(r),
            "err2": float(f"{err:.3e}"),
            "w_next": float(f"{0.9 ** k:.3e}"),
            "backend": jax.default_backend()}


def extras_polar(quick: bool):
    """Beyond-parity: QDWH polar decomposition (SVD-free, all MXU work)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from cuda_qr_tpu.models.polar import polar
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench

    m, n = (512, 256) if quick else (4096, 2048)
    cfg = QRConfig(dtype=jnp.float32, scan_stages=4)
    rng = np.random.default_rng(12)
    # cond ~1e4 so the full QDWH schedule (QR + Cholesky steps) is exercised
    k = n
    U = np.linalg.qr(rng.standard_normal((m, k)))[0]
    V = np.linalg.qr(rng.standard_normal((k, k)))[0]
    sv = np.geomspace(1.0, 1e-4, k)
    A = jnp.asarray(((U * sv) @ V).astype(np.float32))
    r = bench(lambda a: polar(a, config=cfg), A, reps=10)
    Up, Hp = polar(A, config=cfg)
    Up64 = np.asarray(Up, np.float64)
    Hp64 = np.asarray(Hp, np.float64)
    A64 = np.asarray(A, np.float64)
    orth = float(np.linalg.norm(Up64.T @ Up64 - np.eye(k)))
    resid = float(np.linalg.norm(Up64 @ Hp64 - A64) / np.linalg.norm(A64))
    return {"config": f"x4: polar (QDWH) {m}x{n} fp32 cond 1e4",
            **_timing(r),
            "residual": float(f"{resid:.3e}"),
            "orthogonality": float(f"{orth:.3e}"),
            "backend": jax.default_backend()}


def extras_mixed(quick: bool):
    """Mixed-precision blocked QR: MIXED_CONFIG runs the trailing/orgqr
    GEMMs at HIGH precision (bf16x3 on the MXU) with fp32 panel math --
    the dtype axis the reference exposes as the compile-time Scalar macro
    (qr.cu:17), recast as a precision preset instead of a rebuild."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.ops.blocked import qr_blocked, orgqr, extract_r
    from cuda_qr_tpu.utils.config import MIXED_CONFIG
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    n = 1024 if quick else 4096
    cfg = MIXED_CONFIG.replace(dtype=jnp.float32, scan_stages=8)
    rng = np.random.default_rng(12)
    A = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    r = bench(lambda a: qr_blocked(a, cfg), A, reps=10, flops=qr_flops(n, n))
    fac = qr_blocked(A, cfg)
    Q64 = np.asarray(orgqr(fac, n, n, cfg), np.float64)
    R64 = np.asarray(extract_r(fac, n), np.float64)
    A64 = np.asarray(A, np.float64)
    resid = float(np.linalg.norm(Q64 @ R64 - A64) / np.linalg.norm(A64))
    orth = float(np.linalg.norm(Q64.T @ Q64 - np.eye(n)))
    return {"config": f"x6: blocked QR {n}^2 MIXED (bf16x3 trailing, fp32 panels)",
            **_timing(r),
            "residual": float(f"{resid:.3e}"),
            "orthogonality": float(f"{orth:.3e}"),
            "backend": jax.default_backend()}


def extras_mosaic():
    """Compiled-mode (Mosaic, interpret=False) check + timing of the two
    custom Pallas kernels on the real device.  CI exercises them
    interpret-only (tests/conftest.py), so this row is the driver-visible
    evidence the kernels compile and run through the actual Mosaic stack."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.ops.pallas_chol import chol_with_inv_pallas
    from cuda_qr_tpu.ops.pallas_select import select_pivots_pallas
    from cuda_qr_tpu.utils.timing import bench

    rng = np.random.default_rng(12)
    nb = 128
    # SPD Gram with unit diagonal dominance, the qr_blocked shape
    X = rng.standard_normal((1024, nb)).astype(np.float32)
    G = jnp.asarray(X.T @ X / 1024 + 0.1 * np.eye(nb, dtype=np.float32))
    # A ~100 us kernel cannot be resolved by repeated dispatch through the
    # tunnel: reps=10 leaves the whole per-rep time at RTT/reps (the r4
    # first cut printed 0.0), and reps=1000 pays ~0.3-0.6 s of per-call
    # dispatch ack EACH -- observed wedged >19 min.  Instead loop the
    # kernel K times INSIDE one jitted program with a data dependency
    # (G -> L -> G' = L L^T, numerically a fixed point), so ONE dispatch
    # yields K device iterations; per-iteration time = steady_net/K, an
    # upper bound on the kernel cost (includes one nb^3 reform GEMM).
    K = 100
    H = jax.lax.Precision.HIGHEST

    @jax.jit
    def chol_loop(G):
        def body(_, Gc):
            L, Li = chol_with_inv_pallas(Gc, interpret=False)
            return jnp.einsum("ij,kj->ik", L, L, precision=H)
        return jax.lax.fori_loop(0, K, body, G)

    rc = bench(chol_loop, G, reps=3)
    L, Li = chol_with_inv_pallas(G, interpret=False)
    L64, Li64 = np.asarray(L, np.float64), np.asarray(Li, np.float64)
    G64 = np.asarray(G, np.float64)
    chol_err = float(np.linalg.norm(L64 @ L64.T - G64)
                     / np.linalg.norm(G64))
    inv_err = float(np.linalg.norm(Li64 @ L64 - np.eye(nb)))

    l, cand = 128, 512
    Sc = jnp.asarray(rng.standard_normal((l, cand)).astype(np.float32))
    norms = jnp.asarray((np.asarray(Sc) ** 2).sum(0))
    @jax.jit
    def select_loop(s, nn):
        def body(_, s):
            order = select_pivots_pallas(s, nn, nb, interpret=False)
            # Serializing data dependency that leaves s bit-identical:
            # sum(order) <= nb*cand ~ 6.5e4, scaled by 1e-30 it underflows
            # below one ulp of the O(1) scores -- but the kernel output is
            # opaque to XLA, so the iterations cannot be collapsed.
            dep = jnp.sum(order).astype(s.dtype) * s.dtype.type(1e-30)
            return s + dep
        return jax.lax.fori_loop(0, K, body, s)

    rs = bench(select_loop, Sc, norms, reps=3)
    order = np.asarray(select_pivots_pallas(Sc, norms, nb, interpret=False))
    nsel = int((order >= 0).sum())
    return {"config": "x7: Mosaic kernels compiled (chol+inv 128, "
                      "pivot-select 128/512)",
            "chol_us": round(rc.steady_net_s * 1e6 / K, 1),
            "select_us": round(rs.steady_net_s * 1e6 / K, 1),
            "rtt_ms": round(rc.rtt_s * 1e3, 1),
            "loop_k": K, "reps": 3,
            "timing_form": "K-deep in-graph loop per dispatch; per-iter "
                           "upper bound (chol row includes one nb^3 "
                           "reform GEMM)",
            "chol_resid": float(f"{chol_err:.3e}"),
            "inv_resid": float(f"{inv_err:.3e}"),
            "pivots_selected": nsel,
            "ok": bool(chol_err < 1e-5 and inv_err < 1e-4 and nsel == nb),
            "backend": jax.default_backend()}


def extras_eigh(quick: bool):
    """Beyond-parity: deterministic QDWH-eig Hermitian eigendecomposition
    (spectral divide-and-conquer over in-house polar/QRCP; models/eigh.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cuda_qr_tpu.models.eigh import eigh
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench

    n = 256 if quick else 1024
    cfg = QRConfig(dtype=jnp.float32, scan_stages=4)
    rng = np.random.default_rng(12)
    G = rng.standard_normal((n, n))
    A = jnp.asarray(((G + G.T) / np.sqrt(2 * n)).astype(np.float32))
    r = bench(lambda a: eigh(a, cfg), A, reps=10)
    w, V = eigh(A, cfg)
    w64, V64 = np.asarray(w, np.float64), np.asarray(V, np.float64)
    A64 = np.asarray(A, np.float64)
    resid = float(np.linalg.norm(A64 @ V64 - V64 * w64[None, :])
                  / np.linalg.norm(A64))
    orth = float(np.linalg.norm(V64.T @ V64 - np.eye(n)))
    werr = float(np.abs(np.sort(w64) - np.linalg.eigvalsh(A64)).max()
                 / np.abs(w64).max())
    return {"config": f"x8: eigh (QDWH-eig D&C) {n}^2 fp32",
            **_timing(r),
            "residual": float(f"{resid:.3e}"),
            "orthogonality": float(f"{orth:.3e}"),
            "eigval_rel_err": float(f"{werr:.3e}"),
            "backend": jax.default_backend()}


def extras_eigh_large(quick: bool):
    """In-house eigh at the compile-cap boundary (n=4096) vs jnp.linalg.eigh
    on the same matrix: the routing-rule evidence (docs/PERF.md "eigh
    routing") as a driver-reproducible row.  Uses the explicit
    scan_stages=1 config the large-n router selects."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cuda_qr_tpu.models.eigh import eigh
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench

    n = 512 if quick else 4096
    cfg = QRConfig(dtype=jnp.float32, scan_stages=1)
    rng = np.random.default_rng(7)
    G = rng.standard_normal((n, n)).astype(np.float32)
    S = (G + G.T) / np.sqrt(2 * n)
    Sd = jnp.asarray(S)
    r_own = bench(lambda a: eigh(a, cfg), Sd, reps=5)
    r_xla = bench(jax.jit(jnp.linalg.eigh), Sd, reps=10)
    w, V = eigh(Sd, cfg)
    w64, V64 = np.asarray(w, np.float64), np.asarray(V, np.float64)
    S64 = S.astype(np.float64)
    resid = float(np.linalg.norm(S64 @ V64 - V64 * w64[None, :])
                  / np.linalg.norm(S64))
    orth = float(np.linalg.norm(V64.T @ V64 - np.eye(n)))
    werr = float(np.abs(np.sort(w64) - np.linalg.eigvalsh(S64)).max()
                 / np.abs(w64).max())
    return {"config": f"x11: eigh {n}^2 in-house (scan_stages=1 routing) "
                      "vs jnp.linalg.eigh",
            "own_net_ms": round(r_own.steady_net_s * 1e3, 1),
            "xla_net_ms": round(r_xla.steady_net_s * 1e3, 1),
            "ratio": round(r_own.steady_net_s / r_xla.steady_net_s, 2),
            "rtt_ms": round(r_own.rtt_s * 1e3, 1),
            "residual": float(f"{resid:.3e}"),
            "orthogonality": float(f"{orth:.3e}"),
            "eigval_rel_err": float(f"{werr:.3e}"),
            "backend": jax.default_backend()}


def extras_bf16(quick: bool):
    """True bf16 END-TO-END factorization (dtype=bfloat16 through storage,
    panels upcast internally, bf16 trailing) + one fp32 CholeskyQR
    refinement of the explicit Q.  Design rule (docs/PERF.md "bf16
    end-to-end"): refinement recovers fp32-grade ORTHOGONALITY (CholeskyQR
    squares the error) while the residual stays at the bf16 backward-error
    scale -- a basis factory, not a solver path.  Both numbers published
    so the claim is data.  Reference analog: the compile-time Scalar dtype
    axis (qr.cu:17)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.ops.blocked import qr_blocked, orgqr, extract_r
    from cuda_qr_tpu.ops.smalllinalg import cholesky_with_inv
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    n = 1024 if quick else 4096
    cfg = QRConfig(dtype=jnp.bfloat16, scan_stages=8)
    rng = np.random.default_rng(12)
    A_np = rng.standard_normal((n, n)).astype(np.float32)
    Ab = jnp.asarray(A_np).astype(jnp.bfloat16)
    A32 = jnp.asarray(A_np)
    r = bench(lambda a: qr_blocked(a, cfg), Ab, reps=10, flops=qr_flops(n, n))
    H = jax.lax.Precision.HIGHEST

    @jax.jit
    def factors_and_refine(Ab, A32):
        fac = qr_blocked(Ab, cfg)
        Qb = orgqr(fac, n, n, cfg).astype(jnp.float32)
        Rb = extract_r(fac, n).astype(jnp.float32)
        # fp32 CholeskyQR refinement: S = chol(Q^T Q), Q' = Q S^{-T},
        # R' = triu(Q'^T A)
        G = jnp.einsum("ij,ik->jk", Qb, Qb, precision=H)
        _, Li = cholesky_with_inv(G, precision=H)
        Qr = jnp.einsum("ij,kj->ik", Qb, Li, precision=H)
        Rr = jnp.triu(jnp.einsum("ij,ik->jk", Qr, A32, precision=H))
        return Qb, Rb, Qr, Rr

    Qb, Rb, Qr, Rr = (np.asarray(x, np.float64)
                      for x in factors_and_refine(Ab, A32))
    A64 = A_np.astype(np.float64)
    nrm = np.linalg.norm(A64)
    eye = np.eye(n)
    raw_res = float(np.linalg.norm(Qb @ Rb - A64) / nrm)
    raw_orth = float(np.linalg.norm(Qb.T @ Qb - eye))
    ref_res = float(np.linalg.norm(Qr @ Rr - A64) / nrm)
    ref_orth = float(np.linalg.norm(Qr.T @ Qr - eye))
    eps32 = float(np.finfo(np.float32).eps)
    eps_bf16 = 2.0 ** -8
    return {"config": f"x9: bf16 END-TO-END QR {n}^2 + fp32 CholeskyQR "
                      "refinement (basis factory)",
            **_timing(r),
            "raw_residual": float(f"{raw_res:.3e}"),
            "raw_orthogonality": float(f"{raw_orth:.3e}"),
            "refined_residual": float(f"{ref_res:.3e}"),
            "refined_orthogonality": float(f"{ref_orth:.3e}"),
            # basis-factory contract: refined orthogonality at fp32 n*eps
            # grade; residual bounded by the bf16 backward error (it
            # cannot be refined away -- docs/PERF.md)
            "ok": bool(ref_orth < n * eps32 * 4 and ref_res < 8 * eps_bf16),
            "backend": jax.default_backend()}


def extras_host_to_host(quick: bool):
    """End-to-end host->factor->host timing at the headline size -- the
    reference's own timing discipline INCLUDED cudaMalloc + H2D/D2H inside
    mmqr (qr.cu:493-498,548-552), so this row makes the comparison
    explicit.  Every other row deliberately times device work only; here
    the transfer share is broken out (through the axon tunnel it is large
    and bandwidth-, not compute-, bound)."""
    import time as _time
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cuda_qr_tpu.ops.blocked import qr_blocked
    from cuda_qr_tpu.utils.config import QRConfig
    from cuda_qr_tpu.utils.timing import bench, qr_flops

    n = 1024 if quick else 8192
    cfg = QRConfig(dtype=jnp.float32,
                   scan_stages=32 if not quick else 4)
    rng = np.random.default_rng(12)
    A_np = rng.standard_normal((n, n)).astype(np.float32)

    def h2h():
        Ad = jnp.asarray(A_np)              # H2D
        fac = qr_blocked(Ad, cfg)
        _ = np.asarray(fac.packed)          # D2H (packed V/R, n x n)
        _ = np.asarray(fac.taus)
        return fac

    h2h()  # compile + warm
    t0 = _time.perf_counter()
    reps = 3
    for _ in range(reps):
        h2h()
    h2h_s = (_time.perf_counter() - t0) / reps
    # device-only reference number from the same warm executable
    r = bench(lambda a: qr_blocked(a, cfg), jnp.asarray(A_np), reps=10,
              flops=qr_flops(n, n))
    xfer_ms = h2h_s * 1e3 - r.steady_net_s * 1e3
    mb = 2 * (n * n * 4) / 1e6  # H2D + D2H payload
    return {"config": f"x10: host-to-host QR {n}^2 fp32 "
                      "(H2D + factor + D2H, reference timing discipline)",
            "h2h_ms": round(h2h_s * 1e3, 1),
            "device_net_ms": round(r.steady_net_s * 1e3, 1),
            "transfer_share_ms": round(xfer_ms, 1),
            "payload_mb": round(mb, 1),
            "eff_link_mbps": round(mb / max(xfer_ms * 1e-3, 1e-9), 1),
            "backend": jax.default_backend()}


def extras_lstsq_dist():
    """Beyond-parity: distributed lstsq on the virtual 8-device mesh
    (augmented-matrix CAQR; correctness, not wall-clock)."""
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags +
                            " --xla_force_host_platform_device_count=8")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "import numpy as np, jax.numpy as jnp, json;"
        "from cuda_qr_tpu.models.lstsq import lstsq_dist;"
        "from cuda_qr_tpu.parallel.mesh import row_mesh;"
        "from cuda_qr_tpu.utils.config import QRConfig;"
        "mesh = row_mesh(8);"
        "cfg = QRConfig(use_pallas=False);"
        "rng = np.random.default_rng(12);"
        "A = rng.standard_normal((2048, 256)).astype(np.float32);"
        "b = rng.standard_normal((2048, 4)).astype(np.float32);"
        "sol = lstsq_dist(jnp.asarray(A), jnp.asarray(b), mesh, cfg);"
        "ref = np.linalg.lstsq(A.astype(np.float64), b.astype(np.float64),"
        " rcond=None)[0];"
        "err = float(np.abs(np.asarray(sol.x) - ref).max());"
        "print(json.dumps({'x_max_err': float('%%.3e' %% err),"
        " 'ok': bool(err < 256 * 2e-6)}))" % REPO)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["config"] = "x3: lstsq_dist 2048x256 rhs 4 (P=8 virtual mesh)"
    return rec


# key -> (thunk factory).  Row identity in RESULTS.md is the text before
# the first ':' of the "config" field, so --only reruns replace in place.
def _registry(quick: bool):
    return [
        ("1", config1_oracle),
        ("2", lambda: config2_blocked(quick)),
        ("2b", lambda: config2b_fp64(quick)),
        ("3", lambda: config3_tsqr(quick)),
        ("4", lambda: config4_lstsq(quick)),
        ("5", config5_caqr),
        ("x1", lambda: extras_decomp(quick)),
        ("x2", lambda: extras_rsvd(quick)),
        ("x5", lambda: extras_eigh_rand(quick)),
        ("x4", lambda: extras_polar(quick)),
        ("x3", extras_lstsq_dist),
        ("x6", lambda: extras_mixed(quick)),
        ("x7", extras_mosaic),
        ("x8", lambda: extras_eigh(quick)),
        ("x9", lambda: extras_bf16(quick)),
        ("x10", lambda: extras_host_to_host(quick)),
        ("x11", lambda: extras_eigh_large(quick)),
    ]


def _existing_rows(path):
    """config-key -> full table line, parsed from the current RESULTS.md."""
    rows = {}
    if not os.path.exists(path):
        return rows
    for line in open(path):
        line = line.rstrip("\n")
        if line.startswith("| ") and ": " in line and "{" in line:
            key = line[2:].split(":", 1)[0].strip()
            rows[key] = line
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated config keys (e.g. 2,3,x6); "
                         "other rows are kept from the existing RESULTS.md")
    args = ap.parse_args()
    reg = _registry(args.quick)
    only = set(args.only.split(",")) if args.only else None
    results_path = os.path.join(REPO, "RESULTS.md")
    old_rows = _existing_rows(results_path)
    if only:
        unknown = only - {k for k, _ in reg}
        if unknown:
            ap.error(f"unknown config keys: {sorted(unknown)}")

    lines_by_key = {}
    for key, fn in reg:
        if only is not None and key not in only:
            if key in old_rows:
                lines_by_key[key] = old_rows[key]
            continue
        t0 = time.time()
        try:
            rec = fn()
        except Exception as e:  # keep the sweep alive; record the failure
            rec = {"config": f"{key}: FAILED", "error": repr(e)[:200]}
        rec["elapsed_s"] = round(time.time() - t0, 1)
        print(json.dumps(rec), flush=True)
        cfg = rec.pop("config")
        lines_by_key[key] = f"| {cfg} | {json.dumps(rec)} |"

    lines = ["# RESULTS — BASELINE.json configs",
             "",
             "Generated by `python benchmarks/run_all.py`. Hardware: one TPU",
             "v5e chip via the axon tunnel (configs 2-4, x1-x2, x4-x10); x86",
             "host (configs 1 and 2b, native C oracle / CPU XLA); virtual",
             "8-device CPU mesh (configs 5 and x3).",
             "", "| Config | Result |", "|---|---|"]
    lines += [lines_by_key[k] for k, _ in reg if k in lines_by_key]
    lines += ["", MESH_SCALING.rstrip(), "", FEASIBILITY_65536.rstrip()]
    with open(results_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote RESULTS.md")


MESH_SCALING = """\
## Mesh-width scaling (virtual CPU mesh; correctness, not wall-clock)

The shard_map/collective CAQR path at wider meshes than config 5's P=8
(`python -m cuda_qr_tpu --platform cpu caqr ...` with
`--xla_force_host_platform_device_count=P`; virtual CPU devices share one
host, so only residual/orthogonality are meaningful):

| P | layout | size | residual | orthogonality | ok |
|---|---|---|---|---|---|
| 16 | cyclic | 2048x1024 | 1.83e-06 | 4.32e-05 | yes |
| 32 | block | 4096x1024 | 1.89e-06 | 2.95e-05 | yes |

(Both rows re-run after the depth-1 lookahead restructure of the bk panel
loop -- residual/orthogonality unchanged at print precision, confirming
the carried next-panel block is numerically transparent at wide meshes.)
"""

FEASIBILITY_65536 = """\
## Config 5 at full scale: 65536^2 fp32 on a v5p-16 (feasibility)

Real multi-chip hardware is not reachable from this environment; the
identical shard_map/collective code path is validated on the virtual CPU
mesh (table above, plus a 16384x8192 block-cyclic run recorded in
docs/PERF.md).  The resource math for the target config, P = 16 shards,
nb = 128, block-cyclic rows, basis-kernel (BK) combine:

- **HBM per shard**: the row block is (65536/16) x 65536 x 4 B = 1.07 GB;
  with leaf taus/Ts ((512, 128) + (512, 128, 128) fp32 = 34 MB), BK tree
  factors (Y_i/N/S per panel: 512 x (2 x 128^2 + 128) x 4 B = 67 MB), and
  an orgqr accumulator of the same 1.07 GB, peak < 2.5 GB of the 95 GB
  v5p HBM -- memory is a non-issue; the same mesh could factor ~400k^2.
- **Collective words per panel (BK)**: 2 psums of nb^2 (Gram + round 2),
  one all_gather of nb^2 per shard (M blocks), one psum of nb x w for the
  trailing update.  Summed over k = 512 panels, the psum(nb x w) term
  dominates: sum_k 128 x (65536 - 128k) x 4 B = 8.6 GB of reduced words --
  at ~100 GB/s/link ICI (v5p torus, bidirectional), ~0.1-0.2 s total; the
  allgather combine would move P x that (137 GB, ~2 s), the butterfly
  log2(P) x (34 GB).
- **Flops**: (4/3) x 65536^3 = 3.75e17 FLOP at fp32-HIGHEST (~26.5 TF/s
  per v5e-class chip, higher on v5p) -> ~880 s on 16 chips at MXU-bound
  efficiency; leaf panel chains add k x O(ms) ~ a few seconds.  The job is
  compute-bound by 2-3 orders of magnitude over communication, so the BK
  combine's win shows up as latency hiding, not wall-clock dominance, at
  P = 16 -- it becomes load-bearing at the P ~ 256 pod scale where the
  allgather's P x nb x w words per panel would exceed the GEMM time.
- **Checkpointing**: caqr_factor_resumable at every=8 writes state.npz
  (1.07 GB/shard) every ~14 s of compute plus 540 KB per finished panel --
  ~2 percent overhead at ~0.5 GB/s disk.
"""


if __name__ == "__main__":
    main()
