"""In-house Hermitian eigensolver (QDWH-eig divide-and-conquer + Jacobi).

Accuracy is asserted against numpy float64 LAPACK; the point of the module
is that NO stage delegates to an XLA/LAPACK eigensolver (models/eigh.py).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import cuda_qr_tpu as ctq
from cuda_qr_tpu.models.eigh import _jacobi_eigh, _round_robin, eigh

CFG = ctq.QRConfig(dtype=jnp.float32, panel_width=16, scan_stages=2)


@pytest.fixture
def rng():
    return np.random.default_rng(12)


def _check(A, w, V, tol):
    wdt = np.complex128 if np.iscomplexobj(A) else np.float64
    A64 = np.asarray(A, wdt)
    V = np.asarray(V, wdt)
    w = np.asarray(w, np.float64)
    n = A.shape[0]
    resid = (np.linalg.norm(A64 @ V - V * w[None, :])
             / max(np.linalg.norm(A64), 1e-30))
    orth = np.linalg.norm(V.conj().T @ V - np.eye(n))
    assert resid < tol * n, f"resid {resid:.2e}"
    assert orth < tol * n, f"orth {orth:.2e}"
    w_ref = np.linalg.eigvalsh(A64)
    assert (np.diff(w) >= -tol * np.abs(w).max()).all()
    assert np.abs(np.sort(w) - w_ref).max() < tol * n * max(
        np.abs(w_ref).max(), 1.0)


def test_round_robin_covers_all_pairs():
    for n in (4, 8, 14):
        s = _round_robin(n)
        assert s.shape == (n - 1, n // 2, 2)
        pairs = set(map(tuple, s.reshape(-1, 2)))
        assert len(pairs) == n * (n - 1) // 2
        for r in s:  # each round is a perfect matching
            flat = r.reshape(-1)
            assert len(set(flat.tolist())) == n


def test_jacobi_base_f32(rng):
    n = 48
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    w, V = _jacobi_eigh(jnp.asarray(A), jnp.asarray(_round_robin(n)))
    _check(A, w, V, 5e-6)


def test_jacobi_base_f64(rng):
    n = 32
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    w, V = _jacobi_eigh(jnp.asarray(A), jnp.asarray(_round_robin(n)))
    _check(A, w, V, 1e-13)


def test_jacobi_base_complex(rng):
    n = 24
    A = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))).astype(np.complex64)
    A = (A + A.conj().T) / 2
    w, V = _jacobi_eigh(jnp.asarray(A), jnp.asarray(_round_robin(n)))
    _check(A, w, V, 5e-6)


def test_eigh_dc_f32(rng):
    n = 96  # forces at least one divide level (base_n=32)
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    w, V = eigh(A, CFG, base_n=32, bucket=16)
    _check(A, w, V, 1e-5)


def test_eigh_dc_f64(rng):
    n = 80
    A = rng.standard_normal((n, n))
    A = (A + A.T) / 2
    w, V = eigh(A, config=ctq.QRConfig(dtype=jnp.float64, panel_width=16,
                                       scan_stages=2),
                base_n=32, bucket=16)
    _check(A, w, V, 1e-12)


def test_eigh_clustered_and_repeated(rng):
    # repeated eigenvalues + a tight cluster: the projector split must not
    # corrupt multiplicities, and sigma retries must step off clusters
    n = 64
    w_true = np.concatenate([
        np.full(20, 1.0), np.full(20, 1.0 + 3e-3), np.linspace(2, 5, 24)])
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = (Q * w_true) @ Q.T
    A = ((A + A.T) / 2).astype(np.float32)
    w, V = eigh(A, CFG, base_n=32, bucket=16)
    _check(A, w, V, 2e-5)


def test_eigh_near_identity(rng):
    # one-cluster spectrum: the early-out path (A ~ c I)
    n = 48
    A = np.eye(n, dtype=np.float32) * 3.0
    A += 1e-7 * (lambda G: (G + G.T) / 2)(
        rng.standard_normal((n, n)).astype(np.float32))
    w, V = eigh(A, CFG, base_n=32, bucket=16)
    assert np.abs(np.asarray(w) - 3.0).max() < 1e-5
    _check(A, w, V, 1e-5)


def test_eigh_odd_size_bucketing(rng):
    # n not a multiple of the bucket: sentinel padding must strip cleanly
    n = 45
    A = rng.standard_normal((n, n)).astype(np.float32)
    A = (A + A.T) / 2
    w, V = eigh(A, CFG, base_n=16, bucket=16)
    assert w.shape == (n,) and V.shape == (n, n)
    _check(A, w, V, 1e-5)


def test_eigh_errors():
    with pytest.raises(ctq.QRShapeError):
        eigh(np.zeros((3, 4), np.float32))


def test_eigh_batched(rng):
    from cuda_qr_tpu.models.eigh import eigh_batched
    B, n = 5, 24
    As = rng.standard_normal((B, n, n)).astype(np.float32)
    As = (As + np.swapaxes(As, 1, 2)) / 2
    ws, Vs = eigh_batched(As)
    assert ws.shape == (B, n) and Vs.shape == (B, n, n)
    for b in range(B):
        _check(As[b], ws[b], Vs[b], 5e-6)


def test_eigh_batched_odd_n(rng):
    from cuda_qr_tpu.models.eigh import eigh_batched
    B, n = 3, 15  # odd n exercises the decoupled pad row + strip
    As = rng.standard_normal((B, n, n)).astype(np.float32)
    As = (As + np.swapaxes(As, 1, 2)) / 2
    ws, Vs = eigh_batched(As)
    assert ws.shape == (B, n) and Vs.shape == (B, n, n)
    for b in range(B):
        _check(As[b], ws[b], Vs[b], 5e-6)


def test_svd_qdwh_eigh_routing(rng):
    # svd(eigh_impl='qdwh'): no XLA eigensolver anywhere in the pipeline
    A = rng.standard_normal((64, 40)).astype(np.float32)
    U, s, Vh = ctq.svd(A, config=CFG, eigh_impl="qdwh")
    U, s, Vh = (np.asarray(x, np.float64) for x in (U, s, Vh))
    assert np.linalg.norm((U * s) @ Vh - A) / np.linalg.norm(A) < 2e-5
    s_ref = np.linalg.svd(A.astype(np.float64), compute_uv=False)
    assert np.abs(s - s_ref).max() < 2e-4 * s_ref[0]
    assert (np.diff(s) <= 1e-6).all()
    with pytest.raises(ValueError):
        ctq.svd(A, eigh_impl="nope")


def test_large_n_compile_routing():
    """n >= 3072 with the untouched default scan_stages routes to the
    single-stage QR driver (compile-cap fix, docs/PERF.md); explicit
    configs are never overridden."""
    from cuda_qr_tpu.models.eigh import _route_large_n
    from cuda_qr_tpu.utils.config import DEFAULT_CONFIG

    assert _route_large_n(4096, DEFAULT_CONFIG).scan_stages == 1
    assert _route_large_n(2048, DEFAULT_CONFIG).scan_stages == \
        DEFAULT_CONFIG.scan_stages
    explicit = DEFAULT_CONFIG.replace(scan_stages=8)
    assert _route_large_n(4096, explicit).scan_stages == 8


def test_route_large_n_strips_stage_schedule():
    """A caller stage_schedule can never sum to every internal QDWH/QR
    panel count, so eigh's routing strips it unconditionally (ADVICE r4),
    and the scan_stages compile-cap routing still applies afterwards."""
    from cuda_qr_tpu.models.eigh import _route_large_n
    from cuda_qr_tpu.utils.config import DEFAULT_CONFIG

    sched = DEFAULT_CONFIG.replace(stage_schedule=(2, 2, 4))
    routed = _route_large_n(4096, sched)
    assert routed.stage_schedule is None
    assert routed.scan_stages == 1
    assert _route_large_n(512, sched).stage_schedule is None


@pytest.mark.skipif(not os.environ.get("CUDA_QR_TPU_SLOW_TESTS"),
                    reason="~4 min CPU compile; set CUDA_QR_TPU_SLOW_TESTS=1")
def test_eigh_midsize_dnc_end_to_end(rng):
    """Compile + run a REAL multi-bucket D&C (n=384, base_n=64: top bucket
    + two shrink buckets + base) end to end on CPU -- the large-n program
    structure the n <= 96 tests never reach (VERDICT r4 weak item 2).
    Measured ~260 s wall on one CPU core, hence opt-in."""
    n = 384
    G = rng.standard_normal((n, n)).astype(np.float32)
    S = (G + G.T) / np.sqrt(2 * n)
    w, V = ctq.eigh(jnp.asarray(S), base_n=64)
    _check(S, np.asarray(w, np.float64), np.asarray(V, np.float64), 1e-6)
