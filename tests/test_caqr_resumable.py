"""Resumable CAQR: per-panel checkpointing and crash/resume equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.parallel.caqr import caqr_factor, caqr_orgqr
from cuda_qr_tpu.parallel.caqr_resumable import caqr_factor_resumable
from cuda_qr_tpu.parallel.mesh import row_mesh, row_sharding
from cuda_qr_tpu.utils.checkpoint import load_state, save_state
from cuda_qr_tpu.utils.config import QRConfig
from cuda_qr_tpu.utils.verify import check_qr

CFG = QRConfig(panel_width=8, dtype=jnp.float64, use_pallas=False)


@pytest.fixture(scope="module")
def mesh():
    return row_mesh(8)


def _sharded(rng, mesh, m, n):
    A = rng.standard_normal((m, n))
    return A, jax.device_put(jnp.asarray(A), row_sharding(mesh))


def test_checkpoint_roundtrip(tmp_path, rng):
    p = str(tmp_path / "ck.npz")
    state = {"x": jnp.arange(6.0).reshape(2, 3), "y": jnp.ones(4)}
    save_state(p, state, {"next_panel": 3, "tag": "t"})
    s, meta = load_state(p)
    assert meta["next_panel"] == 3
    np.testing.assert_array_equal(s["x"], np.arange(6.0).reshape(2, 3))
    assert load_state(str(tmp_path / "missing.npz")) == (None, None)


def test_resumable_matches_monolithic(rng, mesh):
    m, n = 128, 64
    A, Ad = _sharded(rng, mesh, m, n)
    fac_r, R_r = caqr_factor_resumable(Ad, mesh, CFG, combine="allgather")
    fac_m, R_m = caqr_factor(Ad, mesh, CFG, combine="allgather")
    np.testing.assert_allclose(np.asarray(R_r), np.asarray(R_m), atol=1e-11)
    Q = caqr_orgqr(fac_r, mesh, n, CFG)
    chk = check_qr(A, np.asarray(Q)[:, :n], np.asarray(R_r)[:n, :n])
    assert chk.residual < 4 * 64 * chk.eps, chk


def test_resumable_bk_matches_monolithic(rng, mesh):
    """combine='bk' (the default and the pod-scale combine) now checkpoints
    too: every CAQRFactorsBK leaf must match the monolithic path to fp
    tolerance (VERDICT r3 item 6)."""
    m, n = 128, 64
    A, Ad = _sharded(rng, mesh, m, n)
    fac_r, R_r = caqr_factor_resumable(Ad, mesh, CFG)  # bk is the default
    fac_m, R_m = caqr_factor(Ad, mesh, CFG, combine="bk")
    np.testing.assert_allclose(np.asarray(R_r), np.asarray(R_m), atol=1e-11)
    for name, a, b in zip(fac_m._fields, fac_r, fac_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11,
                                   err_msg=name)
    Q = caqr_orgqr(fac_r, mesh, n, CFG)
    chk = check_qr(A, np.asarray(Q)[:, :n], np.asarray(R_r)[:n, :n])
    assert chk.residual < 4 * 64 * chk.eps, chk
    assert chk.orthogonality < 4 * 64 * chk.eps * 4, chk


def _crash_then_resume(tmp_path, rng, mesh, combine, step_name):
    """Interrupt after a few panels; a fresh call resumes and finishes with
    the same factors as an uninterrupted monolithic run."""
    m, n = 128, 64
    ck = str(tmp_path / "caqr_ck")
    A, Ad = _sharded(rng, mesh, m, n)

    calls = {"n": 0}
    import cuda_qr_tpu.parallel.caqr_resumable as cr
    orig = getattr(cr, step_name)

    def crashing(*a, **kw):
        if calls["n"] == 5:
            raise KeyboardInterrupt("simulated crash")
        calls["n"] += 1
        return orig(*a, **kw)

    setattr(cr, step_name, crashing)
    try:
        with pytest.raises(KeyboardInterrupt):
            caqr_factor_resumable(Ad, mesh, CFG, checkpoint_path=ck, every=2,
                                  combine=combine)
    finally:
        setattr(cr, step_name, orig)

    import os
    _, meta = load_state(os.path.join(ck, "state.npz"))
    assert 0 < meta["next_panel"] < n // 8  # partial progress persisted
    assert meta["combine"] == combine
    # snapshots are incremental: one small file per finished panel
    panels = [f for f in os.listdir(ck) if f.startswith("panel_")]
    assert len(panels) == calls["n"]

    fac, R = caqr_factor_resumable(Ad, mesh, CFG, checkpoint_path=ck, every=2,
                                   combine=combine)
    fac_ref, R_ref = caqr_factor(Ad, mesh, CFG, combine=combine)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref), atol=1e-11)
    for name, a, b in zip(fac_ref._fields, fac, fac_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-11,
                                   err_msg=name)


def test_crash_and_resume(tmp_path, rng, mesh):
    _crash_then_resume(tmp_path, rng, mesh, "allgather", "_panel_step")


def test_crash_and_resume_bk(tmp_path, rng, mesh):
    _crash_then_resume(tmp_path, rng, mesh, "bk", "_panel_step_bk")


def test_resume_rejects_mismatched_problem(tmp_path, rng, mesh):
    ck = str(tmp_path / "caqr_ck")
    _, Ad = _sharded(rng, mesh, 128, 64)
    save_state(str(tmp_path / "caqr_ck" / "state.npz"), {"A": np.zeros((1, 1))},
               {"next_panel": 1, "m": 999, "n": 64, "nb": 8,
                "layout": "block", "P": 8})
    with pytest.raises(ValueError, match="does not match"):
        caqr_factor_resumable(Ad, mesh, CFG, checkpoint_path=ck)


def test_resumable_cyclic(rng, mesh):
    from cuda_qr_tpu.parallel.caqr import cyclic_permutation
    m, n = 128, 64
    A = rng.standard_normal((m, n))
    perm, inv = cyclic_permutation(m, 8, 8)
    Ad = jax.device_put(jnp.asarray(A)[jnp.asarray(perm)], row_sharding(mesh))
    fac, R = caqr_factor_resumable(Ad, mesh, CFG, layout="cyclic")
    Q = caqr_orgqr(fac, mesh, n, CFG, layout="cyclic")
    Qlog = np.asarray(Q)[inv]
    chk = check_qr(A, Qlog[:, :n], np.asarray(R)[:n, :n])
    assert chk.residual < 4 * 64 * chk.eps, chk
