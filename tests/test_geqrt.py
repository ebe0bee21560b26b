"""Pallas geqrt panel kernel vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.ops.geqrt import _geqrt_pallas, _geqrt_recursive, geqrt_panel
from cuda_qr_tpu.ops.householder import geqr2, larft, unpack_v
from cuda_qr_tpu.utils.config import QRConfig

CFG = QRConfig(use_pallas=True, interpret=True)


@pytest.mark.parametrize("m,nb,off", [(64, 16, 0), (96, 16, 32), (128, 32, 96)])
def test_base_kernel_matches_geqr2(rng, m, nb, off):
    A = rng.standard_normal((m, nb)).astype(np.float32)
    packed, tau, T = jax.jit(
        lambda a, o: _geqrt_pallas(a, o, CFG))(jnp.asarray(A), off)
    ref, tau_ref = geqr2(jnp.asarray(A[off:]), precision=jax.lax.Precision.HIGHEST)
    T_ref = larft(unpack_v(ref), tau_ref)
    np.testing.assert_allclose(np.asarray(packed[off:]), np.asarray(ref),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(packed[:off]), A[:off])
    np.testing.assert_allclose(np.asarray(tau), np.asarray(tau_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_ref), atol=2e-5)


@pytest.mark.parametrize("base", [8, 16])
def test_recursive_matches_geqr2(rng, base):
    m, nb, off = 96, 32, 16
    cfg = CFG.replace(panel_base=base)
    A = rng.standard_normal((m, nb)).astype(np.float32)
    packed, tau, T = jax.jit(
        lambda a, o: _geqrt_recursive(a, o, cfg))(jnp.asarray(A), off)
    ref, tau_ref = geqr2(jnp.asarray(A[off:]))
    T_ref = larft(unpack_v(ref), tau_ref)
    np.testing.assert_allclose(np.asarray(packed[off:]), np.asarray(ref),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_ref), atol=5e-5)


def test_kernel_zero_column(rng):
    A = np.zeros((64, 16), np.float32)
    A[:, 3] = rng.standard_normal(64)
    packed, tau, T = jax.jit(
        lambda a, o: _geqrt_pallas(a, o, CFG))(jnp.asarray(A), 0)
    assert np.all(np.isfinite(np.asarray(packed)))
    assert np.all(np.isfinite(np.asarray(T)))


def test_geqrt_panel_bf16(rng):
    A = rng.standard_normal((64, 16)).astype(np.float32)
    packed, tau, T = geqrt_panel(jnp.asarray(A, jnp.bfloat16), 0,
                                 CFG.replace(dtype=jnp.bfloat16))
    assert packed.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(packed, np.float32)))


def test_geqrt_panel_f64_fallback(rng):
    """fp64 routes to the jnp path (TPU kernel is fp32-only)."""
    A = rng.standard_normal((48, 16))
    packed, tau, T = geqrt_panel(jnp.asarray(A), 0, CFG.replace(dtype=jnp.float64))
    ref, tau_ref = geqr2(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref), atol=1e-13)
