"""to_device/to_host: complex arrays never cross the transfer boundary raw.

On the CPU test backend both helpers are pass-through-equivalent; the
transfer-splitting branch itself is exercised numerically (combine/split are
plain jitted ops), and the TPU-only routing (axon tunnel cannot transfer
complex buffers at all -- see utils/hostio.py) is covered by the real-TPU
verify drive and bench.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cuda_qr_tpu.utils.hostio import _combine, _split, to_device, to_host


def test_real_roundtrip():
    x = np.random.default_rng(0).standard_normal((5, 3)).astype(np.float32)
    d = to_device(x)
    assert isinstance(d, jax.Array) and d.dtype == jnp.float32
    np.testing.assert_array_equal(to_host(d), x)


def test_complex_roundtrip():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((6, 4)) + 1j * rng.standard_normal((6, 4))
         ).astype(np.complex64)
    d = to_device(x)
    assert d.dtype == jnp.complex64
    back = to_host(d)
    assert back.dtype == np.complex64
    np.testing.assert_allclose(back, x, rtol=0, atol=0)


def test_combine_split_inverse():
    rng = np.random.default_rng(2)
    re = jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))
    c = _combine(re, im)
    r2, i2 = _split(c)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(re))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(im))


def test_device_array_passthrough():
    d = jnp.ones((2, 2), jnp.complex64)
    assert to_device(d) is d


def test_complex128_to_host_dtype():
    x = (np.ones((2, 2)) + 1j * np.ones((2, 2))).astype(np.complex128)
    assert to_host(to_device(x)).dtype == np.complex128
