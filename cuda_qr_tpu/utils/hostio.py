"""Host <-> device transfer helpers that keep complex off the wire.

The TPU runtime in this environment (axon tunnel) implements complex64/128
*compute* (XLA lowers it to real arithmetic) but not complex *transfers*:
both device_put of a host complex array and np.asarray of a device complex
array raise ``UNIMPLEMENTED``, and the first failed transfer permanently
poisons every later transfer in the process (verified empirically; see
docs/PERF.md "Complex transfers").  Standard libtpu does support complex
transfers, but splitting costs one trivial fused op per direction, so these
helpers do it unconditionally off-CPU rather than sniffing runtime versions.

``to_device`` moves host data onto the default device, shipping complex
input as two real arrays recombined on device with ``lax.complex``;
``to_host`` fetches any array, pulling complex results as two real views.
Real dtypes pass straight through both.  Every complex entry point in the
library routes its input through ``to_device``; users on TPU should fetch
complex Q/R with ``to_host`` instead of ``np.asarray``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _combine(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(re, im)


@jax.jit
def _split(x: jnp.ndarray):
    return jnp.real(x), jnp.imag(x)


def _on_cpu(x: jax.Array) -> bool:
    try:
        return all(d.platform == "cpu" for d in x.devices())
    except Exception:  # pragma: no cover - non-addressable arrays
        return False


def to_device(x) -> jax.Array:
    """jnp.asarray that never transfers complex bytes to a non-CPU device."""
    if isinstance(x, jax.Array):
        return x
    x = np.asarray(x)
    if np.iscomplexobj(x) and jax.default_backend() != "cpu":
        re = jnp.asarray(np.ascontiguousarray(x.real))
        im = jnp.asarray(np.ascontiguousarray(x.imag))
        return _combine(re, im)
    return jnp.asarray(x)


def to_host(x) -> np.ndarray:
    """np.asarray that never transfers complex bytes from a non-CPU device."""
    if isinstance(x, jax.Array) and jnp.iscomplexobj(x) and not _on_cpu(x):
        re, im = _split(x)
        ctype = np.complex64 if x.dtype == jnp.complex64 else np.complex128
        out = np.empty(x.shape, ctype)
        out.real, out.imag = np.asarray(re), np.asarray(im)
        return out
    return np.asarray(x)
