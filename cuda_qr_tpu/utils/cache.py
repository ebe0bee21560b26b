"""Persistent XLA compilation cache.

The reference pays no compile cost (nvcc ahead-of-time, Makefile:4); on this
stack every process pays a full XLA trace+compile, which through the axon
remote-compile tunnel costs minutes for the 8192^2 bench.  Enabling JAX's
persistent compilation cache amortizes that across processes: the first run
writes serialized executables keyed by HLO hash, later runs load them.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cuda_qr_tpu", "xla_cache")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory.

    Safe to call multiple times and before/after backend initialization
    (the cache is consulted per-compile, not at init).  Returns the dir.
    """
    import jax

    cache_dir = path or os.environ.get("CUDA_QR_TPU_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything -- even sub-second compiles add up across the
    # per-Pallas-instance Mosaic compiles this stack triggers.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
