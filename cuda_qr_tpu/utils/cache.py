"""Persistent XLA compilation cache.

The reference pays no compile cost (nvcc ahead-of-time, Makefile:4); on this
stack every process pays a full XLA trace+compile, which through the axon
remote-compile tunnel costs minutes for the 8192^2 bench.  Enabling JAX's
persistent compilation cache amortizes that across processes: the first run
writes serialized executables keyed by HLO hash, later runs load them.
"""

from __future__ import annotations

import hashlib
import os
import platform

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cuda_qr_tpu", "xla_cache")


def _machine_tag() -> str:
    """Fingerprint the host CPU so cache entries never cross machines.

    XLA:CPU serializes AOT executables specialized to the compile host's
    machine features; loading them on a host with different features logs
    errors and can SIGILL (observed when the session moved hosts).  JAX's
    cache key does not include these features, so we shard the cache
    directory by a hash of the CPU flags instead.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                flags = ""
    except OSError:
        flags = ""
    raw = f"{platform.machine()}:{flags}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's compilation cache at a persistent directory.

    Safe to call multiple times and before/after backend initialization
    (the cache is consulted per-compile, not at init).  Returns the dir.
    """
    import jax

    cache_dir = path or os.environ.get("CUDA_QR_TPU_CACHE", _DEFAULT_DIR)
    cache_dir = os.path.join(cache_dir, _machine_tag())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything -- even sub-second compiles add up across the
    # per-Pallas-instance Mosaic compiles this stack triggers.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
