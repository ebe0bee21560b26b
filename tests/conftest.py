"""Test environment: 8 virtual CPU devices, fp64 enabled.

Distributed (TSQR/CAQR) code is exercised on a simulated mesh -- the
TPU-world analog of the reference's "run the CPU oracle before the GPU"
discipline (SURVEY.md S4): XLA_FLAGS=--xla_force_host_platform_device_count=8
stands in for a v5e/v5p ICI mesh, and Pallas kernels run in interpreter mode.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU backend and sets
# jax_platforms programmatically; override it so tests run on the virtual
# 8-device CPU mesh regardless of import order.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA:CPU compiles of the deep panel graphs
# cost tens of seconds EACH (cholesky_with_inv(128) alone ~25 s), and the
# segfault-dodging clear_caches() fixtures below force recompiles all suite
# long -- measured 62 min for 369 tests.  With the disk cache, every
# recompile after the first becomes a fast executable load (local CPU, no
# tunnel), across fixtures, processes, AND suite runs.
from cuda_qr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12)  # the reference's srand(12), qr.cu:765


# When tests/run_suite.py runs the suite (one process PER MODULE), the
# live-executable count is bounded structurally and the in-process
# cache-clearing below -- which forces recompiles all suite long -- is pure
# overhead, so it is disabled.  The fixtures stay active for plain
# `pytest tests/` whole-suite runs, where XLA:CPU otherwise segfaults in
# backend_compile_and_load once hundreds of executables accumulate.
_PROCESS_ISOLATED = os.environ.get("CUDA_QR_SUITE_ISOLATED") == "1"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    With the full suite in one process the XLA:CPU backend accumulates
    hundreds of live executables and eventually segfaults inside
    backend_compile_and_load (reproduced twice at the same test, never in
    smaller runs).  Bounding the live-executable count dodges the crash and
    caps RSS; cross-module jit reuse is rare, so the recompile cost is
    small.
    """
    yield
    if not _PROCESS_ISOLATED:
        jax.clear_caches()


_TEST_TICKS = {"n": 0}


@pytest.fixture(autouse=True)
def _clear_jax_caches_every_20_tests():
    """Module-boundary clearing is not enough anymore: a single heavily
    parametrized module (test_update.py at ~340-test suite size) can
    accumulate enough live XLA:CPU executables to hit the
    backend_compile_and_load segfault mid-module (observed 2026-08-18:
    pytest died silently at test 322 with no summary).  Clear every 20
    tests as well; recompiles are cheap relative to a dead suite."""
    yield
    _TEST_TICKS["n"] += 1
    if _TEST_TICKS["n"] % 20 == 0 and not _PROCESS_ISOLATED:
        import gc
        jax.clear_caches()
        gc.collect()
