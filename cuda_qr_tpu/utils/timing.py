"""Benchmark harness with compile/steady-state separation.

Reference analog: the gettimeofday loop around whole mmqr calls
(qr.cu:774-789), which conflated alloc + H2D + compute.  Here compile and
transfer are measured apart from steady state, and -- critically for this
environment -- completion is forced by fetching a scalar from the result:
``block_until_ready`` does not synchronize through the axon TPU tunnel, so
naive timing reports dispatch latency, not compute (measured this session:
jnp.linalg.qr "0.1ms" by block_until_ready vs 2023ms real).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax


def force(out) -> None:
    """Force completion by fetching ONE scalar per leaf.

    The scalar is computed on device (tiny dependent op) so only 4 bytes
    cross the host link -- fetching whole arrays would time the tunnel's
    transfer bandwidth, not the computation (a 64 MB fetch here costs
    ~600 ms and once masqueraded as '0.4 TFLOP/s' GEMM).
    """
    import jax.numpy as jnp
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "size") and leaf.size:
            scalar = leaf.ravel()[0]
            if jnp.iscomplexobj(scalar):
                # complex transfers are UNIMPLEMENTED through the axon
                # tunnel and poison the process (utils/hostio.py)
                scalar = jnp.real(scalar)
            _ = float(jax.device_get(scalar))


@dataclasses.dataclass
class BenchResult:
    compile_s: float
    steady_s: float          # per-call steady state, completion-forced
    reps: int
    flops: float | None = None

    @property
    def gflops(self) -> float | None:
        if self.flops is None:
            return None
        return self.flops / self.steady_s / 1e9


def bench(fn: Callable[..., Any], *args, reps: int = 3,
          flops: float | None = None) -> BenchResult:
    t0 = time.perf_counter()
    out = fn(*args)
    force(out)
    compile_s = time.perf_counter() - t0

    # one untimed steady-state call to flush any caching effects
    force(fn(*args))

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)  # queue is FIFO: forcing the last forces them all
    steady = (time.perf_counter() - t0) / reps
    return BenchResult(compile_s=compile_s, steady_s=steady, reps=reps,
                       flops=flops)


def qr_flops(m: int, n: int) -> float:
    """2mn^2 - (2/3)n^3, the convention used for the reference's numbers."""
    return 2.0 * m * n * n - (2.0 / 3.0) * n ** 3
