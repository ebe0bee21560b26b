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
    rtt_s: float = 0.0       # one forced-scalar roundtrip on a READY array

    @property
    def gflops(self) -> float | None:
        if self.flops is None:
            return None
        return self.flops / self.steady_s / 1e9

    @property
    def steady_net_s(self) -> float:
        """steady_s minus the tunnel-RTT share baked into the timed loop.

        The loop queues reps calls and forces ONE scalar at the end, so the
        raw per-rep time carries rtt_s/reps of pure link latency -- on a
        degraded axon day that is tens of ms (docs/PERF.md "tunnel-RTT
        floor").  This is the device-time estimate; steady_s is the
        conservative raw number."""
        return max(0.0, self.steady_s - self.rtt_s / max(self.reps, 1))

    @property
    def net_gflops(self) -> float | None:
        if self.flops is None or self.steady_net_s <= 0:
            return None
        return self.flops / self.steady_net_s / 1e9


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

    # RTT probe: re-force the SAME (already computed) result -- nothing to
    # compute or wait on, so this times one forced-scalar host<->device
    # roundtrip, i.e. the per-sync tunnel latency baked into the loop above.
    t0 = time.perf_counter()
    force(out)
    rtt = time.perf_counter() - t0
    return BenchResult(compile_s=compile_s, steady_s=steady, reps=reps,
                       flops=flops, rtt_s=rtt)


def qr_flops(m: int, n: int) -> float:
    """2mn^2 - (2/3)n^3, the convention used for the reference's numbers."""
    return 2.0 * m * n * n - (2.0 / 3.0) * n ** 3
