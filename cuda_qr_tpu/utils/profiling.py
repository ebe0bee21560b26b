"""Profiling and tracing.

Reference parity (SURVEY.md S5): the reference brackets nvprof capture with
cudaProfilerStop (qr.cu:8,807) and wall-clocks whole mmqr calls with
gettimeofday (qr.cu:775-788).  Here:

  * ``trace(logdir)``: context manager around jax.profiler.trace -- emits an
    XPlane/XProf trace viewable in TensorBoard/xprof, the TPU analog of an
    nvprof window.
  * ``annotate(name)``: TraceAnnotation for labeling regions inside a step.
  * ``device_memory_stats()``: live/peak HBM usage of the default device --
    the observability the reference's HANDLE_ERROR-on-cudaMalloc lacks.
  * steady-state vs compile timing lives in utils.timing (bench/force).
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/cuda_qr_tpu_trace"):
    """Capture an XProf trace of the enclosed block."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a traced step (shows up in the XProf timeline)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> dict:
    """Bytes in use / peak / limit for one device (empty if unsupported)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats[k] for k in keys if k in stats}
