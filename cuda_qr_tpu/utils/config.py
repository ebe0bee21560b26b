"""Configuration for the TPU QR library.

The reference controls its shape-/precision-behavior with compile-time macros
(``Scalar`` at qr.cu:17, panel dims ``PR``/``PC`` at qr.cu:21-23, ``trials``
at qr.cu:25).  Here the same knobs are a frozen dataclass resolved at trace
time: every field is static under ``jax.jit``, so it plays the same
"compile-time constant" role the macros do, while remaining a runtime value
in Python.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# MXU is 128x128 and the VPU lane width is 128 -- panel width defaults to one
# full lane/MXU tile (BASELINE.json config 2: "panel width 128").
LANE = 128


def _default_interpret() -> bool:
    """Pallas kernels must run in interpreter mode off-TPU (CPU tests)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover - backend probing never fails in CI
        return True


@dataclasses.dataclass(frozen=True)
class QRConfig:
    """Static configuration for blocked QR.

    Attributes:
      panel_width: columns per panel (the reference's ``PC``, qr.cu:23).
        Defaults to 128 to match the MXU tile / VPU lane width.
      block_rows: row-block size used by TSQR leaf factorizations (the moral
        equivalent of the reference's ``PR``, qr.cu:21 -- the tall dimension
        of a fast-memory-resident tile).
      dtype: computation dtype.
      precision: matmul precision for fp32 inputs on TPU.  ``HIGHEST`` uses
        6-pass bf16 emulation so fp32 residuals hold at LAPACK tolerance.
      use_pallas: route panel factorization through the Pallas kernel (True)
        or the pure-jnp reference path (False).
      interpret: run Pallas kernels in interpreter mode (required on CPU).
      max_vmem_panel_rows: tallest panel the Pallas geqrt kernel will hold
        resident in VMEM; taller panels fall back to TSQR panel factorization.
    """

    panel_width: int = LANE
    panel_base: int = 32
    block_rows: int = 1024
    dtype: jnp.dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    # Precision overrides for the two GEMM-dominated phases (None = follow
    # ``precision``).  Panel factorization always uses ``precision``: V/T
    # quality bounds Q's orthogonality, while the trailing/orgqr GEMMs only
    # add one rounding term per panel application.  HIGH (bf16x3) doubles
    # MXU throughput; measured at 8192^2 fp32 it keeps the residual well
    # under n*eps (see docs/PERF.md).
    trailing_precision: Optional[jax.lax.Precision] = None
    orgqr_precision: Optional[jax.lax.Precision] = None
    use_pallas: bool = True
    interpret: Optional[bool] = None
    max_vmem_panel_rows: int = 16384
    # Panel factorization for the blocked driver:
    #   "cholqr2_bk": CholeskyQR2 + Yamamoto basis-kernel (V = Q - E S,
    #     T = (I - S Q_J)^-T via Newton-Schulz) -- ONE sequential nb-step
    #     chain per panel (the Gram Cholesky); the Householder-reconstruction
    #     LU chain is replaced by ~15 dependent nb x nb GEMMs.  Fastest.
    #   "cholqr2_hr": CholeskyQR2 + Householder reconstruction -- pure MXU
    #     GEMMs + log-depth nb x nb recursions, with an automatic lax.cond
    #     fallback to masked Householder on breakdown.  Produces true
    #     unit-lower packed V (LAPACK storage convention).
    #   "geqrt": the Pallas VMEM-resident column-Householder kernel.
    #   "geqr2": pure-jnp masked Householder (reference semantics).
    # Measured at 8192^2 fp32 (docs/PERF.md): cholqr2_bk 94 ms vs
    # cholqr2_hr 116 ms -- the BK panel is the default.
    panel_method: str = "cholqr2_bk"
    # Panel loop driver:
    #   "scan": one lax.fori_loop body, trailing update applied full-width
    #     with a column mask.  O(1) trace/compile cost in the panel count
    #     (crucial: Mosaic compiles per Pallas *instance* and XLA tracing of
    #     the deep cholqr2_hr graph is expensive), at ~2x the GEMM flops.
    #   "unrolled": Python loop with exact shrinking slices -- fewer flops,
    #     compile cost grows with n/nb.
    driver: str = "scan"
    # Number of equal panel groups for the scan driver.  Each group's scan
    # runs on a statically-sliced trailing submatrix (rows/cols before the
    # group's first panel are provably untouched), so the full-width update
    # waste shrinks from ~2x toward exact as stages grow, at one extra traced
    # body per stage.  4 stages ~= 47% of the unstaged GEMM volume at 8192^2.
    scan_stages: int = 4
    # Optional non-uniform stage schedule for the scan driver: panels per
    # stage, summing to the panel count k (overrides scan_stages when set).
    # Motivation (docs/PERF.md r4 anatomy): the stage taper leaves late
    # stages running skinny GEMMs far below MXU peak; a tail schedule like
    # (2,)*24 + (8,)*2 keeps the early exact-width discipline but batches
    # the last 16 panels into two deep (g=8, 1024-deep-reflector) groups.
    # Every stage whose panel count equals its lookahead group width still
    # takes the exact-width kg==g path.
    stage_schedule: Optional[Tuple[int, ...]] = None
    # orgqr/ormqr panel aggregation: apply panels in groups of up to this
    # many (power of two), merged into ONE wide block reflector via
    #   T = [[T1, -T1 (V1^T V2) T2], [0, T2]]
    # -- g x fewer sweeps over Q/B and g*nb-deep MXU GEMMs for the same
    # flops (the merge itself is O(g^2 nb^2 m) small GEMMs).  Groups never
    # straddle a stage boundary; stages whose panel count g does not divide
    # fall back to smaller groups.
    apply_aggregate: int = 4
    # Factor-driver lookahead: panels are factored in groups of up to this
    # many (power of two dividing the stage's panel count).  Within a group
    # each panel updates only the group's remaining columns; the full-width
    # masked trailing update runs once per group as a merged block reflector
    # with K = g*nb-deep GEMMs.  Same flops, ~g x fewer full-width sweeps,
    # and deep-K GEMMs run ~1.7x faster on the MXU than K=nb-thin ones.
    factor_lookahead: int = 4
    # Run the panel Gram Cholesky+inverse as one fused Mosaic kernel
    # (ops/pallas_chol.py) instead of the XLA op chain -- the last
    # sequential chain per panel.  f32, 16-multiple panel widths only;
    # ineligible shapes fall back to the jnp recursion automatically.
    use_chol_kernel: bool = True
    # Run the QRCP per-block pivot selection (nb greedy Gram-Schmidt steps
    # on the sketch tile) as one fused Mosaic kernel (ops/pallas_select.py)
    # instead of an nb-step XLA fori_loop.  f32, 128-multiple candidate
    # widths only; ineligible shapes fall back automatically.
    use_select_kernel: bool = True
    # TSQR leaf factorization: "householder" (unconditionally stable) or
    # "cholqr2" (CholeskyQR2: pure MXU GEMM/chol/trsm, ~40x less HBM traffic,
    # requires cond(A) <~ 1/sqrt(eps) -- fine for the trailing panels of any
    # well-scaled matrix, guarded by a NaN check with householder fallback).
    tsqr_leaf: str = "householder"

    def resolved_interpret(self) -> bool:
        if self.interpret is None:
            return _default_interpret()
        return self.interpret

    def resolved_trailing_precision(self) -> jax.lax.Precision:
        if self.trailing_precision is None:
            return self.precision
        return self.trailing_precision

    def resolved_orgqr_precision(self) -> jax.lax.Precision:
        if self.orgqr_precision is None:
            return self.precision
        return self.orgqr_precision

    def replace(self, **kw) -> "QRConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = QRConfig()

# Mixed-precision preset (ROADMAP r2 item 4): the trailing-update GEMMs run
# at HIGH -- 3-pass bf16 MXU emulation, ~2x the HIGHEST matmul throughput --
# while panel factorization stays at HIGHEST, which bounds V/T quality and
# hence Q's orthogonality.  Use for throughput-critical factorizations where
# some residual headroom under the n*eps acceptance bound is acceptable;
# measured numbers live in docs/PERF.md.
#
# orgqr stays at HIGHEST on purpose: dropping the Q-formation sweeps to HIGH
# was measured at 4096^2 to push ||Q^T Q - I|| to 7.8e-03 -- ~4x OVER the
# n*eps*4 bound utils/verify.py enforces (RESULTS x6, r3) -- because every
# panel application then adds a bf16-rounded term directly into Q.  The
# trailing update has no such accumulation into Q (it only perturbs R and
# later panels' inputs, which CholeskyQR2 re-orthogonalizes), so HIGH is
# safe there.  MIXED is a factor-throughput mode, not a Q-throughput mode.
MIXED_CONFIG = QRConfig(
    trailing_precision=jax.lax.Precision.HIGH,
)
