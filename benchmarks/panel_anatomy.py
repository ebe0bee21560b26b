"""In-graph anatomy of the 8192^2 headline: where the gap to the GEMM bound
actually goes.

The r4 x7 re-measurement (K-deep in-graph loops, one dispatch) showed the
fused Mosaic chol+inv kernel costs ~9 us -- not the ~100 us that repeated
dispatch through the tunnel had suggested -- so docs/PERF.md's "panel chains
are the gap" attribution needs re-deriving from device-resolved numbers.
Each component here is timed as a K-iteration lax.fori_loop with a
serializing data dependency inside ONE jitted program: per-iteration time is
steady_net/K with the tunnel RTT amortized to nothing.

Components (m = 8192, nb = 128 unless noted):
  panel_bk   : full basis-kernel panel factor (panel_factor_cholqr2bk),
               off=0 -- the per-panel sequential cost the driver pays k times
  cholqr2    : the CholeskyQR2 core alone (2 Gram GEMMs + fused chol + 2
               apply GEMMs + Taylor round 2)
  newton     : newton_inverse of I - S Q_J alone (the second chain)
  larfb_w    : one nb-deep trailing update at width w = 4096 (3 GEMMs) --
               the per-(panel, stage) update building block
  merge4     : the g=4 lookahead pair-merge tree (3 merge_wy calls)

Prints one JSON line per component; then the reconstruction: k*panel +
trailing-GEMM volume vs the measured 38.6 ms headline.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_qr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cuda_qr_tpu.ops.blocked import PackedQR  # noqa: E402,F401
from cuda_qr_tpu.ops.fast_panel import (_cholqr2,  # noqa: E402
                                        panel_factor_cholqr2bk)
from cuda_qr_tpu.ops.householder import larfb, merge_wy  # noqa: E402
from cuda_qr_tpu.ops.smalllinalg import newton_inverse  # noqa: E402
from cuda_qr_tpu.utils.config import QRConfig  # noqa: E402
from cuda_qr_tpu.utils.timing import bench  # noqa: E402

H = jax.lax.Precision.HIGHEST
m, nb = 8192, 128
K = 50
cfg = QRConfig(dtype=jnp.float32)
rng = np.random.default_rng(12)
X_np = rng.standard_normal((m, nb)).astype(np.float32)
X = jnp.asarray(X_np)


def loop(body0):
    """K-iteration serialized loop: body0(x) -> x' bit-stable, one dispatch."""
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, lambda _, xc: body0(xc), x)
    return run


def report(name, r, note=""):
    per_us = r.steady_net_s * 1e6 / K
    print(json.dumps({"component": name, "per_iter_us": round(per_us, 1),
                      "rtt_ms": round(r.rtt_s * 1e3, 1),
                      "compile_s": round(r.compile_s, 1),
                      "note": note}), flush=True)
    return per_us


def dep(x, scalar):
    """Add an underflow-scaled opaque scalar: bit-identical, serializing."""
    return x + scalar.astype(x.dtype) * x.dtype.type(1e-30)


results = {}

# full basis-kernel panel factor
def panel_body(x):
    packed, tau, T, VJ = panel_factor_cholqr2bk(x, 0, cfg)
    return dep(x, jnp.sum(tau))

results["panel_bk"] = report(
    "panel_bk", bench(loop(panel_body), X, reps=3),
    "full panel_factor_cholqr2bk 8192x128, off=0")

# CholeskyQR2 core
def cholqr2_body(x):
    Q, Rpos, emax = _cholqr2(x, nb, jnp.float32, H, cfg)
    return dep(x, emax)

results["cholqr2"] = report(
    "cholqr2", bench(loop(cholqr2_body), X, reps=3),
    "2 Gram + fused chol + 2 apply + Taylor")

# Newton inverse of a well-conditioned I - S Q_J analog
M0 = jnp.asarray(np.eye(nb, dtype=np.float32)
                 + 0.3 * rng.standard_normal((nb, nb)).astype(np.float32) / np.sqrt(nb))

def newton_body(x):
    N, errN = newton_inverse(x, H)
    # N approx x^{-1}; x' = (x N) x is bit-close but not identical; instead
    # keep x and add the opaque residual underflow-scaled.
    return dep(x, errN)

results["newton"] = report(
    "newton", bench(loop(newton_body), M0, reps=3),
    "newton_inverse 128^2")

# one trailing larfb at width 4096 (average live width at 8192^2 is ~n/2)
w = 4096
# scaled so repeated application stays finite over K iterations
V = jnp.asarray((np.tril(rng.standard_normal((m, nb)), -1)
                 / np.sqrt(m)).astype(np.float32))
T0 = jnp.asarray((np.triu(rng.standard_normal((nb, nb))) * 0.01
                  ).astype(np.float32))
A0 = jnp.asarray(rng.standard_normal((m, w)).astype(np.float32))

def larfb_body(a):
    out = larfb(a, V, T0, transpose=True, precision=H)
    return out  # full data dependency; values evolve (fine: timing only)

results[f"larfb_{w}"] = report(
    f"larfb_{w}", bench(loop(larfb_body), A0, reps=3),
    "3-GEMM nb-deep block update, width 4096")

# g=4 merge tree: 3 merge_wy calls (2 at nb, 1 at 2nb)
V2 = jnp.asarray((rng.standard_normal((m, nb)) / np.sqrt(m)
                  ).astype(np.float32))

def merge_body(t):
    T01 = merge_wy(V, t, V2, T0, H)
    T23 = merge_wy(V2, T0, V, t, H)
    Tm = merge_wy(jnp.concatenate([V, V2], 1), T01,
                  jnp.concatenate([V2, V], 1), T23, H)
    return dep(t, jnp.sum(Tm))

results["merge4"] = report(
    "merge4", bench(loop(merge_body), T0, reps=3),
    "3 merge_wy (g=4 tree) at m=8192")

# reconstruction arithmetic
k = 64
panel_total_ms = results["panel_bk"] * k / 1e3
print(json.dumps({
    "reconstruction": {
        "k_panels": k,
        "panel_total_ms": round(panel_total_ms, 2),
        "exact_gemm_bound_ms": 28.0,
        "headline_raw_ms": 38.6,
        "unattributed_ms": round(38.6 - 28.0 - panel_total_ms, 2),
        "note": "unattributed = masked-width waste + merge trees + stage "
                "glue + scan overhead (+ trailing GEMM inefficiency vs "
                "the 26.5 TF/s calibration)",
    }}), flush=True)
