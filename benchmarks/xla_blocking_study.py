"""Mine XLA's own TPU QR lowering for trailing-matrix blocking ideas.

VERDICT r3 item 8: docs/PERF.md records that XLA's `jnp.linalg.qr` is ~8x
slower than this library on a single 8192x128 panel yet competitive on the
full 8192^2 factorization -- so its *trailing-update schedule* must be doing
something structurally efficient that the panel path is not.  This script
compiles `jnp.linalg.qr` on the TPU backend at the headline size, dumps the
optimized HLO, and reduces it to the facts that matter for stage-geometry
decisions:

  - every `dot` op: lhs/rhs/out shapes -> which GEMMs carry the FLOPs and
    at what aspect ratios (XLA's effective panel width / update width);
  - `while` loops: how many, and the trip counts recoverable from constant
    comparisons -> its stage structure (one loop over panels vs nested);
  - fusion count + total HLO size -> how much elementwise glue rides along;
  - `custom-call`/`all-reduce` ops (expected none on one chip).

The same reduction is printed for this library's `qr_blocked` at the
headline config so the two schedules can be compared side by side in
docs/PERF.md.  Compile-only: nothing here times execution (run_all.py and
sweep_r4.py own the timing discipline).

Usage: python benchmarks/xla_blocking_study.py [n] [--ours-only|--xla-only]
"""

import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_qr_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

DOT_RE = re.compile(
    r"(\S+) = (\S+) dot\((.*?)\)")
SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def summarize(hlo: str, label: str):
    dots = collections.Counter()
    dot_flops = collections.Counter()
    for line in hlo.splitlines():
        line = line.strip()
        m = DOT_RE.search(line)
        if m:
            out_shape = m.group(2)
            sm = SHAPE_RE.search(out_shape)
            # contraction dim from the operand shapes in the args
            shapes = SHAPE_RE.findall(line)
            key = " ".join("x".join([s[1]]) for s in shapes[:3])
            dims = [tuple(int(x) for x in s[1].split(",") if x)
                    for s in shapes[:3]]
            dots[key] += 1
            if len(dims) >= 3 and all(len(d) >= 2 for d in dims[1:3]):
                out = dims[0] if len(dims[0]) >= 2 else None
                lhs, rhs = dims[1], dims[2]
                # contraction size = the operand dim not in the output
                k = (set(lhs[-2:]) & set(rhs[-2:]))
                if out is not None:
                    b = int(np.prod(out[:-2])) if len(out) > 2 else 1
                    kk = max(k) if k else lhs[-1]
                    dot_flops[key] += 2 * b * out[-2] * out[-1] * kk
    n_while = hlo.count(" while(")
    n_fusion = len(re.findall(r"= [a-z0-9\[\],{}]+ fusion\(", hlo))
    n_custom = len(re.findall(r"custom-call", hlo))
    top = sorted(dot_flops.items(), key=lambda kv: -kv[1])[:12]
    total_flops = sum(dot_flops.values())
    rec = {
        "label": label,
        "hlo_bytes": len(hlo),
        "while_loops": n_while,
        "fusions": n_fusion,
        "custom_calls": n_custom,
        "distinct_dot_shapes": len(dots),
        "total_dot_gflop_static": round(total_flops / 1e9, 2),
        "top_dots": [
            {"shapes(out lhs rhs)": k, "count": dots[k],
             "gflop": round(f / 1e9, 2)} for k, f in top],
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(argv[0]) if argv else 8192
    which = ("xla",) if "--xla-only" in sys.argv else (
        ("ours",) if "--ours-only" in sys.argv else ("xla", "ours"))
    x = jnp.zeros((n, n), jnp.float32)

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "hlo_dumps")
    os.makedirs(outdir, exist_ok=True)

    if "xla" in which:
        f = jax.jit(lambda a: jnp.linalg.qr(a))
        hlo = f.lower(x).compile().as_text()
        open(os.path.join(outdir, f"xla_qr_{n}.hlo"), "w").write(hlo)
        summarize(hlo, f"jnp.linalg.qr {n}^2 f32 (optimized TPU HLO)")

    if "ours" in which:
        from cuda_qr_tpu.ops.blocked import qr_blocked
        from cuda_qr_tpu.utils.config import QRConfig
        cfg = QRConfig(dtype=jnp.float32, scan_stages=32 if n >= 4096 else 4,
                       factor_lookahead=4)
        g = jax.jit(lambda a: qr_blocked(a, cfg))
        hlo = g.lower(x).compile().as_text()
        open(os.path.join(outdir, f"ours_qr_{n}.hlo"), "w").write(hlo)
        summarize(hlo, f"qr_blocked {n}^2 f32 s32_g4 (optimized TPU HLO)")


if __name__ == "__main__":
    main()
