"""Run the test suite with per-module process isolation.

Why this exists: the XLA:CPU backend segfaults inside
backend_compile_and_load once a single process accumulates hundreds of live
executables (observed twice at ~test 320 of a full in-process run).  The
in-process mitigation -- conftest's clear_caches() fixtures -- dodges the
crash but forced recompiles all suite long, which with XLA:CPU's expensive
compiles of the deep panel graphs cost ~62 minutes per run before the
persistent compilation cache was enabled.

This runner gives each test module its own interpreter: the live-executable
count resets per module (structural fix, no reliance on in-process cache
clearing), failures in one module cannot kill the rest of the run, and the
persistent compilation cache (enabled in conftest) makes every process's
compiles after the first suite run near-free.

Usage:
    python tests/run_suite.py            # whole suite, per-module processes
    python tests/run_suite.py -k tsqr    # forward extra pytest args
Exit code: 0 iff every module passed.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time


def main(argv: list[str]) -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    modules = sorted(glob.glob(os.path.join(here, "test_*.py")))
    t0 = time.time()
    failures = []
    for mod in modules:
        name = os.path.basename(mod)
        t1 = time.time()
        env = dict(os.environ, CUDA_QR_SUITE_ISOLATED="1")
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", mod, "-q", "--no-header",
             *argv],
            cwd=os.path.dirname(here), env=env)
        dt = time.time() - t1
        status = "ok" if proc.returncode == 0 else f"FAIL rc={proc.returncode}"
        # rc=5 is pytest's "no tests collected" (e.g. -k filtered all out)
        if proc.returncode not in (0, 5):
            failures.append(name)
        print(f"## {name}: {status} ({dt:.0f}s)", flush=True)
    total = time.time() - t0
    print(f"## suite: {len(modules) - len(failures)}/{len(modules)} modules "
          f"passed in {total / 60:.1f} min")
    if failures:
        print("## failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
