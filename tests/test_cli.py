"""CLI harness smoke tests (CPU, no-pallas for speed)."""

import json
import subprocess
import sys


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "cuda_qr_tpu", *args],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": "/root/repo"})


def test_cli_factor():
    out = run_cli("--no-pallas", "--dtype", "f64", "--trials", "1",
                  "factor", "64", "32")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["residual"] < 1e-13


def test_cli_oracle():
    out = run_cli("oracle", "64", "32", "16", "8")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["residual"] < 1e-13


def test_cli_rejects_bad_sizes():
    out = run_cli("factor", "0", "0")
    assert out.returncode == 2 and "must be >= 1" in out.stderr
    out = run_cli("factor", "10", "20")
    assert out.returncode == 2 and "n <= m" in out.stderr


def test_cli_pivoted():
    out = run_cli("--no-pallas", "--trials", "1", "pivoted", "128", "64",
                  "--decay", "0.9")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["residual"] < 64 * 1.2e-7


def test_cli_caqr_virtual_mesh():
    import os
    out = subprocess.run(
        [sys.executable, "-m", "cuda_qr_tpu", "--no-pallas", "--trials", "1",
         "--platform", "cpu",
         "caqr", "128", "64", "--devices", "8", "--layout", "cyclic"],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": "/root/repo",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["devices"] == 8


def test_cli_batched_and_update():
    for argv in (("--trials", "1", "--no-pallas", "batched", "4", "48", "16"),
                 ("--trials", "1", "--no-pallas", "update", "64", "24")):
        out = run_cli(*argv)
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        assert rec["ok"], rec


def test_cli_decomp_wide():
    out = run_cli("--no-pallas", "--trials", "1", "decomp", "lq", "48", "80")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["residual"] < 80 * 1.2e-7


def test_cli_rsvd():
    out = run_cli("--no-pallas", "--trials", "1", "rsvd", "128", "64",
                  "--rank", "8", "--decay", "0.7")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["err2"] < 3 * rec["s_next"] + 1e-4


def test_cli_rsvd_sym():
    out = run_cli("--no-pallas", "--trials", "1", "rsvd", "96", "96",
                  "--rank", "8", "--decay", "0.7", "--sym")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["cmd"] == "eigh_rand"
    assert rec["ok"] and rec["err2"] < 3 * rec["w_next"] + 1e-4


def run_cli_mesh(*args):
    """CLI on the 8-device virtual CPU mesh (the `dist` harness path)."""
    return subprocess.run(
        [sys.executable, "-m", "cuda_qr_tpu", "--no-pallas", "--trials", "1",
         "--platform", "cpu", *args],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "PYTHONPATH": "/root/repo",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})


def test_cli_dist_tsqr():
    out = run_cli_mesh("dist", "tsqr", "512", "32", "--devices", "8",
                       "--strategy", "butterfly")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["devices"] == 8, rec
    assert rec["strategy"] == "butterfly"


def test_cli_dist_lstsq():
    out = run_cli_mesh("dist", "lstsq", "256", "48", "--devices", "8")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["x_rel_err"] < 1e-4, rec


def test_cli_dist_svd():
    out = run_cli_mesh("dist", "svd", "512", "32", "--devices", "8")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["sv_rel_err"] < 32 * 1.2e-7, rec


def test_cli_dist_rejects_short_shards():
    out = run_cli_mesh("dist", "tsqr", "256", "64", "--devices", "8")
    assert out.returncode == 2 and "m/devices" in out.stderr


def test_cli_stage_schedule_scoped():
    """--stage-schedule applies to direct-QR subcommands and is rejected
    with a clear message elsewhere (ADVICE r4 / VERDICT r4 item 7)."""
    out = run_cli("--no-pallas", "--dtype", "f64", "--trials", "1",
                  "--stage-schedule", "1,1", "factor", "256", "256")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"], rec
    out = run_cli("--no-pallas", "--trials", "1",
                  "--stage-schedule", "1,3", "svd", "64", "32")
    assert out.returncode == 2 and "--stage-schedule" in out.stderr
    out = run_cli("--no-pallas", "--trials", "1",
                  "--stage-schedule", "1,3", "eigh", "64")
    assert out.returncode == 2 and "--stage-schedule" in out.stderr


def test_cli_dist_svd_eigh_impl():
    out = run_cli_mesh("dist", "svd", "256", "16", "--devices", "8",
                       "--eigh-impl", "qdwh")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] and rec["eigh_impl"] == "qdwh", rec


def test_cli_mixed_mode():
    """--mixed (certified-MIXED: trailing bf16x3) factors with gates on.

    On CPU HIGH == HIGHEST numerically (no bf16 MXU passes), so this
    validates the flag wiring and that verification stays enabled; the
    precision trade itself is measured on TPU (RESULTS x14/x18)."""
    out = run_cli("--no-pallas", "--trials", "1", "--mixed",
                  "factor", "128", "64")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"], rec
    from cuda_qr_tpu.cli import _config
    import argparse
    import jax
    ns = argparse.Namespace(dtype="f32", no_pallas=True,
                            tsqr_leaf="householder", mixed=True)
    assert _config(ns).trailing_precision == jax.lax.Precision.HIGH
