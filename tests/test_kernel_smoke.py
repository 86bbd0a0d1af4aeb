"""The on-device Pallas compile-smoke gate (VERDICT r2 item 2).

Two layers:

- ``test_gate_runs_on_cpu_interpretless``: the gate machinery itself (labels,
  guard semantics, never-raise contract) exercised in-process on the CPU
  backend with the XLA fallbacks — cheap, always runs.
- ``test_gate_on_tpu``: subprocess-runs ``scripts/kernel_smoke.py`` WITHOUT
  the conftest's CPU forcing, so it AOT-compiles the real Mosaic kernels on
  the chip. Skipped when no TPU platform is reachable (the conftest pins this
  pytest process to CPU, so reachability is probed in the subprocess).
  Marked slow+tpu: first run pays real compiles; re-runs hit the persistent
  cache.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # strip the conftest's virtual-device CPU flags
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    # the axon plugin auto-selects when present; otherwise jax picks tpu/cpu
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        env["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"]
    return env


def test_gate_never_raises_and_reports_failures():
    """run_gate returns per-label results and ok=False on any failure,
    without raising — the contract bench.py's preflight relies on."""
    from pctd_tpu.ops.pallas import smoke

    orig = smoke._compile_serve

    def boom(backend, batch):
        if batch == 512:
            raise RuntimeError("synthetic lowering failure")

    smoke._compile_serve = boom
    try:
        results, ok = smoke.run_gate(serve_batches=(512,), train_batches=())
    finally:
        smoke._compile_serve = orig
    assert not ok
    assert results["serve_pallas_b512"]["ok"] is False
    assert "synthetic" in results["serve_pallas_b512"]["error"]
    assert results["serve_pallas_full_b512"]["ok"] is False


def test_gate_label_filter():
    from pctd_tpu.ops.pallas import smoke

    called = []
    orig_s, orig_t = smoke._compile_serve, smoke._compile_train
    smoke._compile_serve = lambda b, n: called.append((b, n))
    smoke._compile_train = lambda w, n: called.append((w, n))
    try:
        results, ok = smoke.run_gate(serve_batches=(128,),
                                     train_batches=(128,),
                                     which=["serve_pallas_full"])
    finally:
        smoke._compile_serve, smoke._compile_train = orig_s, orig_t
    assert ok
    assert list(results) == ["serve_pallas_full_b128"]
    assert called == [("pallas_full", 128)]


@pytest.mark.slow
@pytest.mark.tpu
def test_gate_on_tpu():
    env = _tpu_env()
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; d = jax.devices(); "
         "import sys; sys.exit(0 if d and d[0].platform != 'cpu' else 3)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300)
    if probe.returncode != 0:
        pytest.skip(f"no TPU reachable (rc={probe.returncode})")

    proc = subprocess.run(
        [sys.executable, "scripts/kernel_smoke.py", "--quick"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3000)
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, proc.stdout + proc.stderr[-2000:]
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    assert payload["ok"]
    assert all(r["ok"] for r in payload["results"].values())
