"""Benchmark: full VAE train-step throughput on the canonical configuration.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The primary metric is training throughput in 2-bar segments/sec/chip on the
canonical DisentangleVAE config (conv texture encoder), with the jitted step
doing on-device tensorization + forward + backward + clip + Adam. The value
reported is the THROUGHPUT config (bf16, large batch); the canonical-parity
B=128 numbers (bf16 + f32) ride along in "extra" with explicit batch/dtype
labels, as do tensorization throughput, sampling decode per backend
(pallas/xla), serving-workflow latency, per-section compile seconds, and an
analytic MFU estimate.

``vs_baseline`` is the ratio against the measured PyTorch reference on this
host (BASELINE_MEASURED.json; the reference publishes no numbers).

Cold-start discipline (VERDICT r4 item 1): rounds 2-4 all lost sections to
cold-cache compiles — r4's driver run paid 1,184 s compiling the headline
and skipped 15 of 16 sections. The fix is to make a cold run impossible:
committed AOT bundles (``aot_bundles/*.jaxexe``, exported by
``scripts/export_aot.py``) hold the fully-compiled executables for every
compile-heavy program in the default matrix; the bench preloads each
compatible bundle (same jax version / platform / device kind / device count
/ package-source fingerprint) and falls back to normal compilation on any
mismatch. With bundles, per-section compile_seconds are single-digit and
the whole default matrix fits the budget from a fresh checkout.

Wall-clock discipline (VERDICT r3 item 1) remains as the backstop:

- ``BENCH_BUDGET_S`` (env, default 1380 s = 23 min) is a hard deadline.
  Sections run in PRIORITY order (headline train throughput first, the gate
  and decode matrix after, optional extras last); before each section its
  estimated cost is checked against the remaining budget and the section is
  SKIPPED (recorded, never silent) when it cannot fit.
- Estimates: worst-case-observed cold costs (see _COLD_EST — single
  compiles of 1,265 s and 2,123 s were recorded in round 4), overridden by
  run-only estimates for AOT-covered sections, overridden by the self-tuned
  warm marker — which is accepted only while the package-source fingerprint
  matches AND every compiled program it recorded still exists in the cache
  dir (a wiped cache can no longer masquerade as warm).
- ``signal.alarm`` backstop at budget+60 s aborts the measurement phase and
  prints the best-known artifact; a watchdog thread force-prints and exits
  0 at budget+240 s if the main thread is wedged in an uninterruptible
  device wait (a single in-flight XLA/Mosaic compile cannot be preempted by
  a Python signal — with AOT bundles the default matrix has no such compile
  left, and without them the worst observed single compile, ~2,100 s, is
  longer than any margin: the scheduler's worst-case estimates keep it from
  being attempted when it cannot fit).

The artifact degrades; it never nulls and never times out.
"""
from __future__ import annotations

import hashlib
import json
import os
import signal
import statistics
import sys
import time
import traceback

PEAK_FLOPS = {  # per chip, dense
    "bfloat16": 197e12,   # TPU v5e bf16
    "float32": 98.5e12,
}

REPO = os.path.dirname(os.path.abspath(__file__))
PROGRESS_PATH = os.path.join(REPO, "bench_progress.json")
WARM_MARKER = os.path.join(
    os.environ.get("PCTD_JAX_CACHE", os.path.join(REPO, ".jax_cache")),
    "bench_warm.json")

BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1380"))
_T0 = time.monotonic()

_progress = {}      # label -> {"ok": bool, "seconds": N, ...}
_failures = []      # [{"section": ..., "error": ...}]
_skipped = []       # [label, ...] sections not run for budget reasons
_compile_s = {}     # label -> first-call (compile-dominated) seconds


class _BenchTimeout(BaseException):
    """Raised by the SIGALRM backstop; BaseException so section guards
    (which catch Exception) cannot swallow it."""


# Shared artifact state: the watchdog thread and the normal main() tail both
# print from these, single-shot.
import threading  # noqa: E402

_PRINT_LOCK = threading.Lock()   # guards _PRINTED: check-then-print is atomic
_PRINTED = [False]               # set True only AFTER a successful print
_R = {"decodes": []}
_baseline_g = None
_warm_at_start = False
_device_info = None     # set by the preflight liveness probe


def _probe_device_alive(timeout_s: float = 240.0) -> bool:
    """Run a trivial device op in a SUBPROCESS with a hard timeout.

    Rationale (round 4, measured): when the TPU runtime behind the tunnel
    wedges, jax.devices()/the first dispatch blocks forever inside C++ where
    SIGALRM cannot raise — the r3 driver run died exactly like this (rc=124,
    no JSON). A subprocess can always be killed, so the probe converts "hang
    forever" into "known-dead in <= timeout_s", and the bench then reports a
    parseable artifact with the outage recorded instead of timing out.

    A silent CPU fallback is NOT ok (ADVICE r4): if TPU init fails fast, jax
    falls back to host CPU and every "TPU" section would run (and publish
    per-chip numbers) on CPU. The probe reports the platform and the bench
    requires a non-CPU device unless the caller explicitly exported
    JAX_PLATFORMS=cpu (deliberate CPU benchmarking)."""
    global _device_info
    import subprocess
    code = ("import jax, jax.numpy as jnp\n"
            "v = float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())\n"
            "assert v == 512.0, v\n"
            "d = jax.devices()[0]\n"
            "print('DEVICE_OK', d.platform, '|', d)\n")
    t0 = time.perf_counter()
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        _emit_progress("device_probe", {
            "ok": False, "seconds": round(time.perf_counter() - t0, 1),
            "error": f"device unreachable: trivial op did not complete in "
                     f"{timeout_s:.0f}s (tunnel/runtime wedged)"})
        return False
    out = proc.stdout.strip().splitlines()
    ok = proc.returncode == 0 and any("DEVICE_OK" in ln for ln in out)
    platform = None
    if ok:
        rest = next(ln.split("DEVICE_OK ", 1)[1]
                    for ln in out if "DEVICE_OK" in ln)
        platform, _, info = rest.partition("|")
        platform, _device_info = platform.strip(), info.strip()
        # only an EXPLICIT first-choice cpu counts: "tpu,cpu" is an
        # allow-fallback setting, not a request to benchmark host CPU
        first = os.environ.get(
            "JAX_PLATFORMS", "").lower().split(",")[0].strip()
        cpu_requested = first == "cpu"
        if platform == "cpu" and not cpu_requested:
            _emit_progress("device_probe", {
                "ok": False, "seconds": round(time.perf_counter() - t0, 1),
                "platform": platform,
                "error": "TPU init failed and jax silently fell back to "
                         "host CPU — refusing to publish CPU-measured "
                         "numbers as per-chip TPU results (set "
                         "JAX_PLATFORMS=cpu to benchmark CPU on purpose)"})
            return False
    _emit_progress("device_probe", {
        "ok": ok, "seconds": round(time.perf_counter() - t0, 1),
        "platform": platform,
        **({} if ok else {"error": f"probe rc={proc.returncode}: "
                          f"{proc.stderr[-300:]}"})})
    return ok


def _start_watchdog():
    """Daemon thread that force-prints the artifact and exits 0 when the
    deadline passes — the backstop behind the SIGALRM backstop, for the case
    where the main thread is blocked in an uninterruptible device wait.

    Margin (+240 s past budget): the SIGALRM fires at budget+60; a main
    thread that has not printed by budget+240 is either wedged in a C++
    device wait or stuck in a single pathological compile — in both cases
    the in-flight section is lost and the best-known artifact is what the
    driver gets. With AOT bundles preloaded the default matrix has no
    multi-minute compiles left, so a healthy run never reaches this."""
    deadline = BUDGET_S + 240.0

    def run():
        while True:
            time.sleep(5)
            if time.monotonic() - _T0 > deadline:
                print("[bench] WATCHDOG: no artifact by budget+240s (main "
                      "thread wedged in a device wait or a pathological "
                      "compile) — force-printing best-known artifact",
                      file=sys.stderr, flush=True)
                try:
                    _print_artifact(lock_timeout=15.0)
                except BaseException:  # noqa: BLE001 — emit SOMETHING
                    traceback.print_exc(file=sys.stderr)
                    with _PRINT_LOCK:
                        if not _PRINTED[0]:
                            print(json.dumps({
                                "metric": "train_segments_per_sec_per_chip",
                                "value": None,
                                "unit": "2-bar segments/sec/chip",
                                "vs_baseline": None,
                                "extra": {"fatal": "watchdog artifact "
                                          "serialization failed"}}))
                            _PRINTED[0] = True
                finally:
                    sys.stdout.flush()
                    os._exit(0)

    threading.Thread(target=run, daemon=True, name="bench-watchdog").start()


def _remaining() -> float:
    return BUDGET_S - (time.monotonic() - _T0)


def _emit_progress(label: str, payload: dict):
    _progress[label] = payload
    try:
        with open(PROGRESS_PATH, "w") as f:
            json.dump(_progress, f, indent=1, default=str)
    except OSError:
        pass
    status = ("ok" if payload.get("ok")
              else "SKIP " + payload["skipped"] if payload.get("skipped")
              else f"FAIL {payload.get('error')}")
    print(f"[bench] {label}: {status} ({payload.get('seconds')}s, "
          f"{_remaining():.0f}s left)", file=sys.stderr, flush=True)


def _guard(label: str, fn, *args, **kwargs):
    """Run one bench section; on failure, record + continue (never raise —
    except the alarm's _BenchTimeout, which aborts the measurement phase)."""
    t0 = time.perf_counter()
    try:
        result = fn(*args, **kwargs)
        dt = round(time.perf_counter() - t0, 1)
        _emit_progress(label, {"ok": True, "seconds": dt, "result": result})
        _warm_record(label, dt)
        return result
    except _BenchTimeout:
        _failures.append({"section": label, "error": "budget deadline hit "
                          "mid-section (SIGALRM backstop)"})
        _emit_progress(label, {"ok": False, "error": "deadline",
                               "seconds": round(time.perf_counter() - t0, 1)})
        raise
    except Exception as e:  # noqa: BLE001 — unattended driver run
        traceback.print_exc(file=sys.stderr)
        err = f"{type(e).__name__}: {str(e)[:300]}"
        _failures.append({"section": label, "error": err})
        _emit_progress(label, {"ok": False, "error": err,
                               "seconds": round(time.perf_counter() - t0, 1)})
        return None


# ---------------------------------------------------------------------------
# Budget scheduling: per-section cold-cache cost estimates — WORST CASE
# OBSERVED across rounds 3-4 (not best-case history: VERDICT r4 item 2 —
# the driver's cold r04 run measured 1,265 s for the headline against an
# estimated 280, and the r04 gate recorded a 2,123 s serve_pallas_b512
# Mosaic compile against 115-124 s siblings). Overridden, in order, by:
#  1. the AOT bundle preload (committed *.jaxexe executables make a
#     section's compiles single-digit seconds — see _AOT_COVERED), and
#  2. the self-tuned warm marker, accepted only while the package-source
#     fingerprint matches AND every compiled-program file the marker
#     recorded is still present in the cache dir (a wiped cache can no
#     longer masquerade as warm).
# ---------------------------------------------------------------------------

_COLD_EST = {
    "train_b2048_frame_kernel": 1300.0,   # driver r04 observed 1265 s cold
    "tensorize": 90.0,
    "train_b128_bf16": 220.0,
    # healthy-stack worst: 115+139+110+127 s serving compiles + ~200 s
    # train_frame (round-5 fresh-compile measurements). Round 4 recorded a
    # 2,123 s serve_pallas_b512 compile in this gate — reproduced fresh in
    # round 5 at 109.9 s, so that reading was remote-compile-service/tunnel
    # variance while the stack degraded toward that round's outage, not a
    # Mosaic pathology (ARCHITECTURE.md "Compile-time variance").
    "kernel_gate": 800.0,
    "decode_pallas_b128": 200.0,
    "decode_pallas_full_b128": 210.0,
    "decode_xla_b128": 160.0,
    "decode_pallas_b512": 300.0,          # fresh-measured 109.9 s; see gate
    "decode_pallas_full_b512": 210.0,
    "decode_xla_b512": 160.0,
    "serve_workflows": 560.0,   # incl. the fresh-process cold-start probe
    "train_b128_frame_kernel": 200.0,
    "train_b128_f32": 260.0,
    "train_b4096_auto_accum": 400.0,
    "train_b2048_xla": 500.0,
    "train_b2048_frame_kernel_nofuse": 1300.0,  # same Mosaic size as headline
    "multichip_cpu_mesh": 300.0,
}

#: run-only estimate when every compiled program a section needs was
#: preloaded from a committed AOT bundle (measurement + tiny dispatch
#: overhead; no compiles).
_AOT_EST = {
    "train_b2048_frame_kernel": 120.0,
    "tensorize": 60.0,
    "train_b128_bf16": 60.0,
    "kernel_gate": 90.0,
    "decode_pallas_b128": 60.0,
    "decode_pallas_full_b128": 60.0,
    "decode_xla_b128": 60.0,
    "decode_pallas_b512": 90.0,
    "decode_pallas_full_b512": 90.0,
    "decode_xla_b512": 90.0,
    "serve_workflows": 360.0,   # incl. the fresh-process cold-start probe
    "train_b128_frame_kernel": 60.0,
    "train_b128_f32": 60.0,
    "train_b4096_auto_accum": 120.0,
    "train_b2048_xla": 120.0,
    "train_b2048_frame_kernel_nofuse": 120.0,
}

_AOT_COVERED = set()    # sections whose programs all preloaded from bundles
_AOT_VALID = set()      # bundle filenames compatible with this runtime
AOT_DIR = os.environ.get("PCTD_AOT_DIR", os.path.join(REPO, "aot_bundles"))

#: keyword args of _bench_train_step per train section — shared between the
#: measurement calls and the AOT-coverage check so they cannot drift.
_TRAIN_SECTION_KW = {
    "train_b2048_frame_kernel": dict(
        batch_size=2048, compute_dtype="bfloat16", remat=True,
        frame_kernel=True),
    "train_b128_bf16": dict(compute_dtype="bfloat16"),
    "train_b128_frame_kernel": dict(
        compute_dtype="bfloat16", remat=True, frame_kernel=True),
    "train_b128_f32": dict(compute_dtype="float32"),
    "train_b4096_auto_accum": dict(
        batch_size=4096, compute_dtype="bfloat16", remat=True,
        frame_kernel=True),
    "train_b2048_xla": dict(
        batch_size=2048, compute_dtype="bfloat16", remat=True,
        unroll_dur=5),
    "train_b2048_frame_kernel_nofuse": dict(
        batch_size=2048, compute_dtype="bfloat16", remat=True,
        frame_kernel=True, fused=False),
}

_TENSORIZE_BATCH = 16384

#: gate combo -> the bundle that proves the combo compiles (the bundle IS
#: that compiled program; the decode sections then execute it)
_GATE_BUNDLES = {
    "serve_pallas_b128": "decode_pallas_b128.jaxexe",
    "serve_pallas_full_b128": "decode_pallas_full_b128.jaxexe",
    "serve_pallas_b512": "decode_pallas_b512.jaxexe",
    "serve_pallas_full_b512": "decode_pallas_full_b512.jaxexe",
}


def _train_cfgs(batch_size: int = 128, compute_dtype: str = "float32",
                remat: bool = False, unroll_dur: int = 1,
                frame_kernel: bool = False, fused=None, **_ignored):
    """The (ModelConfig, TrainConfig) a train section benches — one
    construction for measurement, coverage and export."""
    import dataclasses

    from pctd_tpu.config import ModelConfig, TrainConfig

    mcfg = dataclasses.replace(ModelConfig(), compute_dtype=compute_dtype,
                               remat_frames=remat, unroll_dur=unroll_dur,
                               train_frame_kernel=frame_kernel,
                               **({} if fused is None
                                  else {"fused_loss": fused}))
    return mcfg, TrainConfig(batch_size=batch_size)


def _compute_aot_coverage():
    """Fill _AOT_VALID (runtime-compatible bundle filenames) and
    _AOT_COVERED (sections whose every compile-heavy program has a valid
    bundle) from aot_bundles/manifest.json — meta-only, no multi-MB reads."""
    from pctd_tpu.train import aot_steps
    from pctd_tpu.utils import aot

    manifest = aot.read_manifest(AOT_DIR)
    if not manifest:
        return
    here = aot.runtime_meta()
    src = aot.source_fingerprint()
    for name, meta in manifest.items():
        if not os.path.exists(os.path.join(AOT_DIR, name)):
            continue
        if any(meta.get(k) != here.get(k) for k in
               ("jax_version", "platform", "device_kind", "num_devices")):
            continue
        if meta.get("source_fp") != src:
            continue
        _AOT_VALID.add(name)
    if not _AOT_VALID:
        return
    for label, kw in _TRAIN_SECTION_KW.items():
        keys = aot_steps.program_keys(*_train_cfgs(**kw))
        need = {f"train_{k}_{v}.jaxexe" for k, v in keys.items()}
        if need <= _AOT_VALID:
            _AOT_COVERED.add(label)
    if f"tensorize_bench_b{_TENSORIZE_BATCH}.jaxexe" in _AOT_VALID:
        _AOT_COVERED.add("tensorize")
    for backend, bs in (("pallas", 128), ("pallas_full", 128),
                        ("xla", 128), ("pallas", 512),
                        ("pallas_full", 512), ("xla", 512)):
        if f"decode_{backend}_b{bs}.jaxexe" in _AOT_VALID:
            _AOT_COVERED.add(f"decode_{backend}_b{bs}")
    if {"encode_b128.jaxexe", "decode_pallas_b128.jaxexe"} <= _AOT_VALID:
        _AOT_COVERED.add("serve_workflows")
    if (set(_GATE_BUNDLES.values()) <= _AOT_VALID
            and "train_b2048_frame_kernel" in _AOT_COVERED):
        _AOT_COVERED.add("kernel_gate")


_MIN_HEADROOM = 45.0


def _tree_fingerprint() -> str:
    """Content hash of every package source that feeds the compiled
    programs — exactly what invalidates the persistent compile cache."""
    h = hashlib.sha256()
    for root, _, files in sorted(os.walk(os.path.join(REPO, "pctd_tpu"))):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            p = os.path.join(root, name)
            h.update(p.encode())
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


def _cache_program_files() -> list:
    """Names of the compiled-program files currently in the cache dir (the
    warm marker's own json is excluded)."""
    try:
        return sorted(n for n in os.listdir(os.path.dirname(WARM_MARKER))
                      if not n.endswith(".json"))
    except OSError:
        return []


_warm_invalid_reason = None


def _runtime_marker() -> dict:
    """Runtime identity for the warm marker: a jax upgrade or device-kind
    change invalidates BOTH the AOT bundles and every persistent-cache
    entry (XLA cache keys embed the compiler version), so warm estimates
    recorded under another runtime must not survive it."""
    try:
        from pctd_tpu.utils import aot
        return aot.runtime_meta()
    except Exception:  # noqa: BLE001 — device init failure: no tuning
        return {"unavailable": True}


def _load_warm_marker() -> dict:
    """Accept the marker's self-tuned estimates only when (a) the package
    sources are byte-identical to the recording run, (b) every compiled
    program the marker saw in the cache is still there, and (c) the jax
    runtime/device identity matches. (b) is what makes a mid-round cache
    wipe visible: round 4's driver run reported warm_marker_matched=true
    while every compile was stone cold, because the marker file survived
    the wipe that deleted the programs; (c) closes the same masquerade for
    a jax upgrade (cache files survive but are all misses)."""
    global _warm_invalid_reason
    try:
        with open(WARM_MARKER) as f:
            m = json.load(f)
    except (OSError, ValueError):
        _warm_invalid_reason = "no marker"
        return {}
    if m.get("fingerprint") != _FINGERPRINT:
        _warm_invalid_reason = "package sources changed since marker"
        return {}
    if m.get("runtime") is not None and m["runtime"] != _runtime_marker():
        _warm_invalid_reason = "jax runtime/device changed since marker"
        return {}
    recorded = m.get("cache_files")
    if recorded is not None:
        missing = sorted(set(recorded) - set(_cache_program_files()))
        if missing:
            _warm_invalid_reason = (
                f"{len(missing)}/{len(recorded)} compiled programs the "
                "marker recorded are gone from the cache (wiped?)")
            return {}
    return m.get("sections", {})


_FINGERPRINT = _tree_fingerprint()
_warm = {}          # label -> actual seconds from a prior matching run


def _warm_record(label: str, seconds: float):
    _warm[label] = seconds
    try:
        os.makedirs(os.path.dirname(WARM_MARKER), exist_ok=True)
        with open(WARM_MARKER, "w") as f:
            json.dump({"fingerprint": _FINGERPRINT, "sections": _warm,
                       "cache_files": _cache_program_files(),
                       "runtime": _runtime_marker()}, f)
    except OSError:
        pass


def _estimate(label: str) -> float:
    if label in _warm:
        return _warm[label] * 1.5 + 15.0
    if label in _AOT_COVERED:
        return _AOT_EST.get(label, 90.0)
    return _COLD_EST.get(label, 120.0)


def _section(label: str, fn, *args, required: bool = False,
             est: float | None = None, **kwargs):
    """Budget-aware section runner: skip (recorded) when the estimated cost
    does not fit the remaining budget. ``required`` sections always run —
    the headline must be attempted even on a fully cold cache."""
    need = max(_MIN_HEADROOM, est if est is not None else _estimate(label))
    if not required and _remaining() < need:
        _skipped.append(label)
        _emit_progress(label, {
            "ok": False, "skipped": f"budget ({_remaining():.0f}s left < "
            f"~{need:.0f}s estimated)", "seconds": 0.0})
        return None
    return _guard(label, fn, *args, **kwargs)


# ---------------------------------------------------------------------------
# Measurement discipline (VERDICT r1 #2): every number is the MEDIAN of
# REPEATS independently-synced chains (after warmup), and each result carries
# its relative spread (max-min)/median as a machine-contention sentinel.
# ---------------------------------------------------------------------------

REPEATS = 5
SPREAD_WARN = 0.15

_spreads = []       # (label, rel_spread) of every timed section this run


def _median_time(chain, label: str, repeats: int = REPEATS):
    """Run ``chain()`` (which must fully sync the device before returning)
    ``repeats`` times; record spread; return (median, rel_spread).

    ``_hostsync`` chains are excluded from the contention sentinel: they
    deliberately sync the host EVERY step, so their spread measures remote
    tunnel RTT jitter (20-45% on this stack), not machine contention — and
    they were flagging otherwise-clean runs as CONTENDED."""
    times = [chain() for _ in range(repeats)]
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med else 0.0
    if not label.endswith("_hostsync"):
        _spreads.append((label, spread))
    return med, spread


def _bench_train_step(n_steps: int = 12, batch_size: int = 128,
                      compute_dtype: str = "float32",
                      with_cost: bool = False, remat: bool = False,
                      unroll_dur: int = 1, frame_kernel: bool = False,
                      fused: bool = None,
                      compile_label: str = None):
    import jax
    import jax.numpy as jnp

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pctd_tpu.train.trainer import init_state, make_train_step
    from pctd_tpu.data.synthetic import example_batch as _example_batch

    # note: with frame_kernel, remat_frames is functionally moot (the
    # kernel's backward recomputes on-chip) but keeps the analytic FLOPs
    # accounting correct — the recompute happens either way.
    mcfg, tcfg = _train_cfgs(batch_size=batch_size,
                             compute_dtype=compute_dtype, remat=remat,
                             unroll_dur=unroll_dur,
                             frame_kernel=frame_kernel, fused=fused)
    state, tx = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    aot_exes, aot_skipped = {}, []
    if os.path.isdir(AOT_DIR):
        from pctd_tpu.train.aot_steps import load_train_step_exes
        aot_exes, aot_skipped = load_train_step_exes(mcfg, tcfg, AOT_DIR)
    step = make_train_step(mcfg, tcfg, tx, aot_exes=aot_exes or None)

    pr, chord, shift = _example_batch(batch_size, seed=0)
    pr, chord, shift = jnp.asarray(pr), jnp.asarray(chord), jnp.asarray(shift)

    # compile + warmup, hard host sync (float(); block_until_ready alone is
    # unreliable on this stack's async relay). First call is compile-
    # dominated — recorded as this section's compile_seconds.
    t_compile = time.perf_counter()
    state, metrics = step(state, pr, chord, shift)
    float(metrics["loss"])
    compile_s = round(time.perf_counter() - t_compile, 1)
    if compile_label:
        _compile_s[compile_label] = compile_s
    state, metrics = step(state, pr, chord, shift)
    float(metrics["loss"])

    # analytic matmul FLOPs (hand-counted from config dims — free): always
    # recorded so MFU computes for WHICHEVER B=2048 row wins the headline
    # (the r5 cold run saw nofuse edge out fused and lose its MFU field).
    del with_cost
    flops = _train_step_flops(mcfg, tcfg, tx, pr, chord, shift, state)

    # steady-state: async chain of n_steps (each step's params feed the next,
    # so all steps really execute) with one final host sync — the per-step
    # tunnel RTT (~25 ms) is amortized, matching real training-loop behavior.
    # Median of REPEATS chains; state threads across chains on purpose.
    loss_box = {}

    def chain():
        nonlocal state
        t0 = time.perf_counter()
        s, m = state, None
        for _ in range(n_steps):
            s, m = step(s, pr, chord, shift)
        loss_box["loss"] = float(m["loss"])
        state = s
        return (time.perf_counter() - t0) / n_steps

    label = f"train_b{batch_size}_{compute_dtype}" + \
        ("_kernel" if frame_kernel else "")
    dt, spread = _median_time(chain, label)

    # per-step host-synced variant for reference
    def sync_chain():
        nonlocal state
        t0 = time.perf_counter()
        s = state
        for _ in range(4):
            s, m = step(s, pr, chord, shift)
            loss_box["loss"] = float(m["loss"])
        state = s
        return (time.perf_counter() - t0) / 4

    dt_sync, _ = _median_time(sync_chain, label + "_hostsync", repeats=3)
    from pctd_tpu.train.trainer import auto_accum_steps
    return {"segments_per_sec": batch_size / dt, "step_seconds": dt,
            "step_seconds_hostsync": dt_sync, "final_loss": loss_box["loss"],
            "batch_size": batch_size, "dtype": compute_dtype,
            "remat": remat, "flops_per_step": flops,
            "compile_seconds": compile_s, "rel_spread": round(spread, 4),
            "accum_steps": auto_accum_steps(mcfg, tcfg),
            "aot_programs": sorted(aot_exes) or None,
            "aot_skipped": [list(s) for s in aot_skipped] or None}


def _train_step_flops(mcfg, tcfg, *_unused):
    """Analytic matmul FLOPs of one train step (per batch).

    Hand-counted from the config dims — XLA's compiled cost model counts each
    while-loop body ONCE, underreporting scan-heavy programs ~20x (measured
    1.3 TF vs ~25 TF at B=2048), so it is useless for MFU here. Only matmul
    terms are counted (elementwise work is negligible); backward = 2x
    forward, frame remat adds one extra forward of the frame chain.
    """
    B = tcfg.batch_size
    T = mcfg.pianotree.num_step
    K = mcfg.pianotree.max_simu_note          # 16 slots, K-1 decoded
    W = mcfg.pianotree.dur_width
    mm = lambda m, n, k: 2.0 * m * n * k      # (m,k)@(k,n) mul-adds

    def gru_seq(steps, din, h, bidir=False):
        return (2 if bidir else 1) * steps * mm(1, 3 * h, din + h)

    fwd = 0.0
    # chord encoder: bi-GRU(36 -> chd_enc_hidden) over 8 beats + heads
    fwd += gru_seq(8, 36, mcfg.chd_enc_hidden, bidir=True)
    fwd += 2 * mm(1, mcfg.chd_z_dim, 2 * mcfg.chd_enc_hidden)
    # conv texture encoder: conv + fc1/fc2 + bi-GRU + heads
    fwd += mm(8 * 29, mcfg.txt_conv_channels, 4 * 12)
    fwd += mm(8, 1000, 29 * mcfg.txt_conv_channels) + mm(
        8, mcfg.txt_emb_size, 1000)
    fwd += gru_seq(8, mcfg.txt_emb_size, mcfg.txt_enc_hidden, bidir=True)
    fwd += 2 * mm(1, mcfg.txt_z_dim, 2 * mcfg.txt_enc_hidden)
    # decoder time level
    z_dim = mcfg.z_dim
    fwd += mm(1, mcfg.dec_time_hidden, z_dim) + mm(1, mcfg.dec_z_in, z_dim)
    fwd += gru_seq(T, mcfg.dec_z_in + 2 * mcfg.dec_emb_hidden,
                   mcfg.dec_time_hidden)
    # frame chain (note + dur + pred-emb + summaries) — rematerialized part
    frame = 0.0
    frame += T * mm(1, mcfg.dec_notes_hidden, mcfg.dec_time_hidden)
    frame += T * gru_seq(K - 1, mcfg.dec_time_hidden + mcfg.note_emb_size,
                         mcfg.dec_notes_hidden)
    P = mcfg.pianotree.pitch_range
    frame += T * (K - 1) * mm(1, P, mcfg.dec_notes_hidden)
    frame += T * (K - 1) * mm(1, mcfg.dec_dur_hidden,
                              P + mcfg.dec_notes_hidden)
    frame += T * (K - 1) * gru_seq(W, W, mcfg.dec_dur_hidden)
    frame += T * (K - 1) * mm(1, 2, mcfg.dec_dur_hidden)
    frame += T * (K - 1) * mm(1, mcfg.note_emb_size,
                              mcfg.pianotree.note_size)
    # pred-frame + gt-frame bi-GRU summaries
    frame += 2 * T * gru_seq(K, mcfg.note_emb_size, mcfg.dec_emb_hidden,
                             bidir=True)
    fwd += frame
    # note embedding of the gt grid
    fwd += T * K * mm(1, mcfg.note_emb_size, mcfg.pianotree.note_size)
    # chord decoder: 8-step GRU + heads
    fwd += gru_seq(8, 36 + mcfg.chd_dec_z_in, mcfg.chd_dec_hidden)
    fwd += 8 * mm(1, 36, mcfg.chd_dec_hidden)
    total = 3.0 * fwd + (frame if mcfg.remat_frames else 0.0)
    return B * total


def tensorize_bench_fn():
    """The tensorize section's jittable program — shared with
    scripts/export_aot.py so the committed bundle is THIS program."""
    from pctd_tpu.config import PianoTreeSpec
    from pctd_tpu.data.tensorize import tensorize_batch

    return lambda p, c, s: tensorize_batch(
        p, c, s, spec=PianoTreeSpec(), with_detrend=True)


def _bench_tensorize(batch_size: int = _TENSORIZE_BATCH, n_iters: int = 30):
    # n_iters=30 (round 5): at ~0.14 s/iter a 10-iter chain is ~1.4 s, small
    # enough that remote-tunnel dispatch jitter alone produced 22-32% chain
    # spreads that tripped the 'contended' sentinel on otherwise-clean runs.
    import jax
    import jax.numpy as jnp

    from pctd_tpu.data.synthetic import example_batch as _example_batch

    pr, chord, shift = _example_batch(batch_size, seed=1)
    pr, chord, shift = jnp.asarray(pr), jnp.asarray(chord), jnp.asarray(shift)
    f = None
    bundle = os.path.join(AOT_DIR, f"tensorize_bench_b{batch_size}.jaxexe")
    if f"tensorize_bench_b{batch_size}.jaxexe" in _AOT_VALID:
        from pctd_tpu.utils import aot
        try:
            f, _ = aot.load_exe(bundle)
        except Exception:  # noqa: BLE001 — fall back to normal compile
            traceback.print_exc(file=sys.stderr)
            f = None
    if f is None:
        f = jax.jit(tensorize_bench_fn())
    t_compile = time.perf_counter()
    out = f(pr, chord, shift)
    float(out["x"][0, 0, 0, 0])
    _compile_s["tensorize"] = round(time.perf_counter() - t_compile, 1)
    # accumulate-chain so every iteration really executes, with one final sync
    # (per-iteration host syncs are dominated by ~30 ms tunnel RTT)
    add = jax.jit(lambda a, o: a + o["pr_mat"].sum())

    def chain():
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = f(pr, chord, shift)
            acc = add(acc, out)
        float(acc)
        return (time.perf_counter() - t0) / n_iters

    dt, _ = _median_time(chain, "tensorize")
    return batch_size / dt


def _bench_sampler(backend: str, batch_size: int = 128, n_iters: int = 8,
                   repeats: int = 7, respread: float = 0.10):
    """Pure autoregressive decode (inference mode) throughput, per backend
    ('pallas' fused frame kernel vs 'xla' nested scans).

    Decode rows re-measure once when the first pass's spread exceeds
    ``respread`` (VERDICT r3 item 7: the published B=512 rows carried a 29%
    contention spread) and the lower-spread pass is kept; every row carries
    its rel_spread.

    The decode program is built through the SAME Sampler construction the
    serving daemon uses, so a committed AOT bundle
    (``decode_{backend}_b{batch}.jaxexe``, exported via Sampler.export_aot)
    drops straight into the executable cache and the row measures the
    deployed program with no compile. (This also aligns the xla row with
    serving's ``unroll_dur=5`` variant — the program users actually run.)
    """
    import jax
    import jax.numpy as jnp

    from pctd_tpu.config import ModelConfig
    from pctd_tpu.models import disentangle_vae as dv
    from pctd_tpu.models.sampler import Sampler

    mcfg = ModelConfig()
    params = dv.init_params(jax.random.PRNGKey(0), mcfg)
    z_chd = jax.random.normal(jax.random.PRNGKey(1),
                              (batch_size, mcfg.chd_z_dim))
    z_rhy = jax.random.normal(jax.random.PRNGKey(2),
                              (batch_size, mcfg.txt_z_dim))
    sampler = Sampler(params, mcfg, frame_decoder=backend)
    aot_loaded = False
    name = f"decode_{backend}_b{batch_size}.jaxexe"
    if name in _AOT_VALID:
        from pctd_tpu.utils import aot
        try:
            exe, _ = aot.load_exe(os.path.join(AOT_DIR, name))
            sampler._compiled[(backend, batch_size)] = exe
            aot_loaded = True
        except Exception:  # noqa: BLE001 — fall back to normal compile
            traceback.print_exc(file=sys.stderr)
    decode = sampler._decode_degrading
    add = jax.jit(lambda a, e: a + e.sum())
    t_compile = time.perf_counter()
    est = decode(z_chd, z_rhy)
    # sync via an on-device reduction — NEVER index/fetch the raw grid: it
    # carries the Mosaic tiled layout and de-tiles at ~4 KB/s through the
    # transfer path (minutes per sync; pctd_tpu/utils/host.py)
    float(add(jnp.zeros((), jnp.int32), est))
    _compile_s[f"decode_{backend}_b{batch_size}"] = round(
        time.perf_counter() - t_compile, 1)

    def chain():
        acc = jnp.zeros((), jnp.int32)
        t0 = time.perf_counter()
        for _ in range(n_iters):
            e = decode(z_chd, z_rhy)
            acc = add(acc, e)
        float(acc)
        return (time.perf_counter() - t0) / n_iters

    label = f"sample_decode_{backend}_b{batch_size}"
    dt, spread = _median_time(chain, label, repeats=repeats)
    if spread > respread and _remaining() > 60:
        dt2, spread2 = _median_time(chain, label + "_retry",
                                    repeats=repeats)
        if spread2 < spread:
            dt, spread = dt2, spread2
    return {"backend": backend, "batch_size": batch_size,
            "segments_per_sec": batch_size / dt,
            "ms_per_batch": dt * 1e3, "rel_spread": round(spread, 4),
            "aot_bundle": aot_loaded}


def _bench_serve_workflows(fixed_batch: int = 128, repeats: int = 3):
    """End-to-end serving-daemon latency (VERDICT r3 item 6): MIDI in ->
    MIDI out through scripts/serve.py's Server for each of the four
    latent-control workflows, at the production fixed-batch shape against
    the gate-verified pallas backend. Reference flows: model.py:117-242.

    fixed_batch=128 deliberately shares the decode program with the
    decode_pallas_b128 bench row (and the gate), so this section adds one
    small encode compile, not another multi-minute Mosaic build.
    """
    import importlib.util
    import tempfile

    import jax

    from pctd_tpu.config import ModelConfig
    from pctd_tpu.models.disentangle_vae import DisentangleVAE
    from pctd_tpu.models.sampler import Sampler

    spec = importlib.util.spec_from_file_location(
        "pctd_serve", os.path.join(REPO, "scripts", "serve.py"))
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    demo = os.path.join(REPO, "runs", "demo_realmidi",
                        "1_compositional_style_transfer",
                        "16bar_style_transfer")
    mid_a = os.path.join(demo, "A_original.mid")
    mid_b = os.path.join(demo, "B_original.mid")

    cfg = ModelConfig()
    model = DisentangleVAE.init_model(jax.random.PRNGKey(0), cfg)
    aot_dir = AOT_DIR if "serve_workflows" in _AOT_COVERED else None
    sampler = Sampler(model.params, cfg, frame_decoder="pallas",
                      fixed_batch=fixed_batch, aot_dir=aot_dir)
    server = serve_mod.Server(sampler, cfg.pianotree, max_windows=8, cfg=cfg)

    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        reqs = {
            "style_transfer": {"op": "style_transfer", "content": mid_a,
                               "style": mid_b,
                               "out": os.path.join(tmp, "st.mid"),
                               "fix": "chord"},
            "variation": {"op": "variation", "input": mid_a,
                          "out": os.path.join(tmp, "var.mid"),
                          "scale": 0.5, "seed": 3},
            "prior": {"op": "prior", "input": mid_a,
                      "out": os.path.join(tmp, "prior.mid"),
                      "sample": "texture", "seed": 0},
            "interp": {"op": "interp", "a": mid_a, "b": mid_b,
                       "out": os.path.join(tmp, "i_%02d.mid"),
                       "count": 5, "what": "chord"},
        }
        first = True
        for op, req in reqs.items():
            t0 = time.perf_counter()
            resp = server.handle(dict(req))          # compile + warmup
            warm_s = time.perf_counter() - t0
            if first:
                _compile_s["serve_encode_decode"] = round(warm_s, 1)
                first = False
            if not resp.get("ok", True):
                raise RuntimeError(f"{op}: {resp}")
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                server.handle(dict(req))
                times.append((time.perf_counter() - t0) * 1e3)
            out[op] = {"p50_ms": round(statistics.median(times), 1),
                       "max_ms": round(max(times), 1),
                       "windows": int(resp.get("windows", 0)),
                       "first_call_ms": round(warm_s * 1e3, 1)}
    out["fixed_batch"] = fixed_batch
    out["backend"] = sampler.frame_decoder

    # Deploy cold-start (VERDICT r4 item 7): preload the COMMITTED bundles
    # (aot_bundles/, exported by scripts/export_aot.py) into a FRESH
    # sampler and time one request — the daemon cold-start a fresh checkout
    # pays with `serve.py --aot-dir aot_bundles`. Recorded best-effort: no
    # valid bundles records the reason instead of failing the section.
    try:
        if "serve_workflows" not in _AOT_COVERED:
            out["aot"] = {"error": "no compatible committed bundles "
                          "(aot_bundles/ missing, stale, or wrong runtime)"}
            return out
        with tempfile.TemporaryDirectory() as tmp2:
            t0 = time.perf_counter()
            fresh = Sampler(model.params, cfg, frame_decoder="pallas",
                            fixed_batch=fixed_batch, aot_dir=AOT_DIR)
            preload_s = time.perf_counter() - t0
            server2 = serve_mod.Server(fresh, cfg.pianotree, max_windows=8,
                                       cfg=cfg)
            req = {"op": "variation", "input": mid_a, "scale": 0.5,
                   "seed": 3, "out": os.path.join(tmp2, "v.mid")}
            t0 = time.perf_counter()
            resp = server2.handle(req)
            first_ms = (time.perf_counter() - t0) * 1e3
            out["aot"] = {
                "bundle_dir": "aot_bundles (committed)",
                "preload_s": round(preload_s, 2),
                "first_request_ms": round(first_ms, 1),
                "loaded": len(fresh.aot_report["loaded"]),
                "skipped": len(fresh.aot_report["skipped"]),
                # warm-process: this bench process's jax client is already
                # initialized — see fresh_process below for the number a
                # real daemon start pays
                "cold_start_warm_process_s": round(
                    preload_s + first_ms / 1e3, 2),
            }
            if not resp.get("ok", True):
                out["aot"]["error"] = str(resp)
    except Exception as e:  # noqa: BLE001 — AOT support is best-effort here
        out["aot"] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}

    # the honest deploy number: a FRESH PROCESS (interpreter + jax client
    # init + param init + bundle preload + first request) — a warm-process
    # measurement understates what `serve.py --aot-dir` actually pays
    # (review finding, round 5). Bounded by the remaining budget.
    try:
        out["aot"]["fresh_process"] = _serve_fresh_process_cold_start(
            fixed_batch, mid_a)
    except Exception as e:  # noqa: BLE001
        out["aot"]["fresh_process"] = {
            "error": f"{type(e).__name__}: {str(e)[:300]}"}
    return out


def _serve_fresh_process_cold_start(fixed_batch: int, mid_a: str) -> dict:
    """Time a serving-daemon cold start in a SUBPROCESS: everything a
    deploy pays from `python serve.py --aot-dir` to the first response."""
    import subprocess
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        code = (
            "import json, os, sys, time\n"
            "t_proc = time.perf_counter()\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "from pctd_tpu.utils.cache import enable_compilation_cache\n"
            "enable_compilation_cache()\n"
            "import importlib.util, jax\n"
            "spec = importlib.util.spec_from_file_location('pctd_serve',\n"
            f"    os.path.join({REPO!r}, 'scripts', 'serve.py'))\n"
            "sm = importlib.util.module_from_spec(spec)\n"
            "spec.loader.exec_module(sm)\n"
            "from pctd_tpu.config import ModelConfig\n"
            "from pctd_tpu.models.disentangle_vae import DisentangleVAE\n"
            "from pctd_tpu.models.sampler import Sampler\n"
            "cfg = ModelConfig()\n"
            "model = DisentangleVAE.init_model(jax.random.PRNGKey(0), cfg)\n"
            "t0 = time.perf_counter()\n"
            "s = Sampler(model.params, cfg, frame_decoder='pallas',\n"
            f"            fixed_batch={fixed_batch}, aot_dir={AOT_DIR!r})\n"
            "preload_s = time.perf_counter() - t0\n"
            "srv = sm.Server(s, cfg.pianotree, max_windows=8, cfg=cfg)\n"
            f"req = dict(op='variation', input={mid_a!r}, scale=0.5,\n"
            f"           seed=3, out=os.path.join({tmp!r}, 'v.mid'))\n"
            "t0 = time.perf_counter()\n"
            "resp = srv.handle(req)\n"
            "print('FRESH', json.dumps({\n"
            "    'process_to_first_response_s':\n"
            "        round(time.perf_counter() - t_proc, 2),\n"
            "    'preload_s': round(preload_s, 2),\n"
            "    'first_request_s': round(time.perf_counter() - t0, 2),\n"
            "    'loaded': len(s.aot_report['loaded']),\n"
            "    'ok': bool(resp.get('ok', True))}))\n")
        budget = max(60, min(420, int(_remaining() - 30)))
        proc = subprocess.run([sys.executable, "-u", "-c", code],
                              capture_output=True, text=True,
                              timeout=budget, cwd=REPO)
    for ln in proc.stdout.strip().splitlines():
        if ln.startswith("FRESH "):
            return json.loads(ln[6:])
    return {"error": f"rc={proc.returncode}: {proc.stderr[-300:]}"}


def _run_kernel_gate():
    """Preflight for the decode matrix (VERDICT r2 item 2, r3 item 1c):
    AOT-compile the DRIVER-PATH kernels — the two serving backends at the
    decode-matrix batches plus the fused train-frame kernel at the headline
    batch (a cache hit when the headline section already ran). A lowering
    regression surfaces as a labeled gate failure and the affected decode
    rows are skipped instead of crashing mid-bench. Runs AFTER the headline
    sections: round 3 ran the full 8-entry matrix first and its 1,574 s of
    cold compiles starved the driver's wall clock.

    A combo whose committed AOT bundle is valid for this runtime is marked
    ok WITHOUT compiling: the bundle IS that compiled program (built from
    these exact sources on this device kind), and the decode/train sections
    execute it — a lowering regression cannot hide behind it because a
    source change invalidates the bundle's fingerprint and the combo
    compiles here again."""
    from pctd_tpu.ops.pallas import smoke

    results = {}
    need = []
    for label, bundle in _GATE_BUNDLES.items():
        if bundle in _AOT_VALID:
            results[label] = {"ok": True, "seconds": 0.0,
                              "aot_bundle": bundle}
        else:
            need.append(label)
    if "train_b2048_frame_kernel" in _AOT_COVERED:
        results["train_frame_b2048"] = {"ok": True, "seconds": 0.0,
                                        "aot_bundle": "train_grad (b2048)"}
        train_batches = ()
    else:
        train_batches = (2048,)
    if need or train_batches:
        compiled, _ = smoke.run_gate(
            serve_batches=(128, 512), train_batches=train_batches,
            which=need + [f"train_frame_b{b}" for b in train_batches]
            or None)
        results.update(compiled)
    ok = all(r.get("ok") for r in results.values())
    return {"ok": ok, "results": results}


def _gate_allows(gate, label: str) -> bool:
    """True unless the preflight gate explicitly recorded this combo as a
    compile failure (gate crash/absence never blocks a measurement)."""
    if not gate or "results" not in gate:
        return True
    r = gate["results"].get(label)
    return r is None or bool(r.get("ok"))


def _bench_multichip_cpu_mesh():
    """CPU-mesh scaling smoke (VERDICT r2 item 8): subprocess on 8 virtual
    CPU devices — same tiny global batch on a 1-device vs 8-device data mesh,
    assert loss equality, record wall-clock. Labeled CPU-mesh-only: this
    exercises the sharded path's overheads continuously, it is NOT a TPU
    scaling claim."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags +
                        " --xla_force_host_platform_device_count=8").strip()
    timeout = max(60, min(1800, int(_remaining())))
    proc = subprocess.run([sys.executable, "scripts/bench_multichip.py"],
                          env=env, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"bench_multichip rc={proc.returncode}: "
                           f"{proc.stderr[-500:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main():
    global _baseline_g, _warm_at_start
    bpath = os.path.join(REPO, "BASELINE_MEASURED.json")
    if os.path.exists(bpath):
        with open(bpath) as f:
            _baseline_g = json.load(f)

    _warm.update(_load_warm_marker())
    _warm_at_start = bool(_warm)
    if _warm:
        print(f"[bench] warm marker matches source fingerprint "
              f"({len(_warm)} tuned sections)", file=sys.stderr, flush=True)

    _start_watchdog()
    device_ok = _probe_device_alive(
        float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "240")))

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if device_ok:
        try:
            _compute_aot_coverage()
            print(f"[bench] AOT bundles: {len(_AOT_VALID)} valid, covering "
                  f"{len(_AOT_COVERED)} sections: {sorted(_AOT_COVERED)}",
                  file=sys.stderr, flush=True)
        except Exception:  # noqa: BLE001 — coverage is an optimization only
            traceback.print_exc(file=sys.stderr)
        # Absorb the per-process first-sync tax BEFORE any timed section:
        # the first host-synced fetch of this process pays the remote
        # client/tunnel handshake — measured 43-270 s depending on tunnel
        # state while every later fetch is milliseconds (round 5; the r4
        # driver's 1,184 s "headline compile" was largely this plus real
        # cold compiles). A trivial op pays it here so per-section
        # compile_seconds reflect the sections, not the client.
        def _client_warmup():
            import jax.numpy as jnp
            return float(jnp.ones((128, 128)).sum())

        _guard("client_warmup", _client_warmup)

    if hasattr(signal, "SIGALRM"):
        def _alarm(_sig, _frm):
            raise _BenchTimeout()
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(int(BUDGET_S + 60))

    # results land here as sections complete; the final print reads ONLY
    # this shared dict, so an aborted measurement phase (or the watchdog)
    # still reports everything measured so far.
    R = _R

    if not device_ok:
        # the device is wedged/unreachable: running any TPU section would
        # hang forever. Record the outage, still run the CPU-mesh smoke
        # (own subprocess device pool), and print a parseable artifact.
        _failures.append({"section": "device_probe",
                          "error": "TPU unreachable at bench start — all "
                          "device sections skipped; see device_probe"})
        R["multichip"] = _section("multichip_cpu_mesh",
                                  _bench_multichip_cpu_mesh)
        _print_artifact()
        return

    # n_steps=24 at B=128 (round 5): a 12-step chain is ~0.45 s, small
    # enough that tunnel dispatch jitter alone produced 20-30% spreads
    # that tripped the contention sentinel (same fix as tensorize).
    def train_sec(label, required=False, n_steps=24, with_cost=False):
        return _section(label, _bench_train_step, required=required,
                        n_steps=n_steps, with_cost=with_cost,
                        compile_label=label, **_TRAIN_SECTION_KW[label])

    def measure():
        # 1) the headline: bf16 B=2048, fused train-frame Pallas kernel with
        # hand-written VJP + in-kernel reconstruction CE — always attempted.
        R["big"] = train_sec("train_b2048_frame_kernel", required=True,
                             n_steps=8, with_cost=True)
        # 2) tensorization throughput (the 50k/s north star)
        R["tens"] = _section("tensorize", _bench_tensorize)
        # 3) canonical-parity B=128 bf16 (the reference's batch size)
        R["b128_bf16"] = train_sec("train_b128_bf16")
        # 4) driver-path kernel gate (serving backends; combos whose
        # committed AOT bundle is valid are marked ok without compiling);
        # failures mark decode rows to skip
        R["gate"] = _section("kernel_gate", _run_kernel_gate)
        # 5) serving decode matrix
        for backend, bs in (("pallas", 128), ("pallas_full", 128),
                            ("xla", 128), ("pallas", 512),
                            ("pallas_full", 512), ("xla", 512)):
            label = f"decode_{backend}_b{bs}"
            if backend != "xla" and not _gate_allows(
                    R["gate"], f"serve_{backend}_b{bs}"):
                _emit_progress(label, {"ok": False, "seconds": 0.0,
                                       "error": "skipped: preflight gate "
                                       "recorded a compile failure"})
                continue
            d = _section(label, _bench_sampler, backend, batch_size=bs)
            if d:
                R["decodes"].append(d)
        # 6) serving-workflow end-to-end latency
        R["serve"] = _section("serve_workflows", _bench_serve_workflows)
        # 7) remaining canonical/capability rows
        R["b128_kernel"] = train_sec("train_b128_frame_kernel")
        R["b128_f32"] = train_sec("train_b128_f32")
        R["b4096"] = train_sec("train_b4096_auto_accum", n_steps=4)
        # 8) comparison rows: XLA scan path + logits-out kernel fallback
        R["big_xla"] = train_sec("train_b2048_xla", n_steps=8)
        R["big_nofuse"] = train_sec("train_b2048_frame_kernel_nofuse",
                                    n_steps=8)
        # 9) CPU-mesh scaling smoke (subprocess, own device pool)
        R["multichip"] = _section("multichip_cpu_mesh",
                                  _bench_multichip_cpu_mesh)

    try:
        measure()
    except _BenchTimeout:
        print(f"[bench] BUDGET deadline ({BUDGET_S:.0f}s) hit — printing "
              "best-known results", file=sys.stderr, flush=True)
    finally:
        if hasattr(signal, "SIGALRM"):
            signal.alarm(0)

    _print_artifact()


def _print_artifact(lock_timeout: float | None = None):
    """Print the ONE JSON artifact line from whatever state the shared
    section dict holds. Idempotent (thread-safe single shot): called by the
    normal main() tail, by the watchdog thread when the main thread is
    wedged inside an uninterruptible device wait, and by the top-level
    fallback — whichever fires first wins.

    The printed flag is set only AFTER a successful print, under a lock
    (ADVICE r4: setting it at entry meant a json.dumps failure exited 0
    with NO artifact, and the watchdog + a SIGALRM-recovering main thread
    could interleave two JSON lines).

    ``lock_timeout`` (watchdog path): if the lock cannot be acquired —
    the main thread is wedged INSIDE its own print (e.g. a full stdout
    pipe) — emit the minimal artifact lock-free instead of blocking
    forever in the very thread whose job is to guarantee an exit."""
    got = (_PRINT_LOCK.acquire(timeout=lock_timeout)
           if lock_timeout is not None else _PRINT_LOCK.acquire())
    if not got:
        print(json.dumps({
            "metric": "train_segments_per_sec_per_chip", "value": None,
            "unit": "2-bar segments/sec/chip", "vs_baseline": None,
            "extra": {"fatal": "watchdog: print lock held by a wedged "
                      "main thread"}}), flush=True)
        return
    try:
        if _PRINTED[0]:
            return
        try:
            line = _artifact_json()
        except Exception as e:  # noqa: BLE001 — must still emit SOMETHING
            traceback.print_exc(file=sys.stderr)
            line = json.dumps({
                "metric": "train_segments_per_sec_per_chip", "value": None,
                "unit": "2-bar segments/sec/chip", "vs_baseline": None,
                "extra": {"fatal": "artifact serialization failed: "
                          f"{type(e).__name__}: {str(e)[:300]}",
                          "failures": len(_failures)}})
        print(line)
        _PRINTED[0] = True
    finally:
        _PRINT_LOCK.release()


def _artifact_json() -> str:
    """Serialize the artifact from whatever the shared section dict holds."""
    R = _R
    baseline = _baseline_g
    warm_at_start = _warm_at_start

    big, big_xla, big_nofuse = (R.get("big"), R.get("big_xla"),
                                R.get("big_nofuse"))
    b128_bf16 = R.get("b128_bf16")
    decodes = R.get("decodes") or []

    # headline selection with fallbacks: best verified kernel config, else
    # XLA path, else the canonical B=128 config — the artifact degrades, it
    # never nulls.
    candidates = [
        (big, "fused train-frame Pallas kernel (hand-written VJP, "
              "in-kernel reconstruction CE)"),
        (big_nofuse, "train-frame Pallas kernel (hand-written VJP, "
                     "logits-out CE)"),
    ]
    live = [(r, n) for r, n in candidates if r]
    if live:
        big_best, note = max(live, key=lambda t: t[0]["segments_per_sec"])
    elif big_xla:
        big_best, note = big_xla, "XLA nested-scan path (kernel benches " \
                                  "failed — see failures)"
    elif b128_bf16:
        big_best, note = b128_bf16, "canonical B=128 config (all B=2048 " \
                                    "benches failed — see failures)"
    else:
        big_best, note = None, "ALL train benches failed — see failures"

    alts = [
        {"which": n,
         "segments_per_sec": round(r["segments_per_sec"], 2),
         "step_seconds": round(r["step_seconds"], 5)}
        for r, n in live if r is not big_best] or None

    mfu = None
    if big_best and big_best.get("flops_per_step"):
        mfu = (big_best["flops_per_step"] / big_best["step_seconds"]
               / PEAK_FLOPS["bfloat16"])

    ref_rate = (baseline or {}).get("train_step", {}).get(
        "segments_per_sec", None)
    vs = (big_best["segments_per_sec"] / ref_rate
          if big_best and ref_rate else None)

    def _row(r, *keys):
        if not r:
            return None
        out = {}
        for k in keys:
            v = r.get(k)
            out[k] = round(v, 5) if isinstance(v, float) else v
        return out

    return json.dumps({
        "metric": "train_segments_per_sec_per_chip",
        "value": round(big_best["segments_per_sec"], 2) if big_best else None,
        "unit": "2-bar segments/sec/chip (canonical VAE train step, bs="
                f"{big_best['batch_size'] if big_best else '?'}, bf16 "
                "compute / f32 losses)",
        "vs_baseline": round(vs, 2) if vs else None,
        "extra": {
            "throughput_config": {k: (round(v, 5) if isinstance(v, float)
                                      else v)
                                  for k, v in big_best.items()}
            if big_best else None,
            "throughput_config_note": note,
            "train_b2048_bf16_alt_kernels": alts,
            "train_b2048_bf16_xla_scans": _row(
                big_xla, "segments_per_sec", "step_seconds"),
            "mfu_bf16_analytic_matmul": round(mfu, 4) if mfu else None,
            "train_b128_bf16": _row(b128_bf16, "segments_per_sec",
                                    "step_seconds", "step_seconds_hostsync",
                                    "final_loss"),
            "train_b128_bf16_frame_kernel": _row(
                R.get("b128_kernel"), "segments_per_sec", "step_seconds"),
            "train_b128_f32": _row(R.get("b128_f32"), "segments_per_sec",
                                   "step_seconds"),
            "train_b4096_bf16_kernel_auto_accum": _row(
                R.get("b4096"), "segments_per_sec", "step_seconds",
                "accum_steps"),
            "tensorize_segments_per_sec": round(R["tens"], 1)
            if R.get("tens") else None,
            "sample_decode": [
                {"backend": d["backend"], "batch_size": d["batch_size"],
                 "segments_per_sec": round(d["segments_per_sec"], 2),
                 "ms_per_batch": round(d["ms_per_batch"], 1),
                 "rel_spread": d["rel_spread"]}
                for d in decodes],
            "serve_workflows": R.get("serve"),
            "compile_seconds": _compile_s or None,
            "kernel_gate": R.get("gate"),
            "multichip_cpu_mesh": R.get("multichip"),
            "budget": {"budget_s": BUDGET_S,
                       "elapsed_s": round(time.monotonic() - _T0, 1),
                       "skipped_for_budget": _skipped or None,
                       "warm_marker_matched": warm_at_start,
                       "warm_marker_invalid_reason": _warm_invalid_reason,
                       "aot_covered_sections": sorted(_AOT_COVERED) or None},
            "failures": _failures,
            # never call into jax here: when the watchdog prints this from
            # its own thread the device runtime may be the very thing that
            # is wedged — use the preflight probe's recorded answer.
            "device": _device_info,
            "baseline_source": "BASELINE_MEASURED.json (torch reference on "
                               "this host CPU)",
            "timing": {
                "method": f"median of {REPEATS} synced chains after warmup "
                          "(decode rows: 7 chains, re-measured once if "
                          "spread > 10%)",
                "max_rel_spread": round(max(s for _, s in _spreads), 4)
                if _spreads else None,
                "worst_section": max(_spreads, key=lambda t: t[1])[0]
                if _spreads else None,
                "contended": bool(max(s for _, s in _spreads) > SPREAD_WARN)
                if _spreads else None,
            },
        },
    }, default=str)


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the artifact must never null
        traceback.print_exc(file=sys.stderr)
        with _PRINT_LOCK:
            if not _PRINTED[0]:
                print(json.dumps({
                    "metric": "train_segments_per_sec_per_chip",
                    "value": None,
                    "unit": "2-bar segments/sec/chip",
                    "vs_baseline": None,
                    "extra": {"fatal": f"{type(e).__name__}: {str(e)[:300]}",
                              "failures": _failures,
                              "progress": _progress},
                }, default=str))
                _PRINTED[0] = True
        raise SystemExit(0)
