"""bench.py wall-clock budget machinery (VERDICT r3 item 1): section
scheduling against the remaining budget, the self-tuning warm marker keyed to
a package-source fingerprint, and the guard's failure/timeout semantics.

These test the scheduler in isolation (no jax, no device): rounds 2 and 3
both produced a null driver artifact — r2 to a crash, r3 to a wall-clock
timeout — so the budget logic itself is now test surface.
"""
import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path):
    """A fresh bench module instance with its artifact paths redirected to
    tmp (module state is per-test; bench.py's top level is stdlib-only)."""
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.PROGRESS_PATH = str(tmp_path / "bench_progress.json")
    mod.WARM_MARKER = str(tmp_path / "bench_warm.json")
    return mod


def test_section_skips_when_budget_exhausted(bench):
    bench.BUDGET_S = 10.0  # _T0 was set at import; ~10s remain
    calls = []
    out = bench._section("decode_pallas_b128", lambda: calls.append(1) or 42,
                         est=500.0)
    assert out is None and not calls
    assert "decode_pallas_b128" in bench._skipped
    rec = bench._progress["decode_pallas_b128"]
    assert not rec["ok"] and "budget" in rec["skipped"]
    # the skip is in the progress artifact on disk, never silent
    with open(bench.PROGRESS_PATH) as f:
        assert "decode_pallas_b128" in json.load(f)


def test_required_section_always_runs(bench):
    bench.BUDGET_S = 0.0  # budget already blown
    out = bench._section("train_b2048_frame_kernel", lambda: 7,
                         required=True, est=1e9)
    assert out == 7
    assert bench._progress["train_b2048_frame_kernel"]["ok"]


def test_section_runs_and_self_tunes_when_it_fits(bench):
    bench.BUDGET_S = 1e6
    out = bench._section("tensorize", lambda: 3.14, est=1.0)
    assert out == 3.14
    # success wrote the warm marker with the current fingerprint
    with open(bench.WARM_MARKER) as f:
        m = json.load(f)
    assert m["fingerprint"] == bench._FINGERPRINT
    assert "tensorize" in m["sections"]


def test_warm_marker_roundtrip_and_fingerprint_gate(bench, tmp_path):
    bench._warm_record("kernel_gate", 12.0)
    assert bench._load_warm_marker() == {"kernel_gate": 12.0}
    # a source change (different fingerprint) invalidates the marker —
    # exactly when the persistent compile cache is invalid too
    with open(bench.WARM_MARKER) as f:
        m = json.load(f)
    m["fingerprint"] = "0" * 16
    with open(bench.WARM_MARKER, "w") as f:
        json.dump(m, f)
    assert bench._load_warm_marker() == {}
    # corrupt file degrades to cold estimates, never raises
    with open(bench.WARM_MARKER, "w") as f:
        f.write("{not json")
    assert bench._load_warm_marker() == {}


def test_estimate_prefers_warm_then_cold_table(bench):
    assert bench._estimate("kernel_gate") == bench._COLD_EST["kernel_gate"]
    assert bench._estimate("never_seen_label") == 120.0
    bench._warm["kernel_gate"] = 10.0
    assert bench._estimate("kernel_gate") == pytest.approx(10.0 * 1.5 + 15.0)


def test_guard_swallows_exceptions_records_failure(bench):
    def boom():
        raise ValueError("kaboom")

    assert bench._guard("decode_xla_b128", boom) is None
    assert bench._failures and "kaboom" in bench._failures[0]["error"]
    assert bench._progress["decode_xla_b128"]["ok"] is False


def test_guard_propagates_budget_timeout(bench):
    """_BenchTimeout is a BaseException: the alarm must abort the whole
    measurement phase, not be swallowed like a section failure."""
    def hit_deadline():
        raise bench._BenchTimeout()

    with pytest.raises(bench._BenchTimeout):
        bench._guard("serve_workflows", hit_deadline)
    assert any(f["section"] == "serve_workflows" for f in bench._failures)


def test_fingerprint_tracks_package_sources(bench, tmp_path, monkeypatch):
    """The fingerprint must change when any pctd_tpu/*.py changes — it
    proxies for persistent-compile-cache validity."""
    pkg = tmp_path / "pctd_tpu"
    pkg.mkdir()
    (pkg / "a.py").write_text("x = 1\n")
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    fp1 = bench._tree_fingerprint()
    (pkg / "a.py").write_text("x = 2\n")
    assert bench._tree_fingerprint() != fp1
    # non-.py files do not participate
    (pkg / "notes.txt").write_text("irrelevant")
    fp2 = bench._tree_fingerprint()
    (pkg / "notes.txt").write_text("changed")
    assert bench._tree_fingerprint() == fp2


def test_warm_marker_invalidated_by_cache_wipe(bench, tmp_path):
    """VERDICT r4 item 2: round 4's driver artifact reported
    warm_marker_matched=true while every compile was stone cold, because the
    marker json survived the wipe that deleted the compiled programs. The
    marker must validate against the cache's actual contents."""
    cache = tmp_path / "cache"
    cache.mkdir()
    bench.WARM_MARKER = str(cache / "bench_warm.json")
    (cache / "prog_a.bin").write_bytes(b"x")
    (cache / "prog_b.bin").write_bytes(b"y")
    bench._warm_record("tensorize", 30.0)
    assert bench._load_warm_marker() == {"tensorize": 30.0}

    # wipe one compiled program (partial wipe): marker rejected, reason set
    (cache / "prog_a.bin").unlink()
    assert bench._load_warm_marker() == {}
    assert "gone from the cache" in bench._warm_invalid_reason

    # markers predating the cache_files field (no key) still load
    with open(bench.WARM_MARKER) as f:
        m = json.load(f)
    del m["cache_files"]
    with open(bench.WARM_MARKER, "w") as f:
        json.dump(m, f)
    assert bench._load_warm_marker() == {"tensorize": 30.0}


def test_estimate_uses_aot_covered_between_warm_and_cold(bench):
    lbl = "decode_pallas_b512"
    assert bench._estimate(lbl) == bench._COLD_EST[lbl]      # cold
    bench._AOT_COVERED.add(lbl)
    assert bench._estimate(lbl) == bench._AOT_EST[lbl]       # AOT-covered
    bench._warm[lbl] = 20.0                                  # warm wins
    assert bench._estimate(lbl) == pytest.approx(20.0 * 1.5 + 15.0)


def test_cold_estimates_reflect_observed_worst_cases(bench):
    """The estimates must stay >= the worst HEALTHY-STACK observations on
    record (VERDICT r4 item 2: best-case estimates over-schedule cold
    runs). The r04 2,123 s serve_pallas_b512 reading was reproduced fresh
    in round 5 at 109.9 s — tunnel variance during the pre-outage
    degradation, excluded from the healthy-stack table but documented in
    the kernel_gate comment and ARCHITECTURE.md."""
    assert bench._COLD_EST["train_b2048_frame_kernel"] >= 1265  # r04 driver
    assert bench._COLD_EST["kernel_gate"] >= 700    # healthy-worst sum
    assert bench._COLD_EST["decode_pallas_b512"] >= 160


def test_aot_coverage_from_manifest(bench, tmp_path, monkeypatch):
    """Coverage is decided from manifest meta alone (no multi-MB reads):
    runtime + source_fp must match, files must exist, and a section is
    covered only when EVERY program it compiles has a bundle."""
    from pctd_tpu.train import aot_steps
    from pctd_tpu.utils import aot as aot_mod

    here = {"jax_version": "j", "platform": "tpu", "device_kind": "k",
            "num_devices": 1}
    monkeypatch.setattr(aot_mod, "runtime_meta",
                        lambda: dict(here, schema=aot_mod.SCHEMA))
    monkeypatch.setattr(aot_mod, "source_fingerprint", lambda: "f" * 16)
    bench.AOT_DIR = str(tmp_path)

    mcfg, tcfg = bench._train_cfgs(
        **bench._TRAIN_SECTION_KW["train_b2048_frame_kernel"])
    keys = aot_steps.program_keys(mcfg, tcfg)
    names = [f"train_{k}_{v}.jaxexe" for k, v in keys.items()]
    names += ["decode_pallas_b128.jaxexe", "encode_b128.jaxexe"]
    manifest = {}
    for n in names:
        (tmp_path / n).write_bytes(b"stub")
        manifest[n] = dict(here, source_fp="f" * 16)
    # one stale bundle: wrong source fingerprint
    (tmp_path / "decode_pallas_b512.jaxexe").write_bytes(b"stub")
    manifest["decode_pallas_b512.jaxexe"] = dict(here, source_fp="0" * 16)
    # one manifest entry whose file is missing
    manifest["decode_xla_b128.jaxexe"] = dict(here, source_fp="f" * 16)
    with open(tmp_path / "manifest.json", "w") as f:
        json.dump(manifest, f)

    bench._compute_aot_coverage()
    assert "train_b2048_frame_kernel" in bench._AOT_COVERED
    assert "decode_pallas_b128" in bench._AOT_COVERED
    assert "serve_workflows" in bench._AOT_COVERED
    assert "decode_pallas_b512" not in bench._AOT_COVERED   # stale fp
    assert "decode_xla_b128" not in bench._AOT_COVERED      # file missing
    assert "train_b128_bf16" not in bench._AOT_COVERED      # no bundles
    # gate needs all four serve bundles: not covered here
    assert "kernel_gate" not in bench._AOT_COVERED


def test_kernel_gate_uses_bundles_without_compiling(bench, monkeypatch):
    """Gate combos whose bundle is valid are marked ok with seconds=0 and
    no compile; uncovered combos are delegated to smoke.run_gate."""
    bench._AOT_VALID.update(v for k, v in bench._GATE_BUNDLES.items()
                            if "b128" in k)
    bench._AOT_COVERED.add("train_b2048_frame_kernel")
    called = {}

    import pctd_tpu.ops.pallas.smoke as smoke

    def fake_run_gate(serve_batches, train_batches, which=None):
        called["which"] = which
        called["train_batches"] = train_batches
        return ({lbl: {"ok": True, "seconds": 9.9} for lbl in which}, True)

    monkeypatch.setattr(smoke, "run_gate", fake_run_gate)
    out = bench._run_kernel_gate()
    assert out["ok"]
    assert sorted(called["which"]) == ["serve_pallas_b512",
                                      "serve_pallas_full_b512"]
    assert called["train_batches"] == ()
    assert out["results"]["serve_pallas_b128"]["aot_bundle"]
    assert out["results"]["serve_pallas_b512"]["seconds"] == 9.9
    assert out["results"]["train_frame_b2048"]["seconds"] == 0.0


def _capture_artifact(bench, capsys):
    bench._print_artifact()
    out = capsys.readouterr().out.strip()
    assert out.count("\n") == 0          # exactly ONE line
    return json.loads(out)


def test_print_artifact_single_shot_and_parseable(bench, capsys):
    bench._R["big"] = {"segments_per_sec": 5000.0, "step_seconds": 0.4096,
                       "batch_size": 2048, "flops_per_step": 2.5e13}
    art = _capture_artifact(bench, capsys)
    assert art["metric"] == "train_segments_per_sec_per_chip"
    assert art["value"] == 5000.0
    assert art["extra"]["mfu_bf16_analytic_matmul"] is not None
    # second call is a no-op (single shot)
    bench._print_artifact()
    assert capsys.readouterr().out == ""


def test_print_artifact_survives_serialization_failure(bench, capsys):
    """ADVICE r4: a json.dumps failure must still print SOMETHING and only
    then latch the printed flag — never exit silently with rc=0."""
    bench._R["big"] = {"segments_per_sec": 1.0, "step_seconds": 1.0,
                       "batch_size": 1, "flops_per_step": None}
    bench._failures.append({"section": "x", "error": object()})  # unserializable...
    art = _capture_artifact(bench, capsys)     # default=str handles it
    assert art["value"] == 1.0

    # force a genuine serialization explosion: _artifact_json raises
    bench2 = bench
    bench2._PRINTED[0] = False
    orig = bench2._artifact_json
    bench2._artifact_json = lambda: (_ for _ in ()).throw(TypeError("boom"))
    try:
        bench2._print_artifact()
        out = capsys.readouterr().out.strip()
        art = json.loads(out)
        assert art["value"] is None
        assert "artifact serialization failed" in art["extra"]["fatal"]
        assert bench2._PRINTED[0]
    finally:
        bench2._artifact_json = orig


def test_print_artifact_degrades_headline(bench, capsys):
    """No kernel result -> xla row becomes the headline; none at all ->
    value null with the failure note."""
    bench._R["big_xla"] = {"segments_per_sec": 3000.0, "step_seconds": 0.68,
                           "batch_size": 2048}
    art = _capture_artifact(bench, capsys)
    assert art["value"] == 3000.0
    assert "XLA" in art["extra"]["throughput_config_note"]


def test_warm_marker_invalidated_by_runtime_change(bench, tmp_path,
                                                   monkeypatch):
    """A jax upgrade / device change invalidates the persistent cache and
    the bundles but leaves the cache FILES on disk — the marker must not
    survive it either (round-5 review finding)."""
    cache = tmp_path / "cache"
    cache.mkdir()
    bench.WARM_MARKER = str(cache / "bench_warm.json")
    monkeypatch.setattr(bench, "_runtime_marker",
                        lambda: {"jax_version": "1", "device_kind": "k"})
    bench._warm_record("tensorize", 30.0)
    assert bench._load_warm_marker() == {"tensorize": 30.0}
    monkeypatch.setattr(bench, "_runtime_marker",
                        lambda: {"jax_version": "2", "device_kind": "k"})
    assert bench._load_warm_marker() == {}
    assert "runtime/device changed" in bench._warm_invalid_reason


def test_watchdog_print_does_not_block_on_held_lock(bench, capsys):
    """If the main thread wedges INSIDE print while holding the print
    lock, the watchdog path must emit an emergency artifact instead of
    blocking forever (round-5 review finding)."""
    bench._PRINT_LOCK.acquire()     # simulate wedged main thread
    try:
        bench._print_artifact(lock_timeout=0.1)
        out = capsys.readouterr().out.strip()
        art = json.loads(out)
        assert art["value"] is None
        assert "wedged" in art["extra"]["fatal"]
        assert not bench._PRINTED[0]   # real artifact may still print later
    finally:
        bench._PRINT_LOCK.release()


def test_cpu_fallback_guard_requires_explicit_first_choice(bench,
                                                           monkeypatch):
    """JAX_PLATFORMS='tpu,cpu' is allow-fallback, not a request to publish
    CPU numbers — only an explicit first-choice 'cpu' passes the guard."""
    import subprocess

    def fake_run(cmd, **kw):
        class R:
            returncode = 0
            stdout = "DEVICE_OK cpu | CpuDevice(id=0)\n"
            stderr = ""
        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setenv("JAX_PLATFORMS", "tpu,cpu")
    assert bench._probe_device_alive(1.0) is False
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench._probe_device_alive(1.0) is True
