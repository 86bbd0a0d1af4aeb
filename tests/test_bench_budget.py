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
