"""End-to-end smoke of the demo-workflow script (tiny dims, untrained) and
structural parity of generated demo trees with the reference's demo layout
(reference demo/readme.txt:5-33)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def assert_demo_tree_structure(out: str, k: int, expect_melody: bool = True):
    """The four workflow trees the reference demo/ documents, with the track
    semantics of each file (readme.txt: 16-bar all.mid carries all four
    scores; swap_x_y is the k x k recombination grid; posterior sampling has
    an original + >=3 samples; arrangement pairs melody with arranged
    accompaniment)."""
    from pctd_tpu.data.midi_io import MidiFile

    def read(rel):
        fn = os.path.join(out, rel)
        assert os.path.exists(fn), f"missing {rel}"
        return MidiFile.read(fn)

    # 1: k^2 swap grid, one track each, named chd{i}_txt{j}; swap_all = k^2 tracks
    d1 = "1_compositional_style_transfer"
    for i in range(k):
        for j in range(k):
            mf = read(f"{d1}/swap_{i}_{j}.mid")
            assert len(mf.tracks) == 1
            assert mf.tracks[0].name == f"chd{i}_txt{j}"
    assert len(read(f"{d1}/swap_all.mid").tracks) == k * k
    # 1b: 16-bar all.mid holds exactly the four scores of readme.txt:10-13
    mf = read(f"{d1}/16bar_style_transfer/all.mid")
    assert [t.name for t in mf.tracks] == [
        "A_original", "B_original", "Achd_Btxt", "Bchd_Atxt"]
    assert all(len(t.notes) > 0 for t in mf.tracks)

    # 1b continued: the four individual per-score files next to all.mid
    for name in ("A_original", "B_original", "Achd_Btxt", "Bchd_Atxt"):
        assert len(read(f"{d1}/16bar_style_transfer/{name}.mid").tracks) == 1
    # a larger more_examples grid in one file (reference swap_31by31.mid)
    d1m = os.path.join(out, d1, "more_examples")
    assert any(f.startswith("swap_") for f in os.listdir(d1m))

    # 2: posterior original + 3 samples (+ more_examples sets); prior has the
    # reference's 4 NAMED progressions (C-Am-F-G on top, 3 in more_examples)
    d2p = "2_texture_variation/posterior_sampling"
    read(f"{d2p}/original.mid")
    for s in range(3):
        read(f"{d2p}/post_sample_{s}.mid")
    more = os.path.join(out, d2p, "more_examples")
    assert os.path.isdir(more) and len(os.listdir(more)) >= 1
    for sample in os.listdir(more):
        read(f"{d2p}/more_examples/{sample}/original.mid")
        read(f"{d2p}/more_examples/{sample}/post_sample_0.mid")
    d2q = "2_texture_variation/prior_sampling"
    read(f"{d2q}/C-Am-F-G.mid")
    for prog in ("Am-D7-G", "G-F-Eb", "F-Bb-F"):
        read(f"{d2q}/more_examples/{prog}.mid")
    for s in range(2):
        read(f"{d2q}/prior_sample_{s}.mid")

    # 3: melody + arranged accompaniment tracks (corpora ingested from
    # accompaniment-only MIDIs have no melody track to lay down);
    # given2bar/given4bar examples + iterative long generation
    mf = read("3_acc_arrangement/arrangement_given_texture.mid")
    want = (["melody", "arranged_acc"] if expect_melody
            else ["arranged_acc"])
    assert [t.name for t in mf.tracks] == want
    read("3_acc_arrangement/fig_generation_given2bar.mid")
    read("3_acc_arrangement/more_examples/sample1_given2bar.mid")
    read("3_acc_arrangement/more_examples/sample1_given4bar.mid")
    read("3_acc_arrangement/more_examples/long_generation/"
         "sample1_given4bar.mid")

    # 4: chord interpolation: corpus pair + named progression pairs in BOTH
    # directions (reference ships 4 named one-direction files)
    assert len(read("chord_prog_interpolation/interp_chd.mid").tracks) == 1
    for pa, pb in (("C-Am-F-G", "Eb-Cm-Ab-Bb"), ("Am-Dm-G-C", "C-F-G-C"),
                   ("Db-G-Cm", "C-D-G")):
        read(f"chord_prog_interpolation/{pa}_to_{pb}.mid")
        read(f"chord_prog_interpolation/{pb}_to_{pa}.mid")


@pytest.mark.slow
def test_make_demos_tiny(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PCTD_JAX_CACHE=str(tmp_path / "cache"))
    out = str(tmp_path / "demo_out")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_demos.py"),
         "--tiny", "--k", "2", "--out", out],
        env=env, capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    mids = [os.path.join(dp, f) for dp, _, fs in os.walk(out)
            for f in fs if f.endswith(".mid")]
    assert len(mids) >= 10
    # every produced file parses with our reader
    from pctd_tpu.data.midi_io import MidiFile
    for fn in mids:
        MidiFile.read(fn)
    # full structural parity with the reference demo layout
    assert_demo_tree_structure(out, k=2)


@pytest.mark.slow
def test_generate_cli_smoke(tmp_path):
    """Chord-conditioned generation CLI produces a parseable MIDI with the
    requested track count (untrained model: structure only; chord-following
    is validated against the chord estimator in round-trip tests and with
    trained checkpoints)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PCTD_JAX_CACHE=str(tmp_path / "cache"))
    out = str(tmp_path / "gen.mid")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "generate.py"),
         "--chords", "C-Am-F-G", "--bars", "2", "--samples", "2",
         "--out", out],
        env=env, capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    from pctd_tpu.data.midi_io import MidiFile
    mf = MidiFile.read(out)
    assert len(mf.tracks) == 2
    assert all(t.name.startswith("sample_") for t in mf.tracks)


def test_committed_realmidi_demo_tree_structure():
    """The demo tree regenerated from the real-music checkpoint (committed
    under runs/) must keep the reference's structure."""
    out = os.path.join(REPO, "runs", "demo_realmidi")
    if not os.path.isdir(out):
        pytest.skip("no committed real-midi demo tree")
    assert_demo_tree_structure(out, k=4, expect_melody=False)


def _tiny_checkpoint(path: str, seed: int = 7) -> None:
    """Write a TrainState checkpoint with tiny dims (the daemon's --tiny
    config) for hot-reload testing."""
    import jax

    from pctd_tpu.config import TrainConfig, tiny_model_config
    from pctd_tpu.train.checkpoint import save_state
    from pctd_tpu.train.trainer import init_state

    state, _ = init_state(jax.random.PRNGKey(seed), tiny_model_config(),
                          TrainConfig())
    save_state(path, state)


@pytest.mark.slow
def test_serve_daemon_end_to_end(tmp_path):
    """scripts/serve.py: long-running JSON-lines service — ping, two
    workflow requests against real demo MIDIs, malformed-input survival,
    checkpoint hot-reload, latency stats, quit."""
    import json

    a = ("/root/reference/demo/2_texture_variation/prior_sampling/"
         "more_examples/Am-D7-G.mid")
    b = ("/root/reference/demo/2_texture_variation/prior_sampling/"
         "more_examples/G-F-Eb.mid")
    if not (os.path.exists(a) and os.path.exists(b)):
        pytest.skip("reference demo MIDIs not available")
    out1 = str(tmp_path / "st.mid")
    out2 = str(tmp_path / "var.mid")
    ck = str(tmp_path / "reload_ck")
    _tiny_checkpoint(ck)
    reqs = "\n".join(json.dumps(r) for r in [
        {"op": "ping"},
        {"op": "style_transfer", "content": a, "style": b, "out": out1,
         "fix": "chord"},
        {"op": "variation", "input": a, "out": out2, "scale": 0.5,
         "seed": 1},
        {"op": "nonsense"},                      # must not kill the loop
        {"op": "reload", "checkpoint": ck},      # hot-swap weights
        {"op": "reload", "checkpoint": str(tmp_path / "missing")},  # error
        {"op": "variation", "input": a, "out": out2, "scale": 0.5,
         "seed": 2},                             # still serves after reload
        {"op": "stats"},
        {"op": "quit"},
    ]) + "\n"
    # two raw malformed lines spliced in: invalid JSON + a non-object payload
    lines_in = reqs.splitlines(keepends=True)
    reqs = "".join(lines_in[:4]) + "{not json}\n[1, 2, 3]\n" + \
        "".join(lines_in[4:])
    env = dict(os.environ, PCTD_JAX_CACHE=str(tmp_path / "cache"))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--tiny", "--fixed-batch", "4", "--max-windows", "4",
         "--platform", "cpu"],
        input=reqs, env=env, capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [json.loads(ln) for ln in res.stdout.strip().splitlines()]
    assert {"ready": True}.items() <= lines[1].items() or \
        any("ready" in ln for ln in lines[:3])
    replies = [ln for ln in lines if "ok" in ln]
    assert replies[0]["ok"] is True                       # ping
    assert replies[1]["ok"] and replies[1]["windows"] >= 1  # style transfer
    assert replies[2]["ok"]                               # variation
    assert replies[3]["ok"] is False and "unknown op" in replies[3]["error"]
    assert replies[4]["ok"] is False                      # {not json}
    assert replies[5]["ok"] is False                      # [1, 2, 3]
    assert replies[6]["ok"] and replies[6]["reloaded"] == ck
    assert replies[7]["ok"] is False                      # missing ckpt
    assert replies[8]["ok"]                               # serves post-reload
    stats = replies[9]
    assert stats["ok"] and stats["stats"]["variation"]["count"] == 2
    assert stats["stats"]["variation"]["p50_ms"] > 0
    assert stats["stats"]["reload"]["count"] == 2         # incl. the failure
    assert replies[10]["ok"] and replies[10].get("bye")   # quit
    from pctd_tpu.data.midi_io import MidiFile
    for out in (out1, out2):
        assert os.path.exists(out)
        MidiFile.read(out)


@pytest.mark.slow
def test_serve_daemon_data_parallel_mesh(tmp_path):
    """--data-parallel on the virtual 8-device CPU mesh: batches shard over
    the mesh through the Sampler's shard_map programs."""
    import json

    a = ("/root/reference/demo/2_texture_variation/prior_sampling/"
         "more_examples/Am-D7-G.mid")
    if not os.path.exists(a):
        pytest.skip("reference demo MIDIs not available")
    out = str(tmp_path / "dp.mid")
    reqs = "\n".join(json.dumps(r) for r in [
        {"op": "ping"},
        {"op": "variation", "input": a, "out": out, "seed": 1},
        {"op": "quit"},
    ]) + "\n"
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PCTD_JAX_CACHE=str(tmp_path / "cache"))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--tiny", "--fixed-batch", "8", "--max-windows", "4",
         "--platform", "cpu", "--data-parallel"],
        input=reqs, env=env, capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [json.loads(ln) for ln in res.stdout.strip().splitlines()]
    ready = next(ln for ln in lines if "ready" in ln)
    assert ready["devices"] == 8
    replies = [ln for ln in lines if "ok" in ln]
    assert replies[0]["ok"] and replies[1]["ok"]
    assert os.path.exists(out)


def test_bench_docs_in_sync():
    """README/ARCHITECTURE perf tables must match the committed bench
    artifact (scripts/report_bench.py --check) — published numbers can never
    drift from the measurement again."""
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "report_bench.py"),
         os.path.join(REPO, "bench_results.json"), "--check"],
        capture_output=True, text=True, timeout=60)
    assert res.returncode == 0, res.stderr
