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

    # 2: posterior original + 3 samples; prior 2 samples
    d2p = "2_texture_variation/posterior_sampling"
    read(f"{d2p}/original.mid")
    for s in range(3):
        read(f"{d2p}/post_sample_{s}.mid")
    for s in range(2):
        read(f"2_texture_variation/prior_sampling/prior_sample_{s}.mid")

    # 3: melody + arranged accompaniment tracks (corpora ingested from
    # accompaniment-only MIDIs have no melody track to lay down)
    mf = read("3_acc_arrangement/arrangement_given_texture.mid")
    want = (["melody", "arranged_acc"] if expect_melody
            else ["arranged_acc"])
    assert [t.name for t in mf.tracks] == want

    # 4: chord interpolation
    assert len(read("chord_prog_interpolation/interp_chd.mid").tracks) == 1


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


@pytest.mark.slow
def test_serve_daemon_end_to_end(tmp_path):
    """scripts/serve.py: long-running JSON-lines service — ping, two
    workflow requests against real demo MIDIs, error survival, quit."""
    import json

    a = ("/root/reference/demo/2_texture_variation/prior_sampling/"
         "more_examples/Am-D7-G.mid")
    b = ("/root/reference/demo/2_texture_variation/prior_sampling/"
         "more_examples/G-F-Eb.mid")
    out1 = str(tmp_path / "st.mid")
    out2 = str(tmp_path / "var.mid")
    reqs = "\n".join(json.dumps(r) for r in [
        {"op": "ping"},
        {"op": "style_transfer", "content": a, "style": b, "out": out1,
         "fix": "chord"},
        {"op": "variation", "input": a, "out": out2, "scale": 0.5,
         "seed": 1},
        {"op": "nonsense"},                      # must not kill the loop
        {"op": "quit"},
    ]) + "\n"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PCTD_JAX_CACHE=str(tmp_path / "cache"))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "serve.py"),
         "--tiny", "--fixed-batch", "4", "--max-windows", "4"],
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
    assert replies[4]["ok"] and replies[4].get("bye")     # quit
    from pctd_tpu.data.midi_io import MidiFile
    for out in (out1, out2):
        assert os.path.exists(out)
        mf = MidiFile.read(out)
        assert len(mf.tracks) >= 1
