"""End-to-end smoke of the demo-workflow script (tiny dims, untrained)."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_make_demos_tiny(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PCTD_JAX_CACHE=str(tmp_path / "cache"))
    out = str(tmp_path / "demo_out")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_demos.py"),
         "--tiny", "--k", "2", "--out", out],
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    mids = [os.path.join(dp, f) for dp, _, fs in os.walk(out)
            for f in fs if f.endswith(".mid")]
    assert len(mids) >= 10
    # every produced file parses with our reader
    from pctd_tpu.data.midi_io import MidiFile
    for fn in mids:
        MidiFile.read(fn)
    # all four workflow families present
    subdirs = {os.path.relpath(dp, out).split(os.sep)[0]
               for dp, _, fs in os.walk(out) if fs}
    assert {"1_compositional_style_transfer", "2_texture_variation",
            "3_acc_arrangement",
            "chord_prog_interpolation"}.issubset(subdirs)
