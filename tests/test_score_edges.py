"""Score-model edge cases: partial-bar regularization, downbeats,
time-signature extraction, MIDI export."""
import numpy as np

from pctd_tpu.data.score import BeatTrack, PolyphonicMusic
from pctd_tpu.data.synthetic import synthetic_song


def make_beat_table(n_beats, ts=4, start_beat=0):
    b = np.arange(start_beat, start_beat + n_beats)
    t = np.zeros((n_beats, 6), dtype=np.int64)
    t[:, 0] = t[:, 3] = b % ts
    t[:, 1] = t[:, 4] = b // ts
    t[:, 2] = t[:, 5] = ts
    return t


def test_beat_track_pre_regularization():
    # starts mid-bar (beat 2 of 4): two fill rows prepended
    table = make_beat_table(10, start_beat=2)
    bt = BeatTrack(table)
    assert bt.translation == 2
    assert bt.beat_table[0, 3] == 0
    db_pos, db_ts = bt.get_downbeats()
    assert db_pos[0] == 0 and (db_ts == 4).all()


def test_beat_track_post_regularization():
    # ends mid-bar (total 10 beats = 2.5 bars): filled to bar end
    table = make_beat_table(10)
    bt = BeatTrack(table)
    assert bt.post_translation == 2
    assert bt.beat_table[-1, 3] == bt.beat_table[-1, 5] - 1


def test_time_signature_change():
    t4 = make_beat_table(8, ts=4)
    t3 = make_beat_table(6, ts=3)
    table = np.concatenate([t4, t3])
    bt = BeatTrack(table, require_regularize=False)
    pos, vals = bt.get_time_signature_change()
    assert list(pos) == [0, 8]
    assert list(vals) == [4, 3]


def test_chord_table_padding_follows_regularization():
    table = make_beat_table(10, start_beat=2)     # pre 2, post 0
    chord = np.ones((10, 14))
    track = np.array([[0, 0, 4, 1, 0, 4, 60, 100]], dtype=float)
    music = PolyphonicMusic([track], table, chord)
    assert music.chord_table.shape[0] == music.beat_track.beat_table.shape[0]
    assert (music.chord_table[:2] == 0).all()     # pre padding
    # track translated by the same amount
    assert music.tracks[0][0, 0] == 2


def test_indicator_rejects_blank_and_tail_bars():
    rng = np.random.RandomState(1)
    music = synthetic_song(rng, n_bars=6)
    _, indicator, db_pos = music.prepare_data(num_bar=2)
    assert len(db_pos) == 6
    assert indicator[-1] == 0                      # no room for the window
    assert set(np.unique(indicator)).issubset({0.0, 1.0})


def test_score_midi_export(tmp_path):
    rng = np.random.RandomState(2)
    music = synthetic_song(rng, n_bars=4)
    fn = str(tmp_path / "song.mid")
    music.write_midi(fn)
    from pctd_tpu.data.midi_io import MidiFile
    back = MidiFile.read(fn)
    assert sum(len(t.notes) for t in back.tracks) > 10
