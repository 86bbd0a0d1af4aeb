"""Raw-MIDI ingestion: quantization, beat-table inference, chord estimation,
and end-to-end corpus assembly from the reference demo MIDIs (real music)."""
import numpy as np
import pytest

from pctd_tpu.data import midi_io
from pctd_tpu.data.ingest import (estimate_chords, infer_beat_table,
                                  midi_to_musics, quantize_notes)

DEMO = "/root/reference/demo"


def test_quantize_notes_grid():
    # (start_beat, end_beat, pitch, vel) — off-grid onsets snap to 16ths
    notes = [(0.0, 1.0, 60, 100), (1.26, 1.49, 64, 90), (3.99, 4.02, 67, 80)]
    nm = quantize_notes(notes)
    assert nm.shape == (3, 8)
    np.testing.assert_array_equal(nm[0, :6], [0, 0, 4, 1, 0, 4])
    np.testing.assert_array_equal(nm[1, :6], [1, 1, 4, 1, 2, 4])
    # zero-length after rounding -> one quantum
    np.testing.assert_array_equal(nm[2, :6], [4, 0, 4, 4, 1, 4])
    assert quantize_notes([]).shape == (0, 8)


def test_infer_beat_table_4_4():
    t = infer_beat_table(9, [])
    assert t.shape == (9, 6)
    np.testing.assert_array_equal(t[:, 3], [0, 1, 2, 3, 0, 1, 2, 3, 0])
    np.testing.assert_array_equal(t[:, 4], [0, 0, 0, 0, 1, 1, 1, 1, 2])
    assert (t[:, 5] == 4).all()


def test_infer_beat_table_ts_change():
    # 4/4 then 3/4 from beat 4
    t = infer_beat_table(10, [(0.0, 4, 4), (4.0, 3, 4)])
    assert (t[:4, 5] == 4).all() and (t[4:, 5] == 3).all()
    np.testing.assert_array_equal(t[4:10, 3], [0, 1, 2, 0, 1, 2])


def test_estimate_chords_triads():
    # two bars: C major block chords then A minor
    notes = [(b, b + 1, p, 100) for b in range(4) for p in (48, 60, 64, 67)]
    notes += [(4 + b, 5 + b, p, 100) for b in range(4) for p in (45, 57, 60, 64)]
    chords = estimate_chords(quantize_notes(notes), 8)
    assert (chords[:4, 0] == 0).all()       # C root
    assert (chords[4:, 0] == 9).all()       # A root
    np.testing.assert_array_equal(chords[0, 1:13],
                                  [1, 0, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0])
    assert chords[0, 13] == 0               # bass = C
    assert chords[4, 13] == 9               # bass = A


def test_estimate_chords_bass_disambiguates_relative():
    """Identical {C,E,G,A} chroma is C-rooted over a C bass and A-rooted
    over an A bass (relative major/minor ambiguity, resolved by the
    bass_bonus emission term)."""
    def beat(b, bass):
        # sustained triad + a brief A passing tone (the arpeggiated-texture
        # shape that makes the label ambiguous: Am7 covers all four pcs)
        return ([(b, b + 1, p, 100) for p in (bass, 60, 64, 67)]
                + [(b, b + 0.25, 69, 100)])
    notes = beat(0, 36) + beat(1, 36) + beat(2, 33) + beat(3, 33)
    # switch_penalty=0 isolates the per-beat emission (the bonus is an
    # emission term; with the default penalty the Viterbi path correctly
    # refuses to split a sustained ambiguity, which is its own job)
    chords = estimate_chords(quantize_notes(notes), 4, switch_penalty=0.0)
    assert (chords[:2, 0] == 0).all()       # C root over C2 bass
    assert (chords[2:, 0] == 9).all()       # A root over A1 bass
    # without the bonus, Am7's full coverage wins on every beat
    chords0 = estimate_chords(quantize_notes(notes), 4, switch_penalty=0.0,
                              bass_bonus=0.0)
    assert (chords0[:, 0] == 9).all()


def test_estimate_chords_viterbi_smooths_blips():
    # sustained C triad with one beat of only E+G (ambiguous): smoothing keeps C
    notes = [(b, b + 1, p, 100) for b in range(4) for p in (48, 60, 64, 67)
             if not (b == 2 and p in (48, 60))]
    chords = estimate_chords(quantize_notes(notes), 4)
    assert (chords[:, 0] == 0).all()


def test_estimate_chords_silence():
    notes = [(2.0, 4.0, 60, 100), (2.0, 4.0, 64, 100), (2.0, 4.0, 67, 100)]
    chords = estimate_chords(quantize_notes(notes), 6)
    assert (chords[:2] == 0).all()          # leading silence: no chord
    assert (chords[2:4, 0] == 0).all() and chords[2, 1] == 1
    assert (chords[4:, 0] == 0).all()       # trailing: sustained


def test_known_progressions_from_demo_midis():
    ms = midi_to_musics(f"{DEMO}/2_texture_variation/prior_sampling/"
                        "more_examples/Am-D7-G.mid")
    roots = ms[0].chord_table[:8, 0].astype(int)
    np.testing.assert_array_equal(roots, [9, 9, 2, 2, 7, 7, 7, 7])
    ms = midi_to_musics(f"{DEMO}/2_texture_variation/prior_sampling/"
                        "more_examples/G-F-Eb.mid")
    roots = ms[0].chord_table[:8, 0].astype(int)
    np.testing.assert_array_equal(roots, [7, 7, 5, 5, 3, 3, 3, 3])


def test_midi_to_musics_structure():
    fn = f"{DEMO}/2_texture_variation/posterior_sampling/original.mid"
    ms = midi_to_musics(fn)
    assert len(ms) == 1
    m = ms[0]
    assert len(m.tracks) == 3 and len(m.tracks[1]) > 0
    assert m.beat_track.beat_table.shape[0] == m.chord_table.shape[0]
    _, indicator, db = m.prepare_data(num_bar=2)
    assert (indicator == 1).sum() >= len(db) - 2

    # multi-track file: one score per track
    multi = f"{DEMO}/1_compositional_style_transfer/16bar_style_transfer/all.mid"
    ms = midi_to_musics(multi)
    assert len(ms) == 4


def test_read_beats_exact_under_tempo_change(tmp_path):
    """Beat positions from read_beats are tick-derived, so a mid-file tempo
    change must NOT skew them (a seconds-domain reader would drift)."""
    import struct

    from pctd_tpu.data.midi_io import _varlen

    division = 480

    def ev(delta, data):
        return _varlen(delta) + data

    def tempo(uspq):
        return bytes([0xFF, 0x51, 0x03]) + uspq.to_bytes(3, "big")

    # 120 bpm for 2 beats, then 60 bpm; notes at beats 0,1,2,3 (one beat long)
    track = ev(0, tempo(500_000))
    prev = 0
    events = []
    for beat in (0, 1, 2, 3):
        events.append((beat * division, bytes([0x90, 60 + beat, 100])))
        events.append(((beat + 1) * division, bytes([0x80, 60 + beat, 0])))
    events.insert(0, (2 * division, tempo(1_000_000)))
    events.sort(key=lambda e: e[0])
    for tick, data in events:
        track += ev(tick - prev, data)
        prev = tick
    track += ev(0, bytes([0xFF, 0x2F, 0x00]))
    data = (struct.pack(">4sIHHH", b"MThd", 6, 0, 1, division)
            + struct.pack(">4sI", b"MTrk", len(track)) + track)
    fn = str(tmp_path / "tempo_change.mid")
    with open(fn, "wb") as f:
        f.write(data)

    bm = midi_io.read_beats(fn)
    starts = [n[0] for n in bm.tracks[0].notes]
    ends = [n[1] for n in bm.tracks[0].notes]
    assert starts == [0.0, 1.0, 2.0, 3.0]       # exact despite tempo change
    assert ends == [1.0, 2.0, 3.0, 4.0]
    # while the seconds-domain reader maps beats 2.. at the slower tempo
    mf = midi_io.MidiFile.read(fn)
    secs = [n.start for n in mf.tracks[0].notes]
    assert abs(secs[1] - 0.5) < 1e-6 and abs(secs[3] - 2.0) < 1e-6


def test_read_beats_tick_exact():
    fn = f"{DEMO}/2_texture_variation/prior_sampling/C-Am-F-G.mid"
    bm = midi_io.read_beats(fn)
    assert bm.bpm > 0 and len(bm.tracks) == 1
    starts = np.asarray([n[0] for n in bm.tracks[0].notes])
    # demo files are written on a 16th grid: beat positions are ~multiples of 1/4
    frac = np.abs(starts * 4 - np.rint(starts * 4))
    assert frac.max() < 0.02


@pytest.mark.slow
def test_ingest_directory_end_to_end(tmp_path):
    import dataclasses

    from pctd_tpu.config import DataConfig
    from pctd_tpu.data.ingest import ingest_directory

    cfg = dataclasses.replace(DataConfig(), portion=8)
    cache = str(tmp_path / "corpus")
    train, val = ingest_directory(DEMO, cfg, cache=cache)
    # cache round-trip: second call loads identical corpora from disk
    train2, val2 = ingest_directory(DEMO, cfg, cache=cache)
    np.testing.assert_array_equal(train.pr, train2.pr)
    np.testing.assert_array_equal(val.chord, val2.chord)
    assert len(train) > 2000 and len(val) > 200
    assert train.pr.dtype == np.uint8
    assert train.pr.shape[1:] == (32, 128)
    assert train.chord.shape[1:] == (8, 14)
    # song-level split: no song appears in both
    assert not set(np.unique(train.song_id)) & set(np.unique(val.song_id))
    # chords present almost everywhere
    assert (np.abs(train.chord).sum(-1) > 0).mean() > 0.95
