"""Chord-symbol parsing -> 14-d raw chord rows."""
import numpy as np
import pytest

from pctd_tpu.data.chords import (parse_chord_symbol,
                                  progression_to_chord_table,
                                  split_progression)
from pctd_tpu.data.converter import expand_chord


def chroma_of(row):
    return set(np.nonzero(row[1:13])[0])


def test_basic_triads():
    c = parse_chord_symbol("C")
    assert c[0] == 0 and c[13] == 0
    assert chroma_of(c) == {0, 4, 7}
    am = parse_chord_symbol("Am")
    assert am[0] == 9 and chroma_of(am) == {9, 0, 4}
    eb = parse_chord_symbol("Eb")
    assert eb[0] == 3 and chroma_of(eb) == {3, 7, 10}
    fs = parse_chord_symbol("F#m")
    assert fs[0] == 6 and chroma_of(fs) == {6, 9, 1}


def test_sevenths_and_extensions():
    g7 = parse_chord_symbol("G7")
    assert g7[0] == 7 and chroma_of(g7) == {7, 11, 2, 5}
    cmaj7 = parse_chord_symbol("Cmaj7")
    assert chroma_of(cmaj7) == {0, 4, 7, 11}
    dm7b5 = parse_chord_symbol("Dm7b5")
    assert chroma_of(dm7b5) == {2, 5, 8, 0}
    bdim = parse_chord_symbol("Bdim")
    assert chroma_of(bdim) == {11, 2, 5}


def test_slash_chord_bass():
    ce = parse_chord_symbol("C/E")
    assert ce[0] == 0 and ce[13] == 4
    assert chroma_of(ce) == {0, 4, 7}


def test_no_chord_and_errors():
    assert (parse_chord_symbol("N") == 0).all()
    with pytest.raises(ValueError):
        parse_chord_symbol("Hm")
    with pytest.raises(ValueError):
        parse_chord_symbol("Cxyz")


def test_progression_table_and_split():
    assert split_progression("C-Am-F-G") == ["C", "Am", "F", "G"]
    assert split_progression("Am D7 | G") == ["Am", "D7", "G"]
    table = progression_to_chord_table(["C", "Am", "F", "G"], 8)
    assert table.shape == (8, 14)
    np.testing.assert_array_equal(table[:, 0],
                                  [0, 0, 9, 9, 5, 5, 7, 7])
    # last chord absorbs the remainder
    t3 = progression_to_chord_table(["C", "G"], 5, beats_per_chord=2)
    np.testing.assert_array_equal(t3[:, 0], [0, 0, 7, 7, 7])


def test_rows_feed_expand_chord():
    """Parsed rows are the exact raw format converter.expand_chord consumes
    (reference converter.py:150-164): expansion + transposition works."""
    row = parse_chord_symbol("G7")
    exp = expand_chord(row, shift=2)
    assert exp.shape == (36,)
    assert exp[(7 + 2) % 12] == 1              # root one-hot shifted
    assert exp[24 + (7 + 2) % 12] == 1         # bass one-hot shifted
    assert exp[12:24].sum() == 4               # four chord tones


def test_roundtrip_with_ingest_estimator():
    """A progression rendered as block chords and re-estimated by the
    ingest chord estimator recovers the same roots."""
    from pctd_tpu.data.ingest import estimate_chords, quantize_notes

    prog = ["C", "Am", "F", "G"]
    table = progression_to_chord_table(prog, 8, beats_per_chord=2)
    notes = []
    for b in range(8):
        root = int(table[b, 0])
        tones = np.nonzero(table[b, 1:13])[0]
        for t in tones:
            pitch = 48 + ((t - root) % 12) + root
            notes.append((float(b), float(b + 1), pitch, 90))
    est = estimate_chords(quantize_notes(notes), 8)
    np.testing.assert_array_equal(est[:, 0], table[:, 0])
