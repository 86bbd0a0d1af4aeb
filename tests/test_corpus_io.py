"""POP909-format npz corpus ingestion + SegmentCorpus persistence."""
import os
import pickle

import numpy as np

from pctd_tpu.config import DataConfig
from pctd_tpu.data.corpus import (SegmentCorpus, collect_data_fns,
                                  init_music_from_npz, prepare_dataset)
from pctd_tpu.data.synthetic import synthetic_song


def write_npz_corpus(dirname, n_songs=4, seed=0):
    """Serialize synthetic songs in the POP909 npz layout the reference
    consumes (keys beat/chord/melody/bridge/piano, dataset.py:231-239)."""
    rng = np.random.RandomState(seed)
    os.makedirs(dirname, exist_ok=True)
    fns = []
    for i in range(n_songs):
        music = synthetic_song(rng, n_bars=8)
        fn = os.path.join(dirname, f"{i + 1:03d}.npz")
        np.savez(fn, beat=music.beat_track.beat_table,
                 chord=music.chord_table, melody=music.tracks[0],
                 bridge=music.tracks[1], piano=music.tracks[2])
        fns.append(fn)
    return fns


def test_npz_roundtrip_and_prepare_dataset(tmp_path):
    data_dir = str(tmp_path / "POP")
    fns = write_npz_corpus(data_dir, n_songs=6)
    music = init_music_from_npz(fns[0])
    _, indicator, _ = music.prepare_data(num_bar=2)
    assert indicator.sum() > 0

    cfg = DataConfig(data_path=data_dir, index_path=str(tmp_path / "none.xlsx"),
                     portion=4)
    train_c, val_c = prepare_dataset(cfg)
    assert len(train_c) > 0 and len(val_c) > 0
    assert train_c.pr.shape[1:] == (32, 128)


def test_ind_pkl_override(tmp_path):
    """data/ind.pkl takes precedence over the glob (reference
    dataset.py:269-271)."""
    data_dir = str(tmp_path / "data" / "POP")
    fns = write_npz_corpus(data_dir, n_songs=5)
    subset = fns[:2]
    with open(os.path.join(str(tmp_path / "data"), "ind.pkl"), "wb") as f:
        pickle.dump(subset, f)
    cfg = DataConfig(data_path=data_dir,
                     index_path=str(tmp_path / "none.xlsx"))
    assert collect_data_fns(cfg) == subset


def test_xlsx_meter_filter(tmp_path):
    """The xlsx index filter keeps songs whose meter matches cfg.ts by
    default; cfg.ref_meter_filter=True reproduces the reference's literal
    == 2 quirk (dataset.py:225-227)."""
    import dataclasses

    import pandas as pd

    data_dir = str(tmp_path / "POP")
    fns = write_npz_corpus(data_dir, n_songs=4)
    index_fn = str(tmp_path / "index.csv")  # no xlsx engine in this image
    pd.DataFrame({
        "song_id": [1, 2, 3, 4],
        "num_beats_per_measure": [4, 2, 4, 3],
    }).to_csv(index_fn, index=False)
    cfg = DataConfig(data_path=data_dir, index_path=index_fn)
    assert collect_data_fns(cfg) == [fns[0], fns[2]]          # meter == ts=4
    ref_cfg = dataclasses.replace(cfg, ref_meter_filter=True)
    assert collect_data_fns(ref_cfg) == [fns[1]]              # literal == 2


def test_segment_corpus_save_load(tmp_path):
    data_dir = str(tmp_path / "POP")
    write_npz_corpus(data_dir, n_songs=4)
    cfg = DataConfig(data_path=data_dir, index_path=str(tmp_path / "x.xlsx"),
                     portion=3)
    train_c, _ = prepare_dataset(cfg)
    fn = str(tmp_path / "corpus.npz")
    train_c.save(fn)
    back = SegmentCorpus.load(fn)
    np.testing.assert_array_equal(back.pr, train_c.pr)
    np.testing.assert_array_equal(back.chord, train_c.chord)
    np.testing.assert_array_equal(back.song_id, train_c.song_id)
