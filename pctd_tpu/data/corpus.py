"""Corpus assembly: songs -> packed per-segment arrays.

TPU-first redesign of the reference's ArrangementDataset (dataset.py:18-120):
instead of re-tensorizing every (segment, transposition) pair in
``__getitem__`` on every epoch, each valid 2-bar window is tensorized ONCE
into a compact base representation —

    pr    (N, 32, 128) uint8   onset(2)/sustain(1)/rest(0) accompaniment roll
    mel   (N, 32, 130) uint8   melody roll (sustain col 128, rest col 129)
    chord (N, 8, 14)   float32 raw per-beat chord rows

— and all augmentation / derived features happen on device at batch time
(pctd_tpu.data.tensorize). ~5 KB per segment; a POP909-scale corpus fits in
memory many times over.
"""
from __future__ import annotations

import glob
import os
import pickle
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from pctd_tpu.config import DataConfig
from pctd_tpu.data.converter import ext_nmat_to_mel_pr, ext_nmat_to_pr
from pctd_tpu.data.score import PolyphonicMusic


@dataclass
class SegmentCorpus:
    """Packed, un-augmented 2-bar segments (one split)."""

    pr: np.ndarray        # (N, 32, 128) uint8
    mel: np.ndarray       # (N, 32, 130) uint8
    chord: np.ndarray     # (N, 8, 14) float32
    song_id: np.ndarray   # (N,) int32 — provenance
    bar_pos: np.ndarray   # (N,) int32 — index of the segment's first bar

    def __len__(self):
        return self.pr.shape[0]

    def save(self, fn: str):
        np.savez_compressed(fn, pr=self.pr, mel=self.mel, chord=self.chord,
                            song_id=self.song_id, bar_pos=self.bar_pos)

    @staticmethod
    def load(fn: str) -> "SegmentCorpus":
        d = np.load(fn)
        return SegmentCorpus(d["pr"], d["mel"], d["chord"], d["song_id"],
                             d["bar_pos"])

    @staticmethod
    def concat(parts: Sequence["SegmentCorpus"]) -> "SegmentCorpus":
        return SegmentCorpus(*[np.concatenate([getattr(p, f) for p in parts])
                               for f in ("pr", "mel", "chord", "song_id",
                                         "bar_pos")])


def _translate(nmat: Optional[np.ndarray], translation: float):
    """Shift a bar-relative nmat in beats (reference dataset.py:41-47)."""
    if nmat is None:
        return None
    nmat = nmat.copy()
    nmat[:, 0] -= translation
    nmat[:, 3] -= translation
    return nmat


def combine_segments(*bars, ts: int = 4):
    """Combine consecutive 1-bar nmats into one multi-bar nmat: bar j is
    shifted to beats [j*ts, (j+1)*ts) (reference dataset.py:49-61 for the
    2-bar case; generalized for the 32-bar stretch config)."""
    parts = [_translate(bar, -ts * j) for j, bar in enumerate(bars)
             if bar is not None]
    if not parts:
        return None
    return np.concatenate(parts, axis=0)


def song_to_segments(music: PolyphonicMusic, song_id: int, num_bar: int = 2,
                     ts: int = 4) -> Optional[SegmentCorpus]:
    """All valid num_bar windows of one song -> packed arrays (the base
    tensorization of reference dataset.py:67-120, shift = 0, done once).
    Segments are num_bar * ts * 4 sixteenth-steps long (32 at the canonical
    num_bar=2)."""
    data_track, indicator, _ = music.prepare_data(num_bar=num_bar, ts=ts)
    valid = np.where(indicator == 1)[0]
    if len(valid) == 0:
        return None
    num_step = num_bar * ts * 4
    prs, mels, chords = [], [], []
    for i in valid:
        bars = data_track[i:i + num_bar]
        mel_nmat = combine_segments(*[b[0] for b in bars], ts=ts)
        acc_nmat = combine_segments(*[b[1] for b in bars], ts=ts)
        prs.append(ext_nmat_to_pr(acc_nmat, num_step).astype(np.uint8))
        mels.append(ext_nmat_to_mel_pr(mel_nmat, num_step).astype(np.uint8))
        chords.append(np.concatenate([b[2] for b in bars],
                                     axis=0).astype(np.float32))
    return SegmentCorpus(
        pr=np.stack(prs), mel=np.stack(mels), chord=np.stack(chords),
        song_id=np.full(len(valid), song_id, np.int32),
        bar_pos=valid.astype(np.int32))


def valid_song_runs(corpus: SegmentCorpus, min_bars: int = 16,
                    num_bar: int = 2) -> List[Tuple[int, int]]:
    """(start_index, length) of runs of consecutive valid bars per song,
    keeping runs with length + num_bar + 1 >= min_bars (capability of
    reference collect_song.get_valid_song_inds, collect_song.py:7-31: a run
    of L valid window starts spans L + num_bar - 1 bars of data, and the
    reference admits runs within one bar of min_bars). ``num_bar`` must
    match the window size the corpus was built with (song_to_segments)."""
    runs = []
    n = len(corpus)
    i = 0
    while i < n:
        j = i
        while (j + 1 < n and corpus.song_id[j + 1] == corpus.song_id[i]
               and corpus.bar_pos[j + 1] == corpus.bar_pos[j] + 1):
            j += 1
        length = j - i + 1
        if length + num_bar + 1 >= min_bars:
            runs.append((i, length))
        i = j + 1
    return runs


# ---------------------------------------------------------------------------
# corpus construction from POP909-style npz files
# ---------------------------------------------------------------------------


def init_music_from_npz(fn: str) -> PolyphonicMusic:
    """npz with keys beat/chord/melody/bridge/piano -> PolyphonicMusic
    (reference dataset.py:231-239)."""
    d = np.load(fn)
    return PolyphonicMusic([d["melody"], d["bridge"], d["piano"]],
                           d["beat"], d["chord"], [70, 0, 0])


def collect_data_fns(cfg: DataConfig) -> List[str]:
    """Glob the npz corpus; honor data/ind.pkl when present (the reference
    overrides its meter filter with that pickle, dataset.py:269-271).

    Meter filter: keep songs whose ``num_beats_per_measure`` equals
    ``cfg.ts`` (the value the rest of the pipeline assumes). The reference
    literally filters ``== 2`` while assuming 4 beats/bar downstream
    (dataset.py:225-227, a documented defect); ``cfg.ref_meter_filter=True``
    reproduces that behavior for strict parity."""
    ind_pkl = os.path.join(os.path.dirname(cfg.data_path), "ind.pkl")
    if os.path.exists(ind_pkl):
        with open(ind_pkl, "rb") as f:
            return pickle.load(f)
    fns = sorted(glob.glob(os.path.join(cfg.data_path, "*.npz")))
    index_path = cfg.index_path
    if os.path.exists(index_path):
        import pandas as pd

        want = 2 if cfg.ref_meter_filter else cfg.ts
        # reference uses index.xlsx (dataset.py:216-228); csv also accepted
        # (no xlsx engine ships in every environment)
        if index_path.endswith(".csv"):
            df = pd.read_csv(index_path)
        else:
            df = pd.read_excel(index_path)
        keep = []
        for fn in fns:
            song_id = int(os.path.basename(fn)[0:3])
            meta = df[df.song_id == song_id]
            if len(meta) and int(meta.num_beats_per_measure.values[0]) == want:
                keep.append(fn)
        fns = keep
    return fns


def split_ids(length: int, portion: int, seed: int
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Random train/val song split, portion:1 (reference dataset.py:242-246;
    same np.random.seed discipline)."""
    rng = np.random.RandomState(seed)
    train = rng.choice(length, int(length * portion / (portion + 1)),
                       replace=False)
    val = np.setdiff1d(np.arange(length), train)
    return train, val


def build_corpora(musics: Sequence[PolyphonicMusic], cfg: DataConfig
                  ) -> Tuple[SegmentCorpus, SegmentCorpus]:
    """Song-level split -> (train, val) packed corpora."""
    train_ids, val_ids = split_ids(len(musics), cfg.portion, cfg.seed)

    def pack(ids):
        parts = [song_to_segments(musics[i], i, cfg.num_bar, cfg.ts)
                 for i in ids]
        parts = [p for p in parts if p is not None]
        if not parts:
            raise ValueError("no valid segments in corpus split")
        return SegmentCorpus.concat(parts)

    return pack(train_ids), pack(val_ids)


def prepare_dataset(cfg: DataConfig) -> Tuple[SegmentCorpus, SegmentCorpus]:
    """npz corpus on disk -> (train, val) corpora
    (capability of reference prepare_dataset, dataset.py:265-281)."""
    fns = collect_data_fns(cfg)
    if not fns:
        raise FileNotFoundError(
            f"no npz files under {cfg.data_path}; use "
            "pctd_tpu.data.synthetic.synthetic_corpora for a self-contained "
            "corpus")
    musics = [init_music_from_npz(fn) for fn in fns]
    return build_corpora(musics, cfg)
