"""Batch iteration over a SegmentCorpus.

Replaces the reference's torch DataLoader over (segment, shift) index pairs
(dataset.py:63-70, dataset_loaders.py): the index space is still
N x (shift_high - shift_low + 1), but a batch is just a gather from the packed
arrays plus a shift vector — all augmentation and feature derivation happens
on device (pctd_tpu.data.tensorize).

Batches are fixed-shape (drop_last=True by default) so every step hits the
same compiled program.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from pctd_tpu.data.corpus import SegmentCorpus


class SegmentBatches:
    """Iterable over device-ready host batches."""

    def __init__(self, corpus: SegmentCorpus, batch_size: int,
                 shift_low: int = -6, shift_high: int = 5,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, include_mel: bool = False):
        self.corpus = corpus
        self.batch_size = batch_size
        self.shift_low = shift_low
        self.shift_high = shift_high
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.include_mel = include_mel
        self._rng = np.random.RandomState(seed)
        self.n_shift = shift_high - shift_low + 1
        self.num_index = len(corpus) * self.n_shift

    def __len__(self):
        if self.drop_last:
            return self.num_index // self.batch_size
        return -(-self.num_index // self.batch_size)

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(self.num_index)
        if self.shuffle:
            self._rng.shuffle(order)
        n_full = self.num_index - (self.num_index % self.batch_size
                                   if self.drop_last else 0)
        for s in range(0, n_full, self.batch_size):
            idx = order[s:s + self.batch_size]
            yield self.gather(idx)

    def gather(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        seg = idx // self.n_shift
        shift = (idx % self.n_shift + self.shift_low).astype(np.int32)
        batch = {
            "pr": self.corpus.pr[seg],
            "chord": self.corpus.chord[seg],
            "shift": shift,
        }
        if self.include_mel:
            batch["mel"] = self.corpus.mel[seg]
        return batch


def make_loaders(train: SegmentCorpus, val: SegmentCorpus, batch_size: int,
                 shift_low: int = -6, shift_high: int = 5, seed: int = 0,
                 val_batch_size: Optional[int] = None):
    """(train iter with augmentation+shuffle, val iter without) — mirrors
    MusicDataLoaders.get_loaders semantics (reference dataset_loaders.py:8-15:
    val uses shift 0 only, no shuffle)."""
    # Clamp the val batch to the val-set size: with drop_last fixed shapes, a
    # batch larger than the split would otherwise yield ZERO eval batches
    # (and a silent val loss of 0.0 poisoning best-checkpoint selection).
    vbs = min(val_batch_size or batch_size, max(len(val), 1))
    return (
        SegmentBatches(train, batch_size, shift_low, shift_high,
                       shuffle=True, seed=seed),
        SegmentBatches(val, vbs, 0, 0, shuffle=False, seed=seed),
    )
