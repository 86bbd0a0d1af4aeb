"""Chord-relative ("detrended") PianoTree features.

Re-expresses each PianoTree note relative to the per-beat chord, producing the
(32, 16, 39) feature consumed by the PianoTree texture encoder in the
reference's "nozoth" config (reference dataset.py:123-213, train.py:32).

Feature layout per note (39-d):
    [is_note(4) | is_bass(3) | octave(12) | scale_degree(8) |
     note_state(7) | dur_bits(5)]

Two implementations share the same tables: a batched NumPy one (host,
golden-testable against the reference) and a jnp one used inside the jitted
on-device tensorizer.

Reference quirks reproduced deliberately (documented in SURVEY.md §2):

- ``semi_table`` is indexed by *scale degree* (0..7), not by chromatic degree
  (reference dataset.py:202), so the semitone flags follow the reference's
  values, odd as they look.
- The per-beat ``has_bass`` flag is consumed by the very first processed slot
  of each beat — always the sos token — so the is_bass feature degenerates to
  "index 2 on the first slot of a beat, index 0 everywhere else"
  (reference dataset.py:150-159). The intended bass marking never fires; we
  replicate the actual behavior exactly for input-feature parity.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

DEG_TABLE = np.array([0, 1, 1, 2, 2, 3, 3, 4, 5, 5, 6, 6], dtype=np.int32)
SEMI_TABLE = np.array([0, 0, 1, 0, 1, 0, 1, 0, 0, 1, 0, 1], dtype=np.int32)
# n_state = NSTATE_TABLE[c_state, semitone] (reference dataset.py:203-212)
NSTATE_TABLE = np.array([[1, 0], [0, 1], [2, 3], [4, 5]], dtype=np.int32)


def select_roll(x: jnp.ndarray, shift: jnp.ndarray, low: int, high: int,
                axis: int = -1) -> jnp.ndarray:
    """Per-sample circular roll as a select over STATIC rolls.

    TPU gathers along the minor (lane) dimension are pathologically slow
    (measured: 25 s for a (4096, 32, 128) per-sample take_along_axis vs <10 ms
    for this formulation); static rolls are native lane rotations, and the
    roll range here is tiny (<= 12 semitones). shift values outside
    [low, high] produce zeros (precondition, asserted in tests).
    """
    cond_shape = shift.shape + (1,) * (x.ndim - 1 - shift.ndim + 1)
    acc = jnp.zeros_like(x)
    for s in range(low, high + 1):
        rolled = jnp.roll(x, s, axis=axis) if s else x
        acc = jnp.where((shift == s).reshape(cond_shape), rolled, acc)
    return acc


def _pair_state(lo, hi):
    """map_dic {(1,0):0, (0,1):1, (0,0):2, (1,1):3} in arithmetic form
    (reference dataset.py:134, 170-183); defined for binary chroma."""
    return 2 - 2 * lo - hi + 4 * lo * hi


def _chroma_states(rolled, xp):
    """rolled: (..., 8, 12) root-relative chroma -> (..., 8, 7) states."""
    cs = [None] * 7
    cs[0] = ((1 - rolled[..., 0]) * 2)
    cs[4] = ((1 - rolled[..., 7]) * 2)
    cs[1] = _pair_state(rolled[..., 1], rolled[..., 2])
    cs[2] = _pair_state(rolled[..., 3], rolled[..., 4])
    cs[3] = _pair_state(rolled[..., 5], rolled[..., 6])
    cs[5] = _pair_state(rolled[..., 8], rolled[..., 9])
    cs[6] = _pair_state(rolled[..., 10], rolled[..., 11])
    return xp.stack(cs, axis=-1)


def _detrend_core(grids, chords, xp, one_hot):
    """Shared numpy/jnp implementation.

    grids:  (N, 32, 16, 6) int PianoTree grid
    chords: (N, 8, 36) expanded chord
    returns (N, 32, 16, 39) float32
    """
    itype = np.int32 if xp is np else jnp.int32
    N = grids.shape[0]
    root = xp.argmax(chords[..., 0:12], axis=-1).astype(itype)   # (N, 8)
    chroma = chords[..., 12:24].astype(itype)

    # root-relative chroma: rolled[j] = chroma[(j + root) % 12]
    # == roll(chroma, -root); on device this is a select over static rolls
    # (lane-dim gathers are pathologically slow on TPU, see select_roll)
    if xp is np:
        j = xp.arange(12, dtype=itype)
        src = (j[None, None, :] + root[..., None]) % 12          # (N, 8, 12)
        rolled = xp.take_along_axis(chroma, src, axis=-1)
    else:
        rolled = select_roll(chroma, (-root) % 12, 0, 11)
    states = _chroma_states(rolled, xp)                          # (N, 8, 7)

    pitch = grids[..., 0].reshape(N, 8, 4, 16)                   # beat-major
    dur = grids[..., 1:6].reshape(N, 8, 4, 16, 5)

    special = pitch >= 128
    safe_pitch = xp.where(special, 0, pitch)
    octave = xp.where(special, 11, safe_pitch // 12)
    degree = (safe_pitch - root[:, :, None, None]) % 12
    deg_tab = xp.asarray(DEG_TABLE)
    semi_tab = xp.asarray(SEMI_TABLE)
    ns_flat = xp.asarray(NSTATE_TABLE).reshape(-1)
    scale_deg = deg_tab[degree] if xp is np else jnp.take(deg_tab, degree)
    semitone = semi_tab[scale_deg] if xp is np else jnp.take(semi_tab, scale_deg)
    # gather per-beat chroma state at each note's scale degree:
    # states (N,8,7) -> (N,8,1,1,7); idx (N,8,4,16,1)
    c_state = xp.take_along_axis(states[:, :, None, None, :],
                                 scale_deg[..., None], axis=-1)[..., 0]
    ns_idx = c_state * 2 + semitone
    n_state = ns_flat[ns_idx] if xp is np else jnp.take(ns_flat, ns_idx)

    is_note = xp.where(special, pitch - 127, 0)
    scale_deg = xp.where(special, 7, scale_deg)
    n_state = xp.where(special, 6, n_state)

    # is_bass: reference dataset.py:150-159 degenerate semantics — index 2 on
    # the first (i=0, j=0) slot of every beat, index 0 elsewhere.
    ii = xp.arange(4)[None, None, :, None]
    jj = xp.arange(16)[None, None, None, :]
    is_bass = xp.where((ii == 0) & (jj == 0), 2, 0)
    is_bass = xp.broadcast_to(is_bass, pitch.shape)

    feats = xp.concatenate([
        one_hot(is_note, 4),
        one_hot(is_bass, 3),
        one_hot(octave, 12),
        one_hot(scale_deg, 8),
        one_hot(n_state, 7),
        dur.astype(xp.float32),
    ], axis=-1)
    return feats.reshape(N, 32, 16, 39)


def _np_one_hot(idx, k):
    return np.eye(k, dtype=np.float32)[idx]


def detrend_pianotree_batch(grids: np.ndarray, chords: np.ndarray) -> np.ndarray:
    """Batched NumPy detrend: (N,32,16,6) grid + (N,8,36) chord -> (N,32,16,39)."""
    return _detrend_core(np.asarray(grids).astype(np.int32),
                         np.asarray(chords), np, _np_one_hot)


def detrend_pianotree(grid: np.ndarray, chord: np.ndarray) -> np.ndarray:
    """Single-segment wrapper (reference dataset.py:123 signature)."""
    return detrend_pianotree_batch(grid[None], chord[None])[0]


def _jnp_one_hot(idx, k):
    return jax.nn.one_hot(idx, k, dtype=jnp.float32)


def detrend_pianotree_jnp(grids: jnp.ndarray, chords: jnp.ndarray) -> jnp.ndarray:
    """On-device detrend, jit-safe. grids (N,32,16,6) int, chords (N,8,36)."""
    return _detrend_core(grids.astype(jnp.int32), chords, jnp, _jnp_one_hot)
