"""Host-side symbolic-music tensorizers (numpy, vectorized).

These mirror the semantics of the reference's converter.py (file:line cites
inline) but are written batch-first: every kernel also has an N-segment
variant that processes a whole corpus in one shot. The per-sample Python
loops of the reference (e.g. /root/reference/converter.py:87-147) become
length-32 vector sweeps and flat scatters.

The *on-device* (jnp) versions used inside the jitted train step live in
``pctd_tpu.data.tensorize``; this module is the host/NumPy substrate used for
corpus preprocessing, golden tests, and MIDI round-trips.

Extended note-matrix ("ext_nmat") row format (reference converter.py:35):
    [start_beat, start_quantum, start_denom, end_beat, end_quantum,
     end_denom, pitch, velocity]
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# nmat <-> notes
# ---------------------------------------------------------------------------


def bpm_to_rate(bpm: float) -> float:
    return 60.0 / bpm


def ext_nmat_to_nmat(ext_nmat: np.ndarray) -> np.ndarray:
    """(N, 8) extended nmat -> (N, 4) [start_beat, end_beat, pitch, vel]
    float-beat nmat (reference converter.py:9-15)."""
    nmat = np.zeros((ext_nmat.shape[0], 4))
    nmat[:, 0] = ext_nmat[:, 0] + ext_nmat[:, 1] / ext_nmat[:, 2]
    nmat[:, 1] = ext_nmat[:, 3] + ext_nmat[:, 4] / ext_nmat[:, 5]
    nmat[:, 2] = ext_nmat[:, 6]
    nmat[:, 3] = ext_nmat[:, 7]
    return nmat


def nmat_to_notes(nmat: np.ndarray, start: float, bpm: float):
    """(N, 4) nmat -> list of Note tuples (reference converter.py:23-32).

    Returns ``pctd_tpu.data.midi_io.Note`` records (velocity, pitch, start
    seconds, end seconds).
    """
    from pctd_tpu.data.midi_io import Note

    notes = []
    rate = bpm_to_rate(bpm)
    for s, e, p, v in nmat:
        assert s < e
        assert 0 <= p < 128 and 0 <= v < 128
        notes.append(Note(int(v), int(p), start + s * rate, start + e * rate))
    return notes


# ---------------------------------------------------------------------------
# nmat -> piano roll
# ---------------------------------------------------------------------------


def ext_nmat_to_pr(ext_nmat, num_step: int = 32) -> np.ndarray:
    """(N, 8) ext nmat -> (32, 128) roll with onset=2 / sustain=1 / rest=0
    (reference converter.py:35-46). 2-bar 4/4 segments only."""
    pr = np.zeros((num_step, 128))
    if ext_nmat is not None and len(ext_nmat) > 0:
        arr = np.asarray(ext_nmat)
        s_ind = (arr[:, 0] * arr[:, 2] + arr[:, 1]).astype(int)
        e_ind = (arr[:, 3] * arr[:, 5] + arr[:, 4]).astype(int)
        pitch = arr[:, 6].astype(int)
        # loop over notes (tiny), vectorized over time inside
        for s, e, p in zip(s_ind, e_ind, pitch):
            pr[s, p] = 2
            pr[s + 1:e, p] = 1
    return pr


def ext_nmat_to_mel_pr(ext_nmat, num_step: int = 32) -> np.ndarray:
    """(N, 8) ext nmat -> (32, 130) melody roll: col 128 = sustain,
    col 129 = rest (reference converter.py:49-62)."""
    pr = np.zeros((num_step, 130))
    pr[:, 129] = 1
    if ext_nmat is not None and len(ext_nmat) > 0:
        arr = np.asarray(ext_nmat)
        s_ind = (arr[:, 0] * arr[:, 2] + arr[:, 1]).astype(int)
        e_ind = (arr[:, 3] * arr[:, 5] + arr[:, 4]).astype(int)
        pitch = arr[:, 6].astype(int)
        for s, e, p in zip(s_ind, e_ind, pitch):
            pr[s, p] = 1
            pr[s:e, 129] = 0
            pr[s + 1:e, 128] = 1
    return pr


# ---------------------------------------------------------------------------
# augmentation (pitch transposition)
# ---------------------------------------------------------------------------


def augment_pr(pr: np.ndarray, shift: int = 0) -> np.ndarray:
    """Circular roll of the pitch axis (reference converter.py:65-68)."""
    return np.roll(pr, shift, axis=-1)


def augment_mel_pr(pr: np.ndarray, shift: int = 0) -> np.ndarray:
    """Roll pitch cols 0..127 only; keep sustain/rest cols fixed
    (reference converter.py:71-76)."""
    pitch_part = np.roll(pr[:, 0:128], shift, axis=-1)
    control_part = pr[:, 128:]
    return np.concatenate([pitch_part, control_part], axis=-1)


# ---------------------------------------------------------------------------
# piano roll -> duration matrix
# ---------------------------------------------------------------------------


def pr_to_onehot_pr(pr: np.ndarray) -> np.ndarray:
    """(.., 32, 128) roll -> (.., 32, 128, 3) [onset, sustain, silence]
    planes (reference converter.py:78-84). Works batched."""
    onset = pr == 2
    sustain = pr == 1
    silence = pr == 0
    return np.stack([onset, sustain, silence], axis=-1).astype(np.int64)


def piano_roll_to_target(pr_onehot: np.ndarray) -> np.ndarray:
    """(.., 32, 128, 3) onset/sustain/silence planes -> duration matrix
    (.., 32, 128) where entry [t, p] = duration (in steps) of a note whose
    onset is at (t, p), else 0.

    Exact reference semantics (converter.py:87-113) via the recurrence
        c[t] = s[t] + (1 - onset[t+1]) * c[t+1],   c[31] = s[31]
        dur[t] = onset[t] * (c[t] + 1)
    where s = not(onset | silence) is the recomputed sustain plane
    (reference line 91). Vectorized over pitch and any leading batch dims;
    the only loop is the 32-step time sweep.
    """
    pr_onehot = np.asarray(pr_onehot)
    onset = pr_onehot[..., 0].astype(np.int64)
    silence = pr_onehot[..., 2].astype(np.int64)
    s = 1 - np.logical_or(onset, silence).astype(np.int64)
    T = onset.shape[-2]
    c = np.zeros_like(onset)
    c[..., T - 1, :] = s[..., T - 1, :]
    for t in range(T - 2, -1, -1):
        c[..., t, :] = s[..., t, :] + (1 - onset[..., t + 1, :]) * c[..., t + 1, :]
    return (onset * (c + 1)).astype(float)


# ---------------------------------------------------------------------------
# duration matrix -> PianoTree grid
# ---------------------------------------------------------------------------


def target_to_3dtarget(pr_mat: np.ndarray, max_note_count=11, max_pitch=107,
                       min_pitch=22, pitch_pad_ind=88, dur_pad_ind=2,
                       pitch_sos_ind=86, pitch_eos_ind=87) -> np.ndarray:
    """(32, 128) duration matrix -> (32, max_note_count, 6) PianoTree grid
    (reference converter.py:116-147): col 0 pitch index with sos/eos/pad
    specials, cols 1..5 the 5-bit binary of duration-1 (dur pad elsewhere).

    Deliberate fix vs the reference: time steps with more than
    ``max_note_count - 2`` simultaneous notes are truncated to the lowest
    pitches (the reference would write out of bounds, converter.py:146).
    """
    grid = batch_target_to_3dtarget(
        pr_mat[None], max_note_count, max_pitch, min_pitch, pitch_pad_ind,
        dur_pad_ind, pitch_sos_ind, pitch_eos_ind)
    return grid[0]


def batch_target_to_3dtarget(pr_mats: np.ndarray, max_note_count=16,
                             max_pitch=128, min_pitch=0, pitch_pad_ind=130,
                             dur_pad_ind=2, pitch_sos_ind=128,
                             pitch_eos_ind=129) -> np.ndarray:
    """Batched (N, 32, 128) -> (N, 32, max_note_count, 6) via flat scatters
    (no per-note Python loop). Defaults are the training-grid vocabulary used
    at reference dataset.py:98-105."""
    pr_mats = np.asarray(pr_mats)
    N, T, P = pr_mats.shape
    K = max_note_count
    mask = pr_mats != 0
    # 1-based note slot per (n, t): order of ascending pitch
    slot = np.cumsum(mask, axis=-1) * mask                        # (N, T, P)
    counts = mask.sum(axis=-1)                                    # (N, T)
    keep = mask & (slot <= K - 2)

    grid = np.full((N, T, K, 6), dur_pad_ind, dtype=np.int64)
    grid[..., 0] = pitch_pad_ind
    grid[:, :, 0, 0] = pitch_sos_ind

    n_idx, t_idx, p_idx = np.nonzero(keep)
    s_idx = slot[n_idx, t_idx, p_idx]
    grid[n_idx, t_idx, s_idx, 0] = p_idx - min_pitch
    # durations beyond 32 steps clip to the 5-bit maximum (only reachable in
    # the >2-bar stretch configs; canonical 32-step segments never exceed it)
    durs = np.clip(pr_mats[n_idx, t_idx, p_idx].astype(np.int64) - 1, 0, 31)
    shifts = np.arange(4, -1, -1)
    grid[n_idx, t_idx, s_idx, 1:6] = (durs[:, None] >> shifts[None, :]) & 1

    eos_slot = np.minimum(counts + 1, K - 1)
    nn, tt = np.meshgrid(np.arange(N), np.arange(T), indexing="ij")
    grid[nn, tt, eos_slot, 0] = pitch_eos_ind
    return grid


# ---------------------------------------------------------------------------
# chord expansion
# ---------------------------------------------------------------------------


def expand_chord(chord: np.ndarray, shift: int, relative: bool = False) -> np.ndarray:
    """Per-beat 14-d [root, chroma(12), bass] -> 36-d
    [root 1-hot | chroma | bass 1-hot] with transposition
    (reference converter.py:150-164)."""
    root = (chord[0] + shift) % 12
    chroma = np.roll(chord[1:13], shift)
    bass = (chord[13] + shift) % 12
    root_onehot = np.zeros(12)
    root_onehot[int(root)] = 1
    bass_onehot = np.zeros(12)
    bass_onehot[int(bass)] = 1
    return np.concatenate([root_onehot, chroma, bass_onehot])


def batch_expand_chord(chords: np.ndarray, shifts: np.ndarray) -> np.ndarray:
    """(N, 8, 14) raw chords + (N,) shifts -> (N, 8, 36)."""
    chords = np.asarray(chords)
    N, S, _ = chords.shape
    shifts = np.asarray(shifts).astype(np.int64)
    root = (chords[..., 0].astype(np.int64) + shifts[:, None]) % 12
    bass = (chords[..., 13].astype(np.int64) + shifts[:, None]) % 12
    # circular roll of chroma by per-sample shift: out[j] = in[(j - shift) % 12]
    j = np.arange(12)
    src = (j[None, None, :] - shifts[:, None, None]) % 12      # (N, 1, 12)
    chroma = np.take_along_axis(chords[..., 1:13],
                                np.broadcast_to(src, (N, S, 12)), axis=-1)
    eye = np.eye(12)
    return np.concatenate([eye[root], chroma, eye[bass]], axis=-1)
