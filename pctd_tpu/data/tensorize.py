"""On-device batch tensorization: the jitted data path.

TPU-first redesign of the reference's per-sample `__getitem__` tensorization
(reference dataset.py:67-120, re-run on the host for every epoch and every
transposition): the host stores each 2-bar segment exactly once as a compact
(32, 128) uint8 piano roll + (8, 14) raw chord row, and *everything else* —
pitch-shift augmentation, duration-matrix extraction, PianoTree grid
construction, chord expansion, detrended features — runs inside jit, batched,
on the accelerator, and is fused by XLA into the training step.

Grid construction avoids data-dependent scatters (which don't vectorize) by a
one-hot formulation: the k-th note slot of a time step selects pitches through
an einsum against a (128 -> slot) one-hot, which XLA lowers to batched
matmul-style reductions (MXU-friendly).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pctd_tpu.config import PianoTreeSpec
from pctd_tpu.data.detrend import detrend_pianotree_jnp, select_roll


def shift_pr(pr: jnp.ndarray, shift: jnp.ndarray, low: int = -6,
             high: int = 6) -> jnp.ndarray:
    """Per-sample circular pitch roll. pr (B, T, 128), shift (B,) int in
    [low, high]. Equivalent to np.roll(pr_b, shift_b, axis=-1) per sample
    (reference converter.py:65-68)."""
    return select_roll(pr, shift.astype(jnp.int32), low, high)


def shift_mel_pr(mel: jnp.ndarray, shift: jnp.ndarray, low: int = -6,
                 high: int = 6) -> jnp.ndarray:
    """Per-sample melody-roll transposition: roll cols 0..127, keep the
    sustain/rest control cols (reference converter.py:71-76)."""
    pitched = shift_pr(mel[..., :128], shift, low, high)
    return jnp.concatenate([pitched, mel[..., 128:]], axis=-1)


def pr_to_dur_matrix(pr: jnp.ndarray) -> jnp.ndarray:
    """(B, 32, 128) onset(2)/sustain(1)/rest(0) roll -> (B, 32, 128) duration
    matrix, exact reference recurrence (converter.py:87-113):

        c[t] = s[t] + (1 - onset[t+1]) * c[t+1],  s = not(onset | silence)
        dur[t] = onset[t] * (c[t] + 1)
    """
    onset = (pr == 2).astype(jnp.int32)
    silence = (pr == 0).astype(jnp.int32)
    s = 1 - jnp.logical_or(onset, silence).astype(jnp.int32)

    s_t = jnp.swapaxes(s, 0, 1)          # (T, B, 128)
    o_t = jnp.swapaxes(onset, 0, 1)

    def step(c_next, inp):
        s_row, o_row = inp
        c = s_row + (1 - o_row) * c_next
        return c, c

    # scan from the last step backwards; at t=T-1 c_next=0 gives c=s[T-1]
    # (matches the reference init) as long as onset/rest flags are binary.
    init = jnp.zeros_like(s_t[0])
    _, c = jax.lax.scan(step, init, (s_t, jnp.roll(o_t, -1, axis=0)
                                     .at[-1].set(jnp.zeros_like(o_t[0]))),
                        reverse=True)
    c = jnp.swapaxes(c, 0, 1)
    return (onset * (c + 1)).astype(jnp.float32)


def dur_matrix_to_grid(pr_mat: jnp.ndarray,
                       spec: PianoTreeSpec = PianoTreeSpec()) -> jnp.ndarray:
    """(B, 32, 128) duration matrix -> (B, 32, K, 6) PianoTree grid
    (semantics of reference converter.py:116-147 with the training vocabulary
    of dataset.py:98-105; overflow steps truncate to the lowest pitches).

    One-hot/einsum formulation: slot assignment = cumulative count of active
    pitches; slot selection is a reduction over the pitch axis.
    """
    B, T, P = pr_mat.shape
    K = spec.max_simu_note
    n_slots = K - 2                                        # note slots 1..K-2
    mask = pr_mat != 0
    slot = jnp.cumsum(mask, axis=-1) * mask                # (B,T,P) 1-based
    counts = mask.sum(axis=-1)                             # (B,T)

    k_ids = jnp.arange(1, n_slots + 1, dtype=slot.dtype)
    onehot = (slot[..., None] == k_ids) & mask[..., None]  # (B,T,P,n_slots)
    oh = onehot.astype(jnp.float32)

    pitch_vals = jnp.einsum("btpk,p->btk", oh,
                            jnp.arange(P, dtype=jnp.float32))
    dur_vals = jnp.einsum("btpk,btp->btk", oh, pr_mat - 1.0)
    has = oh.sum(axis=-2)                                  # (B,T,n_slots)

    pitch_mid = jnp.where(has > 0,
                          pitch_vals.astype(jnp.int32) - spec.min_pitch,
                          spec.pitch_pad)
    dur_int = jnp.clip(dur_vals.astype(jnp.int32), 0, 31)
    shifts = jnp.arange(4, -1, -1, dtype=jnp.int32)
    bits = (dur_int[..., None] >> shifts) & 1              # (B,T,n_slots,5)
    dur_mid = jnp.where(has[..., None] > 0, bits, spec.dur_pad)

    # assemble all K slots: [sos | notes (n_slots) | tail]
    pitch_col = jnp.concatenate([
        jnp.full((B, T, 1), spec.pitch_sos, jnp.int32),
        pitch_mid,
        jnp.full((B, T, 1), spec.pitch_pad, jnp.int32),
    ], axis=-1)
    dur_col = jnp.concatenate([
        jnp.full((B, T, 1, 5), spec.dur_pad, jnp.int32),
        dur_mid,
        jnp.full((B, T, 1, 5), spec.dur_pad, jnp.int32),
    ], axis=-2)

    eos_slot = jnp.minimum(counts + 1, K - 1)              # (B,T)
    slot_ids = jnp.arange(K)
    pitch_col = jnp.where(slot_ids[None, None, :] == eos_slot[..., None],
                          spec.pitch_eos, pitch_col)
    return jnp.concatenate([pitch_col[..., None], dur_col], axis=-1)


def expand_chord_batch(chord_raw: jnp.ndarray,
                       shift: jnp.ndarray) -> jnp.ndarray:
    """(B, 8, 14) raw [root, chroma(12), bass] + (B,) shift -> (B, 8, 36)
    expanded chord (reference converter.py:150-164)."""
    sh = shift.astype(jnp.int32)
    root = (chord_raw[..., 0].astype(jnp.int32) + sh[:, None]) % 12
    bass = (chord_raw[..., 13].astype(jnp.int32) + sh[:, None]) % 12
    chroma = select_roll(chord_raw[..., 1:13], sh % 12, 0, 11)
    r1 = jax.nn.one_hot(root, 12, dtype=jnp.float32)
    b1 = jax.nn.one_hot(bass, 12, dtype=jnp.float32)
    return jnp.concatenate([r1, chroma.astype(jnp.float32), b1], axis=-1)


@partial(jax.jit, static_argnames=("spec", "with_detrend", "with_mel"))
def tensorize_batch(pr: jnp.ndarray, chord_raw: jnp.ndarray,
                    shift: jnp.ndarray,
                    mel: Optional[jnp.ndarray] = None,
                    spec: PianoTreeSpec = PianoTreeSpec(),
                    with_detrend: bool = True,
                    with_mel: bool = False) -> Dict[str, jnp.ndarray]:
    """Full on-device tensorization of a training batch.

    Inputs (host-prepared once per corpus, un-augmented):
        pr        (B, 32, 128) uint8 onset/sustain/rest roll
        chord_raw (B, 8, 14)   raw chord rows
        shift     (B,)         per-sample transposition in semitones
        mel       (B, 32, 130) optional melody roll

    Returns dict with: pr_mat (B,32,128) f32, x (B,32,K,6) i32 grid,
    c (B,8,36) f32, and optionally dt_x (B,32,16,39) f32, mel f32.
    """
    pr_s = shift_pr(pr.astype(jnp.int32), shift)
    pr_mat = pr_to_dur_matrix(pr_s)
    x = dur_matrix_to_grid(pr_mat, spec)
    c = expand_chord_batch(chord_raw, shift)
    out = {"pr_mat": pr_mat, "x": x, "c": c}
    if with_detrend:
        out["dt_x"] = detrend_pianotree_jnp(x, c)
    if with_mel and mel is not None:
        out["mel"] = shift_mel_pr(mel.astype(jnp.float32), shift)
    return out
