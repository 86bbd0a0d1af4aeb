"""Pallas TPU kernel: fused autoregressive frame decode (note + duration
levels of the PianoTree decoder, inference mode).

One sampled frame = 15 sequential note slots x (GRU cell + pitch head +
5-step binary-duration GRU + argmax feedback + embedding) — ~100 tiny
dependent ops that XLA executes as nested while loops with HBM round-trips
between them (reference semantics: ptvae.py:370-428 inference path). This
kernel runs the whole frame in VMEM: every weight is loaded once, all
intermediates stay on-chip, and the only HBM traffic is the (B, ...) inputs
and outputs.

Used by the serving/sampling path (pianotree_decoder.decode with
``frame_decoder='pallas'``); training keeps the XLA scan (the kernel is
forward-only).

Weight layout notes
-------------------
- the notes-GRU input projection is pre-split: the frame part
  (time_hidden x 3H) is applied ONCE per frame; the token part
  (emb x 3H) per slot.
- biases are shipped as (1, X) rows (TPU scalars want 2D).
- the predicted-note embedding is ONE [one_hot(pitch), dur_bits] @ W_emb
  concatenated matmul (a 135-wide MXU dot instead of a row gather — and the
  same f32 grouping as the XLA path).
- the duration chain's input projections are hoisted out of the serial
  chain entirely (sos: one dot; post-sos: row selects of w_dih + b).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pctd_tpu.config import ModelConfig, PianoTreeSpec


def _gru(gi, h, w_hh, b_hh):
    # shared cell with the training kernel (gate math lives in one place)
    from pctd_tpu.ops.pallas.train_frame import _gru_fwd

    return _gru_fwd(gi, h, w_hh, b_hh)[0]


def _gru_pre(gi, gh, h):
    # gate math from a precomputed hidden projection (chain-hoisted gh)
    from pctd_tpu.ops.pallas.train_frame import _gru_gates

    return _gru_gates(gi, gh, h)[0]


def _row_select(logit, row1, row0):
    from pctd_tpu.ops.pallas.train_frame import _row_select as sel

    return sel(logit, row1, row0)


# Combined dur-chain weight layout — canonical helper lives in train_frame
# (_dur_comb): [w_dout (2) | zero pad | w_dhh (3*DH)], the w_dhh block
# tile-aligned, so one dot per dur step yields (logit, next gh) bit-exactly.
from pctd_tpu.ops.pallas.train_frame import (_DUR_PAD,
                                             _dur_comb as dur_comb_weights)


def _frame_kernel(spec: PianoTreeSpec,
                  h_time_ref, sos_emb_ref,
                  w_t2n_ref, b_t2n_ref,
                  w_ih_frame_ref, w_ih_tok_ref, b_ih_ref,
                  w_hh_ref, b_hh_ref,
                  w_pitch_ref, b_pitch_ref,
                  w_dhid_ref, b_dhid_ref,
                  w_dih_ref, b_dih_ref, w_dcomb_ref, b_dcomb_ref,
                  w_emb_ref, b_emb_ref, dur_sos_ref,
                  we_ih_ref, we_hh_ref, be_ih_ref, be_hh_ref,
                  pitch_idx_ref, dur_bits_ref, summary_ref, len_ref):
    K = spec.max_simu_note
    W = spec.dur_width
    P = spec.pitch_range
    B = h_time_ref.shape[0]

    h_time = h_time_ref[:]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    hid = dot(h_time, w_t2n_ref[:]) + b_t2n_ref[:]          # (B, NH)
    gi_frame = dot(h_time, w_ih_frame_ref[:]) + b_ih_ref[:]  # (B, 3NH)
    token = sos_emb_ref[:]                                   # (B, EMB)
    lengths = jnp.zeros((B, 1), jnp.int32)
    pred_notes = [token]                                     # VMEM values

    col = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)

    # dur-chain input projections hoisted: sos once; post-sos tokens are
    # {0,1} one-hots, so their projections are row selects (bit-exact vs the
    # one-hot matmul) — see train_frame._run_forward
    gi_d_sos = dot(jnp.broadcast_to(dur_sos_ref[:], (B, W)),
                   w_dih_ref[:]) + b_dih_ref[:]
    gi_d_row0 = w_dih_ref[0:1, :] + b_dih_ref[:]
    gi_d_row1 = w_dih_ref[1:2, :] + b_dih_ref[:]

    h = hid
    gh = dot(hid, w_hh_ref[:]) + b_hh_ref[:]
    for k in range(1, K):
        gi = gi_frame + dot(token, w_ih_tok_ref[:])
        h = _gru_pre(gi, gh, h)
        # next slot's hidden projection issues HERE — it depends only on h,
        # so it overlaps the whole dur chain instead of sitting on the
        # serial path between token_{k} and the slot-(k+1) gates
        gh = dot(h, w_hh_ref[:]) + b_hh_ref[:]
        est_pitch = dot(h, w_pitch_ref[:]) + b_pitch_ref[:]  # (B, P)
        pitch_ind = jnp.argmax(est_pitch, axis=-1).astype(jnp.int32)

        # 5-step binary duration chain ([h, est_pitch] @ w_dhid in ONE dot —
        # the XLA path's grouping, pianotree_decoder.py:132); each step is
        # ONE combined dot yielding (logit_w, gh_{w+1}) — see
        # dur_comb_weights
        h_d = dot(jnp.concatenate([h, est_pitch], axis=-1),
                  w_dhid_ref[:]) + b_dhid_ref[:]
        X = dot(h_d, w_dcomb_ref[:]) + b_dcomb_ref[:]
        gi_d = gi_d_sos
        bits = []
        for _ in range(W):
            h_d = _gru_pre(gi_d, X[:, _DUR_PAD:], h_d)
            X = dot(h_d, w_dcomb_ref[:]) + b_dcomb_ref[:]
            logit = X[:, 0:2]
            bit = (logit[:, 1] > logit[:, 0])
            bits.append(bit.astype(jnp.int32))
            # mask-free row select: the (B, 1) -> (B, 3DH) i1 broadcast a
            # plain jnp.where needs fails Mosaic relayout at B >= 256
            gi_d = _row_select(logit, gi_d_row1, gi_d_row0)
        dur_bits = jnp.stack(bits, axis=-1)                  # (B, W)

        pitch_oh = (col == pitch_ind[:, None]).astype(h.dtype)
        emb = dot(jnp.concatenate([pitch_oh, dur_bits.astype(h.dtype)],
                                  axis=-1), w_emb_ref[:]) + b_emb_ref[:]

        pitch_idx_ref[:, k - 1] = pitch_ind
        dur_bits_ref[:, k - 1, :] = dur_bits
        pred_notes.append(emb)
        is_eos = (pitch_ind[:, None] == spec.pitch_eos) & (lengths == 0)
        lengths = jnp.where(is_eos, k, lengths)
        token = emb

    lengths = jnp.where(lengths == 0, K - 1, lengths)
    len_ref[:] = lengths

    # masked bidirectional GRU summary of the predicted notes, fully in VMEM
    # (pack_padded semantics: fwd final = h after slot len-1; bwd final =
    # h after scanning slots len-1 .. 0); all input projections in one dot
    # per direction
    EH = we_hh_ref.shape[1]                                  # emb hidden
    flat = jnp.stack(pred_notes).reshape(K * B, pred_notes[0].shape[-1])
    gif_all = (dot(flat, we_ih_ref[0]) + be_ih_ref[0:1, :]).reshape(
        K, B, 3 * EH)
    gib_all = (dot(flat, we_ih_ref[1]) + be_ih_ref[1:2, :]).reshape(
        K, B, 3 * EH)
    hf = jnp.zeros((B, EH), h_time.dtype)
    hb = jnp.zeros((B, EH), h_time.dtype)
    for k in range(K):
        mf = (k < lengths).astype(h_time.dtype)              # (B, 1)
        hf_new = _gru(gif_all[k], hf, we_hh_ref[0], be_hh_ref[0:1, :])
        hf = mf * hf_new + (1.0 - mf) * hf
        kb = K - 1 - k
        mb = (kb < lengths).astype(h_time.dtype)
        hb_new = _gru(gib_all[kb], hb, we_hh_ref[1], be_hh_ref[1:2, :])
        hb = mb * hb_new + (1.0 - mb) * hb
    summary_ref[:, :EH] = hf.astype(summary_ref.dtype)
    summary_ref[:, EH:] = hb.astype(summary_ref.dtype)


def frame_decode_pallas(p: dict, cfg: ModelConfig, h_time: jnp.ndarray,
                        sos_emb: jnp.ndarray, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                   jnp.ndarray]:
    """Decode one frame's notes + their bi-GRU summary with the fused kernel.

    p: pianotree_decoder params; h_time (B, time_hidden); sos_emb (B, emb).
    Returns (pitch_idx (B, K-1) i32, dur_bits (B, K-1, W) i32,
             summary (B, 2*emb_hidden), lengths (B,) i32).
    """
    spec = cfg.pianotree
    B = h_time.shape[0]
    K, W = spec.max_simu_note, spec.dur_width

    # one weight-layout preparation shared with the training kernel
    # (train_frame.core_weights), with the dur-chain (w_dhh, w_dout) pair
    # swapped for their combined layout (dur_comb_weights)
    from pctd_tpu.ops.pallas.train_frame import core_weights

    cw = core_weights(p, cfg)
    w_dcomb, b_dcomb = dur_comb_weights(*cw[13:17])
    args = (h_time, sos_emb) + cw[:13] + (w_dcomb, b_dcomb) + cw[17:]

    kernel = functools.partial(_frame_kernel, spec)
    out_shapes = (
        jax.ShapeDtypeStruct((B, K - 1), jnp.int32),
        jax.ShapeDtypeStruct((B, K - 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, 2 * cfg.dec_emb_hidden), h_time.dtype),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    pitch_idx, dur_bits, summary, lengths = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem] * len(args),
        out_specs=(vmem, vmem, vmem, vmem),
        interpret=interpret,
    )(*args)
    return pitch_idx, dur_bits, summary, lengths[:, 0]
