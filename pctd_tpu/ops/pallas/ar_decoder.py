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
  (time_hidden x 3H) is applied ONCE per frame; the token part per slot.
- biases are shipped as (1, X) rows (TPU scalars want 2D).
- the duration chain's input projections are hoisted out of the serial
  chain entirely (sos: one dot; post-sos: row selects of w_dih + b).
- the per-slot dependence chain carries the serving weight FOLDS of
  pianotree_decoder.fold_inference_heads (identical in every backend, so
  the backends stay mutually bit-exact):
  * ``h -> dur-hid`` is ONE dot with the pitch head pre-multiplied in
    (w_dhid_eff) — the pitch-head dot overlaps the duration chain (its
    argmax is not needed until the token select at chain end);
  * the token feedback is ``raw one-hot @ (w_emb @ w_tok)`` (w_raw_gi) —
    the embedding dot leaves the chain; the embeddings for the summary
    bi-GRU are computed once per frame in ONE batched (K*B)-row dot.
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
                  h_time_ref, sos_emb_ref, sos_raw_ref,
                  w_t2n_ref, b_t2n_ref,
                  w_ih_frame_ref, b_ih_ref,
                  w_hh_ref, b_hh_ref,
                  w_pitch_ref, b_pitch_ref,
                  w_dhid_eff_ref, b_dhid_eff_ref,
                  w_raw_gi_ref, b_raw_gi_ref,
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
    # b_raw_gi (the token embedding's bias share of the notes-GRU input
    # projection) folds into the per-frame gi
    gi_frame = (dot(h_time, w_ih_frame_ref[:]) + b_ih_ref[:]
                + b_raw_gi_ref[:])                           # (B, 3NH)
    lengths = jnp.zeros((B, 1), jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)

    # dur-chain input projections hoisted: sos once; post-sos tokens are
    # {0,1} one-hots, so their projections are row selects (bit-exact vs the
    # one-hot matmul) — see train_frame._run_forward
    gi_d_sos = dot(jnp.broadcast_to(dur_sos_ref[:], (B, W)),
                   w_dih_ref[:]) + b_dih_ref[:]
    gi_d_row0 = w_dih_ref[0:1, :] + b_dih_ref[:]
    gi_d_row1 = w_dih_ref[1:2, :] + b_dih_ref[:]

    # slot-1 token projection: the sos raw feature through the folded
    # raw -> gi weights (same dot as the XLA path's gi_tok0)
    gi_tok = jnp.broadcast_to(dot(sos_raw_ref[:], w_raw_gi_ref[:]),
                              (B, gi_frame.shape[-1]))

    h = hid
    gh = dot(hid, w_hh_ref[:]) + b_hh_ref[:]
    raws = []                                                # (B, P + W) each
    for k in range(1, K):
        h = _gru_pre(gi_frame + gi_tok, gh, h)
        # next slot's hidden projection issues HERE — it depends only on h,
        # so it overlaps the whole dur chain instead of sitting on the
        # serial path between token_{k} and the slot-(k+1) gates
        gh = dot(h, w_hh_ref[:]) + b_hh_ref[:]
        # pitch head: OFF the dependence chain (folded out of the dur-hid
        # init); its argmax is consumed at chain end for the token select
        est_pitch = dot(h, w_pitch_ref[:]) + b_pitch_ref[:]  # (B, P)
        pitch_ind = jnp.argmax(est_pitch, axis=-1).astype(jnp.int32)

        # 5-step binary duration chain; dur-hid init is ONE dot from h
        # (pitch head pre-multiplied); each step is ONE combined dot
        # yielding (logit_w, gh_{w+1}) — see dur_comb_weights
        h_d = dot(h, w_dhid_eff_ref[:]) + b_dhid_eff_ref[:]
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
        raw = jnp.concatenate([pitch_oh, dur_bits.astype(h.dtype)], axis=-1)
        # next token's gi in ONE dot off the raw one-hot (embedding folded)
        gi_tok = dot(raw, w_raw_gi_ref[:])

        pitch_idx_ref[:, k - 1] = pitch_ind
        dur_bits_ref[:, k - 1, :] = dur_bits
        raws.append(raw)
        is_eos = (pitch_ind[:, None] == spec.pitch_eos) & (lengths == 0)
        lengths = jnp.where(is_eos, k, lengths)

    lengths = jnp.where(lengths == 0, K - 1, lengths)
    len_ref[:] = lengths

    # predicted-note embeddings for the summary, ONE batched dot for all
    # K-1 slots (they are OFF the slot chain; slot 0's token is sos_emb).
    # [sos rows | emb rows] IS the (K, B, E) slot-major layout, so the
    # summary's flat input is one concatenate — no per-slot restacking.
    raw_flat = jnp.stack(raws).reshape((K - 1) * B, raws[0].shape[-1])
    emb_flat = dot(raw_flat, w_emb_ref[:]) + b_emb_ref[:]

    # masked bidirectional GRU summary of the predicted notes, fully in VMEM
    # (pack_padded semantics: fwd final = h after slot len-1; bwd final =
    # h after scanning slots len-1 .. 0); all input projections in one dot
    # per direction
    EH = we_hh_ref.shape[1]                                  # emb hidden
    flat = jnp.concatenate(
        [sos_emb_ref[:].astype(emb_flat.dtype), emb_flat], axis=0)
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


def folded_frame_weights(p: dict, cfg: ModelConfig):
    """Shared weight preparation for the folded inference kernels: the
    train-kernel layout (train_frame.core_weights) with the dur-chain pair
    combined (dur_comb_weights) and the serial-path folds of
    pianotree_decoder.fold_inference_heads applied. Returns the arg tuple
    tail shared by ar_decoder and full_decoder (everything after the
    per-call activations)."""
    from pctd_tpu.models.pianotree_decoder import fold_inference_heads
    from pctd_tpu.ops.pallas.train_frame import core_weights

    cw = core_weights(p, cfg)
    folds = fold_inference_heads(p, cfg)
    w_dcomb, b_dcomb = dur_comb_weights(*cw[13:17])
    row = lambda b: b.reshape(1, -1)
    # cw: 0 w_t2n, 1 b_t2n, 2 w_ih_frame, 3 w_ih_tok, 4 b_ih, 5 w_hh,
    # 6 b_hh, 7 w_pitch, 8 b_pitch, 9 w_dhid, 10 b_dhid, 11 w_dih,
    # 12 b_dih, 13..16 dur pair, 17.. w_emb, b_emb, dur_sos, we_*
    return (cw[0], cw[1], cw[2], cw[4], cw[5], cw[6], cw[7], cw[8],
            folds["w_dhid_eff"], row(folds["b_dhid_eff"]),
            folds["w_raw_gi"], row(folds["b_raw_gi"]),
            cw[11], cw[12], w_dcomb, b_dcomb) + cw[17:]


def frame_decode_pallas(p: dict, cfg: ModelConfig, h_time: jnp.ndarray,
                        sos_emb: jnp.ndarray, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                   jnp.ndarray]:
    """Decode one frame's notes + their bi-GRU summary with the fused kernel.

    p: pianotree_decoder params; h_time (B, time_hidden); sos_emb (B, emb).
    Returns (pitch_idx (B, K-1) i32, dur_bits (B, K-1, W) i32,
             summary (B, 2*emb_hidden), lengths (B,) i32).
    """
    from pctd_tpu.models.pianotree_decoder import sos_token_raw

    spec = cfg.pianotree
    B = h_time.shape[0]
    K, W = spec.max_simu_note, spec.dur_width

    sos_raw = sos_token_raw(spec).astype(h_time.dtype).reshape(1, -1)
    args = (h_time, sos_emb, sos_raw) + folded_frame_weights(p, cfg)

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
        # resident weights (+ folded raw->gi projection and the per-frame
        # raw stash for the batched embedding dot) exceed the default 16M
        # scoped-VMEM budget; a v5e core has ~128M
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return pitch_idx, dur_bits, summary, lengths[:, 0]
