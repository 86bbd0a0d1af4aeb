"""Pallas TPU kernel: the ENTIRE autoregressive PianoTree decode in VMEM.

The frame kernel (ops/pallas/ar_decoder.py) fuses one frame's note+duration
levels; the XLA time-level scan around it still pays per-step loop machinery
and re-streams every weight from HBM 32 times. This kernel runs the WHOLE
inference decode — 32 time steps x (time-GRU + 15 note slots x (note-GRU +
pitch head + 5-step dur chain + embedding) + masked bi-GRU summary feedback)
— as ONE kernel: every weight is DMA'd to VMEM once, all dependent matmuls
execute back-to-back on-chip, and the only HBM traffic is z-derived inputs
in and the (T, B, K-1) grids out.

Serial-chain design (the decode is dependency-latency bound: ~12.7k tiny
dependent dots at ~8 us each dominated the 104 ms round-1 time, not FLOPs):

- the 5-wide duration-token projections are GONE: the sos projection is one
  dot hoisted to kernel start, and the post-sos token is one-hot over {0,1},
  so its projection IS row 0 or 1 of (w_dih + b_dih) — a select, bit-exact
  vs the matmul (one-hot x w sums exact zeros).
- each dur step is ONE combined dot yielding (logit_w, gh_{w+1}) — see
  ar_decoder.dur_comb_weights.
- the per-slot chain carries the serving weight folds of
  pianotree_decoder.fold_inference_heads (identical in every backend so the
  backends stay mutually bit-exact): the dur-hid init is ONE dot from h
  with the pitch head pre-multiplied (the pitch dot overlaps the dur
  chain), and the token feedback is one dot off the raw one-hot with the
  embedding pre-multiplied (the embeddings for the summary run once per
  frame in ONE batched (K*B)-row dot).
- the summary bi-GRU's 2 x 16 per-slot input projections collapse into one
  (K*B, E) @ (E, 3EH) dot per direction per frame (the serial part keeps
  only the 2 x 16 hidden-side dots).

Semantics identical to pianotree_decoder.decode(p, cfg, z,
fold_heads=True) inference mode (reference ptvae.py:430-491 with argmax
feedback): verified vs the XLA path in interpret mode and on device
(tests/test_pallas_decoder.py).

VMEM budget (canonical dims, f32): ~27 MB of weights + ~2 MB activations at
B=128 — comfortable on a v5e core (~128 MB). The time loop is a
lax.fori_loop inside the kernel (compile-friendly); the frame body is fully
unrolled straight-line code.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pctd_tpu.config import ModelConfig, PianoTreeSpec
from pctd_tpu.ops.pallas.ar_decoder import (_DUR_PAD, _gru, _gru_pre,
                                            _row_select,
                                            folded_frame_weights)
from pctd_tpu.utils.init import dense_apply


def _full_kernel(spec: PianoTreeSpec, T: int,
                 h0_ref, gi_z_ref, token0_ref, sos_emb_ref, sos_raw_ref,
                 wt_tok_ref, wt_hh_ref, bt_hh_ref,
                 w_t2n_ref, b_t2n_ref,
                 w_ih_frame_ref, b_ih_ref,
                 w_hh_ref, b_hh_ref,
                 w_pitch_ref, b_pitch_ref,
                 w_dhid_eff_ref, b_dhid_eff_ref,
                 w_raw_gi_ref, b_raw_gi_ref,
                 w_dih_ref, b_dih_ref, w_dcomb_ref, b_dcomb_ref,
                 w_emb_ref, b_emb_ref, dur_sos_ref,
                 we_ih_ref, we_hh_ref, be_ih_ref, be_hh_ref,
                 pitch_idx_ref, dur_bits_ref):
    K = spec.max_simu_note
    W = spec.dur_width
    P = spec.pitch_range
    B = h0_ref.shape[0]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    gi_z = gi_z_ref[:]
    sos_emb = sos_emb_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)

    # duration-chain input projections, hoisted: the sos token is constant
    # (one dot for the whole kernel), and after it the token is a {0,1}
    # one-hot, so its projection is row 0/1 of w_dih (+ bias) — selects, not
    # dots, and bit-exact vs the one-hot matmul (zero products are exact)
    gi_d_sos = dot(jnp.broadcast_to(dur_sos_ref[:], (B, W)),
                   w_dih_ref[:]) + b_dih_ref[:]
    gi_d_row0 = w_dih_ref[0:1, :] + b_dih_ref[:]          # (1, 3DH)
    gi_d_row1 = w_dih_ref[1:2, :] + b_dih_ref[:]

    # slot-1 token projection: the sos raw feature through the folded
    # raw -> gi weights; constant across frames, hoisted out of the loop
    gi_tok_sos = dot(sos_raw_ref[:], w_raw_gi_ref[:])      # (1, 3NH)

    def frame(t, h_time):
        """One frame's note+dur decode; writes outputs at time t, returns
        the masked bi-GRU summary of the predicted notes."""
        hid = dot(h_time, w_t2n_ref[:]) + b_t2n_ref[:]
        gi_frame = (dot(h_time, w_ih_frame_ref[:]) + b_ih_ref[:]
                    + b_raw_gi_ref[:])
        lengths = jnp.zeros((B, 1), jnp.int32)
        gi_tok = jnp.broadcast_to(gi_tok_sos, (B, gi_frame.shape[-1]))

        h = hid
        gh = dot(hid, w_hh_ref[:]) + b_hh_ref[:]
        raws = []
        for k in range(1, K):
            h = _gru_pre(gi_frame + gi_tok, gh, h)
            # next slot's hidden projection issues HERE — it depends only
            # on h, so it overlaps the dur chain instead of sitting between
            # token_k and the slot-(k+1) gates on the serial path
            gh = dot(h, w_hh_ref[:]) + b_hh_ref[:]
            # pitch head: off the chain (folded out of the dur-hid init)
            est_pitch = dot(h, w_pitch_ref[:]) + b_pitch_ref[:]
            pitch_ind = jnp.argmax(est_pitch, axis=-1).astype(jnp.int32)

            # dur-hid init in ONE dot from h (pitch head pre-multiplied)
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
                # mask-free row select: the (B, 1) -> (B, 3DH) i1 broadcast
                # a plain jnp.where needs fails Mosaic relayout at B >= 256
                gi_d = _row_select(logit, gi_d_row1, gi_d_row0)
            dur_bits = jnp.stack(bits, axis=-1)

            pitch_oh = (col == pitch_ind[:, None]).astype(h.dtype)
            raw = jnp.concatenate(
                [pitch_oh, dur_bits.astype(h.dtype)], axis=-1)
            # next token's gi in ONE dot (embedding folded out of the chain)
            gi_tok = dot(raw, w_raw_gi_ref[:])

            # outputs are laid out rows-first — (T*(K-1), B) and
            # (T*(K-1)*W, B) — so the (8, 128)-tiled trailing dims stay
            # dense; a (T, B, K-1, W) layout pads W->128 and overflows
            # scoped VMEM (measured: 17.7M > 16M limit)
            slot = t * (K - 1) + (k - 1)
            pitch_idx_ref[pl.ds(slot, 1), :] = pitch_ind[None]
            dur_bits_ref[pl.ds(slot * W, W), :] = dur_bits.T
            raws.append(raw)
            is_eos = (pitch_ind[:, None] == spec.pitch_eos) & (lengths == 0)
            lengths = jnp.where(is_eos, k, lengths)

        lengths = jnp.where(lengths == 0, K - 1, lengths)
        EH = we_hh_ref.shape[1]
        # predicted-note embeddings for the summary: ONE batched dot for
        # all K-1 slots (off the slot chain; slot 0's token is sos_emb).
        # [sos rows | emb rows] IS the (K, B, E) slot-major layout, so the
        # summary's flat input is one concatenate — no per-slot restacking.
        raw_flat = jnp.stack(raws).reshape((K - 1) * B, raws[0].shape[-1])
        emb_flat = dot(raw_flat, w_emb_ref[:]) + b_emb_ref[:]
        # input projections of ALL slots in one dot per direction; the
        # serial chain keeps only the hidden-side dots
        flat = jnp.concatenate(
            [sos_emb.astype(emb_flat.dtype), emb_flat], axis=0)
        gif_all = (dot(flat, we_ih_ref[0]) + be_ih_ref[0:1, :]).reshape(
            K, B, 3 * EH)
        gib_all = (dot(flat, we_ih_ref[1]) + be_ih_ref[1:2, :]).reshape(
            K, B, 3 * EH)
        hf = jnp.zeros((B, EH), h_time.dtype)
        hb = jnp.zeros((B, EH), h_time.dtype)
        for k in range(K):
            mf = (k < lengths).astype(h_time.dtype)
            hf_new = _gru(gif_all[k], hf, we_hh_ref[0], be_hh_ref[0:1, :])
            hf = mf * hf_new + (1.0 - mf) * hf
            kb = K - 1 - k
            mb = (kb < lengths).astype(h_time.dtype)
            hb_new = _gru(gib_all[kb], hb, we_hh_ref[1], be_hh_ref[1:2, :])
            hb = mb * hb_new + (1.0 - mb) * hb
        return jnp.concatenate([hf, hb], axis=-1)

    def body(t, carry):
        h_time, gh_time, token = carry
        gi = gi_z + dot(token, wt_tok_ref[:])
        h_time = _gru_pre(gi, gh_time, h_time)
        # next frame's time-GRU hidden projection: depends only on h_time,
        # so it overlaps the whole frame decode below
        gh_time = dot(h_time, wt_hh_ref[:]) + bt_hh_ref[:]
        summary = frame(t, h_time)
        return h_time, gh_time, summary.astype(token.dtype)

    h0 = h0_ref[:]
    gh0 = dot(h0, wt_hh_ref[:]) + bt_hh_ref[:]
    jax.lax.fori_loop(0, T, body, (h0, gh0, token0_ref[:]))


def decode_grid_fused(p: dict, cfg: ModelConfig, z: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Whole-decode fused kernel: z (B, z_dim) -> estimated grid
    (B, T, K-1, 6), same contract as pianotree_decoder.decode_grid."""
    spec = cfg.pianotree
    B = z.shape[0]
    T = spec.num_step
    K, W = spec.max_simu_note, spec.dur_width

    from pctd_tpu.models.pianotree_decoder import sos_token_raw

    h0 = dense_apply(p["z2hid"], z)
    z_in = dense_apply(p["z2in"], z)
    sos_emb = dense_apply(p["note_emb"],
                          sos_token_raw(spec).astype(p["note_emb"]["w"].dtype))
    sos_emb = jnp.broadcast_to(sos_emb, (B, sos_emb.shape[-1]))
    sos_raw = sos_token_raw(spec).astype(h0.dtype).reshape(1, -1)
    token0 = jnp.broadcast_to(p["init_input"], (B, p["init_input"].shape[-1]))
    tok_dim = token0.shape[-1]
    tg = p["time_gru"]
    gi_z = z_in @ tg.w_ih[tok_dim:] + tg.b_ih
    row = lambda b: b.reshape(1, -1)

    args = (
        h0, gi_z, token0, sos_emb, sos_raw,
        tg.w_ih[:tok_dim], tg.w_hh, row(tg.b_hh),
    ) + folded_frame_weights(p, cfg)

    kernel = functools.partial(_full_kernel, spec, T)
    out_shapes = (
        jax.ShapeDtypeStruct((T * (K - 1), B), jnp.int32),
        jax.ShapeDtypeStruct((T * (K - 1) * W, B), jnp.int32),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    pitch_rows, dur_rows = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem] * len(args),
        out_specs=(vmem, vmem),
        # ~27 MB of resident weights + activations exceed the default 16 MB
        # scoped-VMEM budget; a v5e core has ~128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    pitch_idx = pitch_rows.reshape(T, K - 1, B).transpose(2, 0, 1)
    dur_bits = dur_rows.reshape(T, K - 1, W, B).transpose(3, 0, 1, 2)
    return jnp.concatenate([pitch_idx[..., None], dur_bits], axis=-1)
