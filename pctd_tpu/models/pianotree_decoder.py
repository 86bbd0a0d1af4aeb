"""PianoTree hierarchical autoregressive decoder (time -> note -> duration).

Capability of the reference PtvaeDecoder (ptvae.py:218-575): a 3-level
decoder over a (32 steps x <=16 note slots x 5 dur bits) grid, with

- time level: uni-GRU (hid 1024), input = [previous-frame summary (256),
  z_in (256)], init hidden = Linear(z) (ptvae.py:430-491),
- note level: uni-GRU (hid 512) over note slots, input = [frame hidden (1024),
  previous note embedding (128)] (ptvae.py:370-428),
- duration level: pitch head Linear(512 -> 130) + 5-step binary-digit GRU
  (hid 64) with argmax feedback (ptvae.py:336-368),
- frame-summary feedback: masked bi-GRU over the (teacher or predicted) note
  embeddings (ptvae.py:446-453, 480-486).

TPU-native structure: the reference's 32x15x5 nested Python loop of GRU-cell
calls becomes nested ``lax.scan``s whose static per-sequence input projections
are hoisted into single batched matmuls; ``pack_padded_sequence`` becomes
masked scans; the per-step ``random.random()`` teacher-forcing coins become
precomputed Bernoulli vectors, preserving the reference's *batch-global* coin
semantics (SURVEY.md §7). Variable-length bookkeeping (eos tracking,
ptvae.py:415-416,425) is carried as integer state inside the scan.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pctd_tpu.config import ModelConfig, PianoTreeSpec
from pctd_tpu.ops import (gru_init, gru_cell_pre, gru_gates_pre,
                          bigru_last_masked)
from pctd_tpu.ops.losses import cross_entropy_ignore
from pctd_tpu.utils.init import dense_params, dense_apply, free_param


class DecoderOutput(NamedTuple):
    pitch_logits: jnp.ndarray   # (B, T, K-1, pitch_range)
    dur_logits: jnp.ndarray     # (B, T, K-1, dur_width, 2)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init(key: jax.Array, cfg: ModelConfig,
         note_emb: Optional[dict] = None) -> dict:
    """Parameters. ``note_emb`` may be shared with an encoder
    (reference ptvae.py:264-267 allows passing the embedding in)."""
    spec = cfg.pianotree
    ks = jax.random.split(key, 13)
    p = {
        "note_emb": note_emb if note_emb is not None else
            dense_params(ks[0], spec.note_size, cfg.note_emb_size),
        "z2hid": dense_params(ks[1], cfg.z_dim, cfg.dec_time_hidden),
        "z2in": dense_params(ks[2], cfg.z_dim, cfg.dec_z_in),
        "emb_fwd": gru_init(ks[3], cfg.note_emb_size, cfg.dec_emb_hidden),
        "emb_bwd": gru_init(ks[4], cfg.note_emb_size, cfg.dec_emb_hidden),
        "time_gru": gru_init(ks[5], cfg.dec_z_in + 2 * cfg.dec_emb_hidden,
                             cfg.dec_time_hidden),
        "time2notes": dense_params(ks[6], cfg.dec_time_hidden,
                                   cfg.dec_notes_hidden),
        "notes_gru": gru_init(ks[7], cfg.dec_time_hidden + cfg.note_emb_size,
                              cfg.dec_notes_hidden),
        "pitch_out": dense_params(ks[8], cfg.dec_notes_hidden,
                                  spec.pitch_range),
        "dur_gru": gru_init(ks[9], spec.dur_width, cfg.dec_dur_hidden),
        "dur_hid": dense_params(ks[10], spec.pitch_range + cfg.dec_notes_hidden,
                                cfg.dec_dur_hidden),
        "dur_out": dense_params(ks[11], cfg.dec_dur_hidden, 2),
        "init_input": free_param(jax.random.split(ks[12])[0],
                                 (2 * cfg.dec_emb_hidden,)),
        "dur_sos": free_param(jax.random.split(ks[12])[1], (spec.dur_width,)),
    }
    return p


# ---------------------------------------------------------------------------
# grid helpers (reference ptvae.py:292-334)
# ---------------------------------------------------------------------------

def grid_lengths(x: jnp.ndarray, spec: PianoTreeSpec) -> jnp.ndarray:
    """(B, T, K, 6) int grid -> (B, T) valid note counts: K minus pad slots
    (reference ptvae.py:292-297; includes sos and eos)."""
    return (spec.max_simu_note -
            (x[..., 0] == spec.pitch_pad).sum(axis=-1)).astype(jnp.int32)


def grid_to_multihot(x: jnp.ndarray, spec: PianoTreeSpec) -> jnp.ndarray:
    """(B, T, K, 6) int grid -> (B, T, K, note_size) multi-hot: pitch one-hot
    over pitch_range (pad index maps to all-zeros) ++ raw dur values
    (reference ptvae.py:299-313)."""
    pitch_oh = jax.nn.one_hot(x[..., 0], spec.pitch_range + 1,
                              dtype=jnp.float32)[..., :spec.pitch_range]
    return jnp.concatenate([pitch_oh, x[..., 1:].astype(jnp.float32)], axis=-1)


def sos_token_raw(spec: PianoTreeSpec) -> jnp.ndarray:
    """Raw sos note feature (reference ptvae.py:315-320)."""
    sos = jnp.zeros((spec.note_size,))
    sos = sos.at[spec.pitch_sos].set(1.0)
    sos = sos.at[spec.pitch_range:].set(2.0)
    return sos


def emb_x(p: dict, x: jnp.ndarray,
          spec: PianoTreeSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, K, 6) grid -> (embedded (B, T, K, emb), lengths (B, T))
    (reference ptvae.py:531-535)."""
    w_dtype = p["note_emb"]["w"].dtype
    mh = grid_to_multihot(x, spec).astype(w_dtype)
    return dense_apply(p["note_emb"], mh), grid_lengths(x, spec)


# ---------------------------------------------------------------------------
# duration head: 5-step binary-digit GRU with argmax feedback
# ---------------------------------------------------------------------------

def _decode_dur(p: dict, note_h: jnp.ndarray, est_pitch: jnp.ndarray,
                spec: PianoTreeSpec, unroll: int = 1
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """note_h (B, notes_hidden), est_pitch (B, pitch_range) ->
    (dur_logits (B, dur_width, 2), dur_bits (B, dur_width) argmax ints).

    The feedback token is the reference's quirky 5-dim vector with a 1 at
    index = previous predicted digit (0 or 1) (ptvae.py:322-326). Expressed
    as a length-5 lax.scan so the HLO stays small — this head runs inside the
    note scan inside the time scan, and unrolling it multiplies the program
    size of everything above it.
    """
    h0 = dense_apply(p["dur_hid"], jnp.concatenate([note_h, est_pitch], -1))
    return _decode_dur_from_h0(p, h0, spec, unroll)


def _decode_dur_from_h0(p: dict, h0: jnp.ndarray, spec: PianoTreeSpec,
                        unroll: int = 1
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Duration chain from a precomputed initial hidden (the folded
    inference path computes ``h0`` with the pitch head pre-multiplied into
    ``dur_hid`` — see :func:`fold_inference_heads`)."""
    B = h0.shape[0]
    W = spec.dur_width
    token0 = jnp.broadcast_to(p["dur_sos"], (B, W)).astype(h0.dtype)

    def step(carry, _):
        h, token = carry
        h = gru_cell_pre(p["dur_gru"],
                         token @ p["dur_gru"].w_ih + p["dur_gru"].b_ih, h)
        out = dense_apply(p["dur_out"], h)                  # (B, 2)
        ind = jnp.argmax(out, -1)
        token = jax.nn.one_hot(ind, W, dtype=h0.dtype)
        return (h, token), (out, ind)

    (_, _), (logits, bits) = jax.lax.scan(step, (h0, token0), None, length=W,
                                          unroll=unroll)
    return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(bits, 0, 1)


def _decode_dur_folded(p: dict, folds: dict, h_d0: jnp.ndarray,
                       X0: jnp.ndarray, acc0: jnp.ndarray,
                       spec: PianoTreeSpec):
    """Kernel-mirroring folded duration chain.

    Each step consumes the previous step's combined projection
    ``X = [logit | pad | gru-hidden gates]`` (train_frame._dur_comb layout)
    and emits the next with ONE dot; ``X0`` comes pre-multiplied from the
    note hidden (fold_inference_heads.w_dx0). The token-feedback
    accumulator ``acc`` picks up ``bit_w * w_dur_gi[w]`` as each bit is
    decided, so the feedback needs no dot at chain end. Bit-exact twin of
    the Pallas kernels' chain (ar_decoder/full_decoder slot loop).

    Returns (dur_logits (B, W, 2), dur_bits (B, W) i32, acc (B, 3NH)).
    """
    from pctd_tpu.ops.pallas.train_frame import _DUR_PAD

    B = h_d0.shape[0]
    W = spec.dur_width
    dg = p["dur_gru"]
    gi_d = (jnp.broadcast_to(p["dur_sos"], (B, W)).astype(h_d0.dtype)
            @ dg.w_ih + dg.b_ih)
    row0 = dg.w_ih[0:1] + dg.b_ih
    row1 = dg.w_ih[1:2] + dg.b_ih
    h_d, X, acc = h_d0, X0, acc0
    logits, bits = [], []
    for w in range(W):
        h_d = gru_gates_pre(gi_d, X[:, _DUR_PAD:], h_d)
        X = h_d @ folds["w_dcomb"] + folds["b_dcomb"]
        logit = X[:, 0:2]
        # one compute-dtype bit throughout (0/1 products are exact in any
        # float dtype; f32 here == the kernels' f32 bitf bit-for-bit)
        bitf = (logit[:, 1:2] > logit[:, 0:1]).astype(h_d0.dtype)
        logits.append(logit)
        bits.append(bitf[:, 0].astype(jnp.int32))
        acc = acc + bitf * folds["w_dur_gi"][w:w + 1]
        gi_d = bitf * row1 + (1.0 - bitf) * row0
    return (jnp.stack(logits, axis=1), jnp.stack(bits, axis=1), acc)


def _pred_note_raw(pitch_ind: jnp.ndarray, dur_bits: jnp.ndarray,
                   spec: PianoTreeSpec) -> jnp.ndarray:
    """Predicted (pitch argmax, dur digits) -> raw note feature
    (reference pitch_dur_ind_to_note_token, ptvae.py:328-334)."""
    pitch_oh = jax.nn.one_hot(pitch_ind, spec.pitch_range, dtype=jnp.float32)
    return jnp.concatenate([pitch_oh, dur_bits.astype(jnp.float32)], axis=-1)


def fold_inference_heads(p: dict, cfg: ModelConfig) -> dict:
    """Serial-path weight folds for the autoregressive inference decode.

    Two head compositions on the per-slot dependence chain are linear maps
    of values already on the chain, so their weights pre-multiply:

    - dur-hidden init: ``[h, est] @ w_dhid`` with ``est = h @ w_p + b_p``
      folds to ``h @ (w_dhid[:nh] + w_p @ w_dhid[nh:]) + const`` — the
      pitch-head dot leaves the h -> dur-chain dependence chain (it still
      runs, for the pitch argmax, but overlaps the duration chain).
    - token feedback: the next slot's notes-GRU input projection
      ``emb @ w_tok`` with ``emb = raw @ w_emb + b_emb`` folds to
      ``raw @ (w_emb @ w_tok) + const`` — the embedding dot leaves the
      dur-bits -> next-slot chain (the embeddings themselves are computed
      once per frame in one batched dot, only for the summary bi-GRU).

    Two more serial-path regroupings ride the same folds:

    - the first dur-chain combined projection (logit | gru-hidden gates,
      train_frame._dur_comb layout) is itself linear in ``h``:
      ``X0 = h_d0 @ w_dcomb`` with ``h_d0 = h @ w_dhid_eff + b`` folds to
      ``X0 = h @ (w_dhid_eff @ w_dcomb) + const`` — the X0 dot issues
      straight from ``h``, in parallel with the ``h_d0`` dot, instead of
      after it.
    - the token-feedback dot decomposes: the raw note token is
      ``[one_hot(pitch) | dur bits]``, so ``raw @ w_raw_gi`` is the pitch
      row (one dot off the dur chain, issued as soon as the pitch argmax
      lands) plus ``bit_w * w_raw_gi[P + w]`` multiply-adds accumulated AS
      the dur bits are produced — the chain's last link becomes one VPU
      multiply-add instead of an MXU dot.

    Mathematically identical regroupings; the f32 bit patterns differ, so
    EVERY decode backend (XLA scan, ar_decoder, full_decoder) applies the
    same folds to stay mutually bit-exact (see decode_grid's precision
    note). Inference-only: the training/teacher-forced path keeps the
    reference grouping (and the oracle-parity tests exercise it unfolded).
    """
    from pctd_tpu.ops.pallas.train_frame import _dur_comb

    nh = cfg.dec_notes_hidden
    th = cfg.dec_time_hidden
    P = cfg.pianotree.pitch_range
    w_dhid, b_dhid = p["dur_hid"]["w"], p["dur_hid"]["b"]
    w_p, b_p = p["pitch_out"]["w"], p["pitch_out"]["b"]
    w_tok = p["notes_gru"].w_ih[th:]
    w_dhid_eff = w_dhid[:nh] + w_p @ w_dhid[nh:]
    b_dhid_eff = b_dhid + b_p @ w_dhid[nh:]
    dg = p["dur_gru"]
    w_dcomb, b_dcomb = _dur_comb(dg.w_hh, dg.b_hh.reshape(1, -1),
                                 p["dur_out"]["w"],
                                 p["dur_out"]["b"].reshape(1, -1))
    w_raw_gi = p["note_emb"]["w"] @ w_tok             # (note_size, 3NH)
    return {
        "w_dhid_eff": w_dhid_eff,
        "b_dhid_eff": b_dhid_eff,
        # first dur-chain combined projection, pre-multiplied through the
        # dur-hid init (NH -> 2 | pad | 3DH)
        "w_dx0": w_dhid_eff @ w_dcomb,
        "b_dx0": (b_dhid_eff @ w_dcomb + b_dcomb)[0],
        "w_dcomb": w_dcomb,
        "b_dcomb": b_dcomb,
        # raw-token -> notes-GRU input projection, split at the pitch/dur
        # boundary for the decomposed feedback accumulation
        "w_pitch_gi": w_raw_gi[:P],                   # (P, 3NH)
        "w_dur_gi": w_raw_gi[P:],                     # (W, 3NH)
        "w_raw_gi": w_raw_gi,
        "b_raw_gi": p["note_emb"]["b"] @ w_tok,       # (3NH,)
    }


# ---------------------------------------------------------------------------
# note level
# ---------------------------------------------------------------------------

def _decode_notes(p: dict, spec: PianoTreeSpec, frame_h: jnp.ndarray,
                  x_emb_t: Optional[jnp.ndarray],
                  coins2_t: Optional[jnp.ndarray], sos_emb: jnp.ndarray,
                  unroll: Tuple[int, int] = (1, 1),
                  folds: Optional[dict] = None):
    """Decode the <=K notes of one frame (reference ptvae.py:370-428).

    frame_h:  (B, time_hidden) — the time-GRU hidden for this frame
    x_emb_t:  (B, K, emb) ground-truth note embeddings or None (inference)
    coins2_t: (K,) bool teacher coins (ignored when x_emb_t is None)
    sos_emb:  (B, emb)

    Returns (pitch_logits (B, K-1, P), dur_logits (B, K-1, W, 2),
             pred_notes (B, K, emb), pred_lengths (B,)).
    """
    B = frame_h.shape[0]
    K = spec.max_simu_note
    emb_dim = sos_emb.shape[-1]
    th = frame_h.shape[-1]

    hid0 = dense_apply(p["time2notes"], frame_h)
    token0 = x_emb_t[:, 0] if x_emb_t is not None else sos_emb

    # hoist the frame part of the notes-GRU input projection out of the scan
    w_frame = p["notes_gru"].w_ih[:th]
    w_tok = p["notes_gru"].w_ih[th:]
    gi_frame = frame_h @ w_frame + p["notes_gru"].b_ih      # (B, 3H)

    if x_emb_t is not None:
        gt_next = jnp.swapaxes(x_emb_t, 0, 1)[1:]           # (K-1, B, emb)
        coins = coins2_t[1:]                                # (K-1,)
    else:
        gt_next = jnp.zeros((K - 1, B, emb_dim), frame_h.dtype)
        coins = jnp.zeros((K - 1,), bool)

    if folds is not None:
        assert x_emb_t is None, "head folds are inference-only"
        # folded chain: the carry holds the raw token's gi projection
        # directly; pitch head and note embedding run off the dependence
        # chain (see fold_inference_heads)
        sos_raw = sos_token_raw(spec).astype(sos_emb.dtype)
        gi_frame_f = gi_frame + folds["b_raw_gi"]
        gi_tok0 = jnp.broadcast_to(sos_raw @ folds["w_raw_gi"],
                                   (B, gi_frame.shape[-1]))

        def step_f(carry, k):
            h, gi_tok, length = carry
            h = gru_cell_pre(p["notes_gru"], gi_frame_f + gi_tok, h)
            est_pitch = dense_apply(p["pitch_out"], h)
            pitch_ind = jnp.argmax(est_pitch, -1)
            pitch_oh = jax.nn.one_hot(pitch_ind, spec.pitch_range,
                                      dtype=jnp.float32)
            # token-feedback accumulator seeded with the pitch row (off the
            # dur chain); the dur rows join bit-by-bit inside the chain.
            # Cast to the weights' dtype so the scan carry keeps one dtype
            # under bf16 inference (f32 one-hot would promote the carry).
            gi_pitch = (pitch_oh.astype(folds["w_pitch_gi"].dtype)
                        @ folds["w_pitch_gi"])
            h_d0 = h @ folds["w_dhid_eff"] + folds["b_dhid_eff"]
            X0 = h @ folds["w_dx0"] + folds["b_dx0"]
            dur_logits, dur_bits, gi_tok_next = _decode_dur_folded(
                p, folds, h_d0, X0, gi_pitch, spec)
            raw = jnp.concatenate(
                [pitch_oh, dur_bits.astype(jnp.float32)], axis=-1).astype(
                p["note_emb"]["w"].dtype)
            is_eos = (pitch_ind == spec.pitch_eos) & (length == 0)
            length = jnp.where(is_eos, k, length)
            return (h, gi_tok_next, length), (est_pitch, dur_logits, raw)

        ks = jnp.arange(1, K, dtype=jnp.int32)
        init = (hid0, gi_tok0, jnp.zeros((B,), jnp.int32))
        (_, _, lengths), (pitch_o, dur_o, raws) = jax.lax.scan(
            step_f, init, ks, unroll=unroll[0])
        lengths = jnp.where(lengths == 0, K - 1, lengths)
        pred_embs = dense_apply(p["note_emb"], raws)        # (K-1, B, emb)
        pred_notes = jnp.concatenate(
            [token0[:, None], jnp.swapaxes(pred_embs, 0, 1)], axis=1)
        return (jnp.swapaxes(pitch_o, 0, 1), jnp.swapaxes(dur_o, 0, 1),
                pred_notes, lengths)

    def step(carry, inp):
        h, token, length = carry
        gt_k, coin_k, k = inp
        h = gru_cell_pre(p["notes_gru"], gi_frame + token @ w_tok, h)
        est_pitch = dense_apply(p["pitch_out"], h)
        dur_logits, dur_bits = _decode_dur(p, h, est_pitch, spec,
                                           unroll=unroll[1])
        pitch_ind = jnp.argmax(est_pitch, -1)
        pred_raw = _pred_note_raw(pitch_ind, dur_bits, spec).astype(
            p["note_emb"]["w"].dtype)
        pred_emb = dense_apply(p["note_emb"], pred_raw)
        is_eos = (pitch_ind == spec.pitch_eos) & (length == 0)
        length = jnp.where(is_eos, k, length)
        token_next = jnp.where(coin_k, gt_k, pred_emb)
        return (h, token_next, length), (est_pitch, dur_logits, pred_emb)

    ks = jnp.arange(1, K, dtype=jnp.int32)
    init = (hid0, token0, jnp.zeros((B,), jnp.int32))
    (_, _, lengths), (pitch_o, dur_o, pred_embs) = jax.lax.scan(
        step, init, (gt_next, coins, ks), unroll=unroll[0])

    lengths = jnp.where(lengths == 0, K - 1, lengths)
    pred_notes = jnp.concatenate(
        [token0[:, None], jnp.swapaxes(pred_embs, 0, 1)], axis=1)  # (B,K,emb)
    return (jnp.swapaxes(pitch_o, 0, 1), jnp.swapaxes(dur_o, 0, 1),
            pred_notes, lengths)


# ---------------------------------------------------------------------------
# time level
# ---------------------------------------------------------------------------

def decode(p: dict, cfg: ModelConfig, z: jnp.ndarray,
           x_emb: Optional[jnp.ndarray] = None,
           lengths: Optional[jnp.ndarray] = None,
           coins1: Optional[jnp.ndarray] = None,
           coins2: Optional[jnp.ndarray] = None,
           fold_heads: bool = False) -> DecoderOutput:
    """Full decode (reference ptvae.py:430-491).

    z: (B, z_dim). Teacher-forced mode: pass x_emb (B, T, K, emb) +
    lengths (B, T) + coins1 (T,) + coins2 (T, K). Inference: leave them None
    (pure argmax-feedback autoregression, == tfr1 = tfr2 = 0 with no gt).
    ``fold_heads`` (inference only) applies the serial-path weight folds of
    :func:`fold_inference_heads` — the serving configuration, matching the
    Pallas decode kernels bit-for-bit; leave False for reference-grouping
    logits (the oracle-parity configuration).
    """
    spec = cfg.pianotree
    B = z.shape[0]
    T = spec.num_step
    inference = x_emb is None

    h0 = dense_apply(p["z2hid"], z)                          # (B, time_hid)
    z_in = dense_apply(p["z2in"], z)                         # (B, z_in)

    sos_emb = dense_apply(p["note_emb"],
                          sos_token_raw(spec).astype(
                              p["note_emb"]["w"].dtype))
    sos_emb = jnp.broadcast_to(sos_emb, (B, sos_emb.shape[-1]))

    # summarize ground-truth frames for teacher tokens: one masked bi-GRU
    # over all B*T frames at once (reference ptvae.py:446-453)
    if not inference:
        K = spec.max_simu_note
        flat = x_emb.reshape(B * T, K, x_emb.shape[-1])
        x_summary = bigru_last_masked(p["emb_fwd"], p["emb_bwd"], flat,
                                      lengths.reshape(B * T))
        x_summary = x_summary.reshape(B, T, -1)              # (B, T, 2*emb_h)
        x_sum_steps = jnp.swapaxes(x_summary, 0, 1)
        x_emb_steps = jnp.swapaxes(x_emb, 0, 1)              # (T, B, K, emb)
        c1 = coins1
        c2 = coins2
    else:
        d2 = 2 * cfg.dec_emb_hidden
        x_sum_steps = jnp.zeros((T, B, d2), z.dtype)
        x_emb_steps = None
        c1 = jnp.zeros((T,), bool)
        c2 = jnp.zeros((T, spec.max_simu_note), bool)

    token0 = jnp.broadcast_to(p["init_input"],
                              (B, p["init_input"].shape[-1]))

    # hoist z_in's share of the time-GRU input projection
    tok_dim = token0.shape[-1]
    w_tok = p["time_gru"].w_ih[:tok_dim]
    gi_z = z_in @ p["time_gru"].w_ih[tok_dim:] + p["time_gru"].b_ih

    use_kernel = cfg.train_frame_kernel and not inference
    if use_kernel:
        from pctd_tpu.ops.pallas.train_frame import core_weights, frame_core

        if jax.default_backend() != "tpu":
            import warnings

            warnings.warn(
                "train_frame_kernel on a non-TPU backend runs the Pallas "
                "kernels in INTERPRET mode — orders of magnitude slower "
                "than the XLA path; intended for tests only", stacklevel=2)
        core_w = core_weights(p, cfg)

        def frame_fn(pp, h, x_emb_t, c2_t, sos_e):
            """Fused-VMEM frame decode with hand-written VJP — note/dur
            levels AND the predicted-frame bi-GRU summary run in one kernel
            whose backward recomputes everything on-chip (checkpoint
            semantics), so no jax.checkpoint is needed on this path."""
            coins = c2_t[1:].astype(jnp.int32)[:, None]
            interp = jax.default_backend() != "tpu"
            pitch_o, dur_o, pred_summary, _ = frame_core(
                cfg, interp, core_w, h, x_emb_t, coins)
            return pitch_o, dur_o, pred_summary
    else:
        folds = fold_inference_heads(p, cfg) \
            if (fold_heads and inference) else None

        def frame_fn(pp, h, x_emb_t, c2_t, sos_e):
            """One frame's note+dur decode + predicted-frame summary.
            Wrapped in jax.checkpoint when cfg.remat_frames: the backward
            then recomputes the 15x(1+5) inner chain per frame instead of
            saving every inner activation — the saved (32, 15, B, hidden)
            temps are what OOM HBM at B >= 1024 (measured: 15.97G at
            B=1024 bf16 without remat)."""
            pitch_o, dur_o, pred_notes, pred_lens = _decode_notes(
                pp, spec, h, x_emb_t, c2_t, sos_e,
                unroll=(cfg.unroll_notes, cfg.unroll_dur), folds=folds)
            pred_summary = bigru_last_masked(pp["emb_fwd"], pp["emb_bwd"],
                                             pred_notes, pred_lens)
            return pitch_o, dur_o, pred_summary

    if cfg.remat_frames and not inference and not use_kernel:
        # Full recompute beats partial saving here: policy=dots_saveable
        # (keep matmul outputs) measured 4495 seg/s vs 6224 at B=1024 and
        # OOMs at B=2048 — the saved gate tensors cost more HBM traffic
        # than the recompute costs FLOPs on this dependency-bound chain.
        frame_fn = jax.checkpoint(frame_fn)

    def step(carry, inp):
        h, token = carry
        if inference:
            x_sum_t, c1_t, c2_t = inp
            x_emb_t = None
        else:
            x_sum_t, c1_t, c2_t, x_emb_t = inp
        h = gru_cell_pre(p["time_gru"], gi_z + token @ w_tok, h)
        pitch_o, dur_o, pred_summary = frame_fn(p, h, x_emb_t, c2_t, sos_emb)
        token_next = jnp.where(c1_t, x_sum_t, pred_summary)
        return (h, token_next), (pitch_o, dur_o)

    xs = (x_sum_steps, c1, c2) if inference else \
        (x_sum_steps, c1, c2, x_emb_steps)
    (_, _), (pitch_outs, dur_outs) = jax.lax.scan(step, (h0, token0), xs)
    return DecoderOutput(jnp.swapaxes(pitch_outs, 0, 1),
                         jnp.swapaxes(dur_outs, 0, 1))


def decode_recon(p: dict, cfg: ModelConfig, z: jnp.ndarray,
                 x_emb: jnp.ndarray, lengths: jnp.ndarray,
                 coins1: jnp.ndarray, coins2: jnp.ndarray, x: jnp.ndarray,
                 weights=(1.0, 0.5), weighted_dur: bool = False,
                 axis_name=None):
    """Teacher-forced decode FUSED with the reconstruction CE (fused-loss
    mode of the train_frame kernel): the pitch/dur logits stay
    in VMEM and the kernel emits masked-CE numerator sums; the mean's
    denominators (mask counts) and the loss weighting stay in XLA.
    Semantics = decode() + recon_loss() (reference ptvae.py:430-491 +
    498-529), same axis_name contract as ops.losses.cross_entropy_ignore.
    Returns (recon, pitch_loss, dur_loss).
    """
    spec = cfg.pianotree
    B = z.shape[0]
    T, K, W = spec.num_step, spec.max_simu_note, spec.dur_width

    h0 = dense_apply(p["z2hid"], z)
    z_in = dense_apply(p["z2in"], z)
    flat = x_emb.reshape(B * T, K, x_emb.shape[-1])
    x_summary = bigru_last_masked(p["emb_fwd"], p["emb_bwd"], flat,
                                  lengths.reshape(B * T)).reshape(B, T, -1)
    token0 = jnp.broadcast_to(p["init_input"],
                              (B, p["init_input"].shape[-1]))
    tok_dim = token0.shape[-1]
    gi_z = z_in @ p["time_gru"].w_ih[tok_dim:] + p["time_gru"].b_ih

    gt_pitch = x[:, :, 1:, 0]
    gt_dur = x[:, :, 1:, 1:]
    interp = jax.default_backend() != "tpu"
    # per-frame kernel: the time-level GRU stays an XLA scan; each
    # frame's kernel emits its CE numerator partials, summed in the
    # scan carry (f32 adds; the loss value equals recon_loss to
    # fp-reassociation)
    from pctd_tpu.ops.pallas.train_frame import (core_weights,
                                                 frame_recon_partials)

    core_w = core_weights(p, cfg)
    w_tok = p["time_gru"].w_ih[:tok_dim]
    gt_pitch_t = jnp.swapaxes(gt_pitch, 0, 1).astype(jnp.int32)
    gt_dur_t = jnp.swapaxes(gt_dur, 0, 1).astype(jnp.int32).reshape(
        T, B, (K - 1) * W)

    def step(carry, inp):
        h, token, nums_acc = carry
        x_sum_t, c1_t, c2_t, x_emb_t, gt_p_t, gt_d_t = inp
        h = gru_cell_pre(p["time_gru"], gi_z + token @ w_tok, h)
        kcoins = c2_t[1:].astype(jnp.int32)[:, None]
        nums_t, pred_summary = frame_recon_partials(
            cfg, interp, core_w, h, x_emb_t, kcoins, gt_p_t, gt_d_t)
        token_next = jnp.where(c1_t, x_sum_t, pred_summary)
        return (h, token_next, nums_acc + nums_t), None

    xs = (jnp.swapaxes(x_summary, 0, 1), coins1, coins2,
          jnp.swapaxes(x_emb, 0, 1), gt_pitch_t, gt_dur_t)
    (_, _, nums), _ = jax.lax.scan(
        step, (h0, token0, jnp.zeros((1 + W,), jnp.float32)), xs)

    den_p = (gt_pitch != spec.pitch_pad).sum()
    den_d = (gt_dur != spec.dur_pad).sum(axis=(0, 1, 2))        # (W,)
    if axis_name is not None:
        nums = jax.lax.psum(nums, axis_name)
        den_p = jax.lax.psum(den_p, axis_name)
        den_d = jax.lax.psum(den_d, axis_name)
    pitch_loss = nums[0] / jnp.maximum(den_p, 1)
    if not weighted_dur:
        dur_loss = nums[1:].sum() / jnp.maximum(den_d.sum(), 1)
    else:
        w = jnp.array([1.0, 0.6, 0.4, 0.3, 0.3])
        dur_loss = sum(w[i] * nums[1 + i] / jnp.maximum(den_d[i], 1)
                       for i in range(W))
    return weights[0] * pitch_loss + weights[1] * dur_loss, pitch_loss, \
        dur_loss


def draw_coins(key: jax.Array, cfg: ModelConfig, tfr1, tfr2):
    """Batch-global per-step Bernoulli teacher coins (reference semantics:
    random.random() < tfr at ptvae.py:476/420)."""
    spec = cfg.pianotree
    k1, k2 = jax.random.split(key)
    coins1 = jax.random.uniform(k1, (spec.num_step,)) < tfr1
    coins2 = jax.random.uniform(
        k2, (spec.num_step, spec.max_simu_note)) < tfr2
    return coins1, coins2


# ---------------------------------------------------------------------------
# losses and output conversion
# ---------------------------------------------------------------------------

def recon_loss(x: jnp.ndarray, out: DecoderOutput, spec: PianoTreeSpec,
               weights=(1.0, 0.5), weighted_dur: bool = False,
               axis_name=None):
    """Pitch + duration reconstruction loss (reference ptvae.py:498-529):
    CE over grid slots 1..K-1 with pad targets ignored.

    ``axis_name``: mesh axis (or axes) for the exact data-parallel masked-CE
    reduction — see ops.losses.cross_entropy_ignore."""
    gt_pitch = x[:, :, 1:, 0]
    pitch_loss = cross_entropy_ignore(out.pitch_logits, gt_pitch,
                                      spec.pitch_pad, axis_name=axis_name)
    gt_dur = x[:, :, 1:, 1:]
    if not weighted_dur:
        dur_loss = cross_entropy_ignore(out.dur_logits, gt_dur, spec.dur_pad,
                                        axis_name=axis_name)
    else:
        w = jnp.array([1.0, 0.6, 0.4, 0.3, 0.3])
        per_bit = [cross_entropy_ignore(out.dur_logits[..., i, :],
                                        gt_dur[..., i], spec.dur_pad,
                                        axis_name=axis_name)
                   for i in range(spec.dur_width)]
        dur_loss = sum(w[i] * per_bit[i] for i in range(spec.dur_width))
    loss = weights[0] * pitch_loss + weights[1] * dur_loss
    return loss, pitch_loss, dur_loss


def output_to_grid(out: DecoderOutput) -> jnp.ndarray:
    """Argmax logits -> estimated grid (B, T, K-1, 6)
    (reference output_to_numpy, ptvae.py:537-544)."""
    est_pitch = jnp.argmax(out.pitch_logits, -1)[..., None]
    est_dur = jnp.argmax(out.dur_logits, -1)
    return jnp.concatenate([est_pitch, est_dur], axis=-1)


def decode_grid(p: dict, cfg: ModelConfig, z: jnp.ndarray,
                frame_decoder: str = "xla",
                interpret: bool = False) -> jnp.ndarray:
    """Inference decode straight to the estimated grid (B, T, K-1, 6).

    ``frame_decoder='pallas'`` runs each frame's note+duration levels in the
    fused VMEM kernel (pctd_tpu.ops.pallas.ar_decoder); ``'pallas_full'``
    runs the ENTIRE decode (time loop included) in one kernel with all
    weights resident in VMEM (ops/pallas/full_decoder) — the serving path;
    'xla' uses the nested-scan decode (the reference-parity path).

    ALL backends trace their matmuls at HIGHEST precision (true f32 on the
    MXU). The decode's output is pure argmax, and at the TPU's default
    precision (one bf16 pass) the argmax is schedule-sensitive: XLA-default
    vs XLA-highest disagree on 2.8% of pitches, and any two lowerings of
    the same math (XLA scan vs fused kernel) disagree at the ~0.3% level.
    At highest precision every backend computes the same correctly-rounded
    f32 logits, making the three backends' discrete outputs agree — and all
    of them match the f32 torch reference more closely. The chain is
    dependency-latency-bound, so the extra MXU passes are hidden.
    """
    with jax.default_matmul_precision("highest"):
        return _decode_grid_inner(p, cfg, z, frame_decoder, interpret)


def _decode_grid_inner(p: dict, cfg: ModelConfig, z: jnp.ndarray,
                       frame_decoder: str, interpret: bool) -> jnp.ndarray:
    if frame_decoder == "xla":
        return output_to_grid(decode(p, cfg, z, fold_heads=True))
    if frame_decoder == "pallas_full":
        from pctd_tpu.ops.pallas import decode_grid_fused

        return decode_grid_fused(p, cfg, z, interpret=interpret)
    from pctd_tpu.ops.pallas import frame_decode_pallas

    spec = cfg.pianotree
    B = z.shape[0]
    h0 = dense_apply(p["z2hid"], z)
    z_in = dense_apply(p["z2in"], z)
    sos_emb = dense_apply(p["note_emb"],
                          sos_token_raw(spec).astype(
                              p["note_emb"]["w"].dtype))
    sos_emb = jnp.broadcast_to(sos_emb, (B, sos_emb.shape[-1]))
    token0 = jnp.broadcast_to(p["init_input"],
                              (B, p["init_input"].shape[-1]))
    tok_dim = token0.shape[-1]
    w_tok = p["time_gru"].w_ih[:tok_dim]
    gi_z = z_in @ p["time_gru"].w_ih[tok_dim:] + p["time_gru"].b_ih

    def step(carry, _):
        h, token = carry
        h = gru_cell_pre(p["time_gru"], gi_z + token @ w_tok, h)
        pitch_idx, dur_bits, summary, _ = frame_decode_pallas(
            p, cfg, h, sos_emb, interpret=interpret)
        return (h, summary), (pitch_idx, dur_bits)

    (_, _), (pitch_idx, dur_bits) = jax.lax.scan(
        step, (h0, token0), None, length=spec.num_step)
    pitch_idx = jnp.swapaxes(pitch_idx, 0, 1)               # (B, T, K-1)
    dur_bits = jnp.swapaxes(dur_bits, 0, 1)                 # (B, T, K-1, W)
    return jnp.concatenate([pitch_idx[..., None], dur_bits], axis=-1)
