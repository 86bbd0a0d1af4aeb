"""Pallas TPU kernels: teacher-forced frame decode with a hand-written VJP.

Training-path counterpart of ops/pallas/ar_decoder.py (reference semantics:
ptvae.py:370-428 teacher-forced branch). One frame = 15 sequential note
slots x (GRU cell + pitch head + 5-step binary-duration GRU with argmax
feedback + predicted-note embedding + teacher-coin token select), plus the
masked bidirectional GRU summary of the predicted notes (ptvae.py:480-486).
Under XLA this lowers to nested while loops whose backward (plus the
frame-remat recompute) re-reads every intermediate from HBM — measured to be
bandwidth-bound (ARCHITECTURE.md: full recompute beats every partial-save
policy). Here:

- the FORWARD kernel runs the whole frame INCLUDING the summary in VMEM and
  emits the pitch/dur logits, the frame summary, and the eos lengths; on the
  differentiation path it also stashes the serial-chain slot hiddens — the
  only product of the serial recurrence the backward cannot rebuild (the
  consumed tokens rebuild from them + the gt embeddings);
- the BACKWARD kernel rebuilds every other intermediate from that stash with
  (K-1)*B-row batched dots (per-row dot products identical to the forward's
  per-slot dots => bit-equal argmax decisions) and hand-differentiates the
  chain in the same VMEM residency, accumulating weight gradients in f32
  across batch-grid blocks. It runs NO serial forward recompute — that
  recompute ran once per 256-row grid block (8x the whole latency-bound
  chain at B=2048) and dominated the backward. Every slot-independent
  computation is batched over (K-1)*B rows: the summary bi-GRU's gate
  projections and weight/d_pred dots, the pitch heads, the duration chains
  (the 14x5 serial links collapse to 5 wide steps), and the emb/x_emb
  cotangents. Only the note-GRU reverse recurrence stays serial, its gate
  projections issued one step early so their latency hides behind the
  recurrence. To keep 256-row blocks inside VMEM the dur-chain rebuild
  stashes just the bf16 hidden states and the decided bits; the f32 gate
  tuples are recomputed in the backward loop (same dots, same inputs =>
  bit-exact).

Gradient structure notes (why the hand-VJP is tractable): the argmax
feedbacks (pitch index, duration bits) carry no gradient, so the only
cross-slot gradient paths are the note-GRU hidden chain, the predicted
embedding -> next-token select, and the embedding -> summary bi-GRU; the
duration chain is differentiated wrt its hidden state only (its feedback
tokens are one-hots of argmaxed bits), and the summary masks are integer
functions of the (argmaxed) eos slot.

The teacher-coin select ``token = where(coin_k, gt_k, emb_k)`` follows the
reference's batch-global per-slot coins (ptvae.py:420-424).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pctd_tpu.config import ModelConfig, PianoTreeSpec


# Combined dur-chain weight layout: [w_dout (2) | zero pad | w_dhh (3*DH)],
# the w_dhh block starting at the next 128-lane tile boundary so both output
# slices are tile-aligned. One (B, DH) @ (DH, pad+3DH) dot then yields a dur
# step's logit AND the next step's hidden projection — the chain's two
# serial dots per step become one (each output column is the same dot
# product as in the separate matmuls, so values are bit-exact).
_DUR_PAD = 128


def _dur_comb(w_dhh, b_dhh, w_dout, b_dout):
    """(DH, 2 + pad + 3DH) combined weight and (1, ...) bias rows."""
    dh = w_dhh.shape[0]
    pad = jnp.zeros((dh, _DUR_PAD - w_dout.shape[1]), w_dhh.dtype)
    padb = jnp.zeros((1, _DUR_PAD - b_dout.shape[1]), b_dhh.dtype)
    return (jnp.concatenate([w_dout, pad, w_dhh], axis=1),
            jnp.concatenate([b_dout, padb, b_dhh], axis=1))


def _gru_gates(gi, gh, h):
    """GRU gate math (torch convention) from precomputed input/hidden
    projections; returns (h', (r, z, n, h_n)). Split out so callers can
    hoist or combine the ``h @ w_hh`` dot off the serial chain."""
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    h_new = (1.0 - z) * n + z * h
    return h_new, (r, z, n, h_n)


def _gru_fwd(gi, h, w_hh, b_hh):
    """One GRU step (torch gate convention); returns (h', (r, z, n, h_n))."""
    gh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
    return _gru_gates(gi, gh, h)


def _gru_bwd(dh_new, h_prev, r, z, n, h_n, w_hh):
    """Backward of one GRU step given the saved gate values.

    Returns (d_gi (B, 3H), d_h_prev (B, H), d_gh (B, 3H)) where d_gh is the
    cotangent of ``h_prev @ w_hh + b_hh`` (for the w_hh/b_hh grads).
    """
    dz = dh_new * (h_prev - n)
    dn = dh_new * (1.0 - z)
    dh_prev = dh_new * z
    dn_pre = dn * (1.0 - n * n)
    dz_pre = dz * z * (1.0 - z)
    dr = dn_pre * h_n
    dr_pre = dr * r * (1.0 - r)
    d_gi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
    d_gh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
    dh_prev = dh_prev + jnp.dot(d_gh, w_hh.T,
                                preferred_element_type=jnp.float32)
    return d_gi, dh_prev, d_gh


def _row_select(logit, row1, row0):
    """Per-row select between two (1, X) f32 rows by the argmax of a (B, 2)
    logit, WITHOUT an i1 mask or an int->float convert: Mosaic can neither
    relayout the (B, 1) -> (B, X) i1 broadcast a ``jnp.where(bit[:, None],
    ...)`` needs at 256-row blocks ("non-singleton logical dimension is
    replicated in destination but not in source" on vector<256x192xi1>) nor
    legalize ``arith.sitofp`` on the argmax output. ``logit1 > logit0`` IS
    argmax == 1 (ties -> index 0), and the i1 -> f32 convert of a compare
    is supported (same pattern as the pitch one-hot). The multiplicative
    form is value-exact for finite rows: the not-taken branch contributes
    an exact 0.0 product and ``x + 0.0 == x`` (only a dead -0.0/+0.0 bit on
    zero row entries can differ, which no downstream compare or sum can
    see)."""
    bitf = _argmax_bit(logit)
    return bitf * row1 + (1.0 - bitf) * row0


def _argmax_bit(logit):
    """(B, 2) logits -> (B, 1) f32 argmax bit (ties -> 0), the Mosaic-safe
    compare+convert at the heart of _row_select — shared with the inference
    decoders, which also feed the bit into token feedback and the emitted
    duration word."""
    lf = logit.astype(jnp.float32)
    return (lf[:, 1:2] > lf[:, 0:1]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# shared forward body (traced inside both kernels)
# ---------------------------------------------------------------------------

def _run_forward(spec, refs, coin_fn, frame_h, x_emb_ref, dtype,
                 pitch_ref=None, dur_ref=None, keep_logits=False):
    """The frame forward. Returns (hs, tokens, pred, lengths) where
    hs[k] = note-GRU hidden after slot k (h[0] = initial), tokens[k] = the
    token consumed by slot k+1, pred[k] = the predicted-note embedding of
    slot k (pred[0] = gt sos token). Writes logits when refs are given;
    with ``keep_logits`` it instead returns two extra values — the pitch
    logits (list of K-1 (B, P)) and dur logits (list of K-1 lists of W
    (B, 2)) — for the fused-loss kernels, which consume them in VMEM and
    never materialize them to HBM.
    ``coin_fn(k)`` returns slot k's scalar teacher coin (int, != 0 means
    teacher) — a function so the per-frame and fused-sequence kernels can
    index their differently-shaped SMEM coin tensors.

    Duration-chain input projections are hoisted: the sos projection is one
    dot per kernel call, and the post-sos token is a {0,1} one-hot so its
    projection is row 0/1 of (w_dih + b_dih) — a select, bit-exact vs the
    one-hot matmul (zero products are exact). The dur-hidden init and note
    embedding use single concatenated dots (same f32 grouping as the XLA
    path's dense-over-concat, pianotree_decoder.py:132,154)."""
    (w_t2n_ref, b_t2n_ref, w_ih_frame_ref, w_ih_tok_ref, b_ih_ref,
     w_hh_ref, b_hh_ref, w_pitch_ref, b_pitch_ref, w_dhid_ref,
     b_dhid_ref, w_dih_ref, b_dih_ref, w_dhh_ref, b_dhh_ref,
     w_dout_ref, b_dout_ref, w_emb_ref, b_emb_ref,
     dur_sos_ref) = refs
    K, W, P = spec.max_simu_note, spec.dur_width, spec.pitch_range
    B = frame_h.shape[0]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)

    gi_d_sos = (dot(jnp.broadcast_to(dur_sos_ref[:], (B, W)).astype(dtype),
                    w_dih_ref[:]) + b_dih_ref[:])
    gi_d_row0 = w_dih_ref[0:1, :] + b_dih_ref[:]
    gi_d_row1 = w_dih_ref[1:2, :] + b_dih_ref[:]
    # combined dur-chain weights (one dot per dur step instead of two):
    # [w_dout | pad | w_dhh], slices tile-aligned — see _dur_comb
    w_dcomb, b_dcomb = _dur_comb(w_dhh_ref[:], b_dhh_ref[:],
                                 w_dout_ref[:], b_dout_ref[:])

    h = (dot(frame_h, w_t2n_ref[:]) + b_t2n_ref[:]).astype(dtype)
    gi_frame = dot(frame_h, w_ih_frame_ref[:]) + b_ih_ref[:]
    gh = dot(h, w_hh_ref[:]) + b_hh_ref[:]
    token = x_emb_ref[0]
    hs = [h]
    tokens = [token]
    pred = [token]
    ests, dur_logits = [], []
    lengths = jnp.zeros((B, 1), jnp.int32)

    for k in range(1, K):
        gi = gi_frame + dot(token, w_ih_tok_ref[:])
        h, _ = _gru_gates(gi, gh, h)
        h = h.astype(dtype)
        hs.append(h)
        # next slot's hidden projection issues here (depends only on h) so
        # it overlaps the dur chain instead of sitting on the serial path
        gh = dot(h, w_hh_ref[:]) + b_hh_ref[:]
        est_pitch = (dot(h, w_pitch_ref[:]) + b_pitch_ref[:]).astype(dtype)
        if pitch_ref is not None:
            pitch_ref[k - 1] = est_pitch
        if keep_logits:
            ests.append(est_pitch)
            dur_logits.append([])
        pitch_ind = jnp.argmax(est_pitch.astype(jnp.float32),
                               axis=-1).astype(jnp.int32)
        h_d = (dot(jnp.concatenate([h, est_pitch], axis=-1),
                   w_dhid_ref[:]) + b_dhid_ref[:]).astype(dtype)
        X = dot(h_d, w_dcomb) + b_dcomb
        gi_d = gi_d_sos
        bits = []
        for w in range(W):
            h_d, _ = _gru_gates(gi_d, X[:, _DUR_PAD:], h_d)
            h_d = h_d.astype(dtype)
            X = dot(h_d, w_dcomb) + b_dcomb
            logit = X[:, 0:2].astype(dtype)
            if dur_ref is not None:
                dur_ref[k - 1, w] = logit
            if keep_logits:
                dur_logits[-1].append(logit)
            bit = jnp.argmax(logit.astype(jnp.float32),
                             axis=-1).astype(jnp.int32)
            bits.append(bit)
            gi_d = _row_select(logit, gi_d_row1, gi_d_row0)
        dur_bits = jnp.stack(bits, axis=-1)
        pitch_oh = (col == pitch_ind[:, None]).astype(dtype)
        emb = (dot(jnp.concatenate([pitch_oh, dur_bits.astype(dtype)],
                                   axis=-1),
                   w_emb_ref[:]) + b_emb_ref[:]).astype(dtype)
        pred.append(emb)
        is_eos = (pitch_ind[:, None] == spec.pitch_eos) & (lengths == 0)
        lengths = jnp.where(is_eos, k, lengths)
        coin = coin_fn(k) != 0
        token = jnp.where(coin, x_emb_ref[k], emb)
        tokens.append(token)

    lengths = jnp.where(lengths == 0, K - 1, lengths)
    if keep_logits:
        return hs, tokens, pred, lengths, ests, dur_logits
    return hs, tokens, pred, lengths


def _summary_fwd(pred, lengths, we_ih_ref, we_hh_ref, be_ih_ref, be_hh_ref,
                 dtype, keep_states=False):
    """Masked bidirectional GRU over the predicted notes, in VMEM
    (pack_padded semantics, reference ptvae.py:480-486). Returns
    (hf, hb) final states, plus the per-step state lists if requested."""
    K = len(pred)
    B = pred[0].shape[0]
    EH = we_hh_ref.shape[1]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    # ALL input projections in one dot per direction (per-row accumulation
    # identical to the per-slot dots); the serial chain keeps only the
    # hidden-side dots
    flat = jnp.stack(pred).reshape(K * B, pred[0].shape[-1])
    gif_all = (dot(flat, we_ih_ref[0]) + be_ih_ref[0:1, :]).reshape(
        K, B, 3 * EH)
    gib_all = (dot(flat, we_ih_ref[1]) + be_ih_ref[1:2, :]).reshape(
        K, B, 3 * EH)
    hf = jnp.zeros((B, EH), dtype)
    hb = jnp.zeros((B, EH), dtype)
    hf_list, hb_list = [hf], [hb]
    for k in range(K):
        mf = (k < lengths).astype(jnp.float32)
        hf_new, _ = _gru_fwd(gif_all[k], hf, we_hh_ref[0], be_hh_ref[0:1, :])
        hf = (mf * hf_new + (1.0 - mf) * hf).astype(dtype)
        kb = K - 1 - k
        mb = (kb < lengths).astype(jnp.float32)
        hb_new, _ = _gru_fwd(gib_all[kb], hb, we_hh_ref[1],
                             be_hh_ref[1:2, :])
        hb = (mb * hb_new + (1.0 - mb) * hb).astype(dtype)
        if keep_states:
            hf_list.append(hf)
            hb_list.append(hb)
    if keep_states:
        return hf, hb, hf_list, hb_list, gif_all, gib_all
    return hf, hb


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(spec: PianoTreeSpec, loss_mode: bool, *args):
    (coins_ref, frame_h_ref, x_emb_ref, *rest) = args
    if loss_mode:
        gt_pitch_ref, gt_dur_ref = rest[:2]
        rest = rest[2:]
    refs = rest[:20]
    we_ih_ref, we_hh_ref, be_ih_ref, be_hh_ref = rest[20:24]
    if loss_mode:
        nums_ref, summ_ref, len_ref = rest[24:27]
        pitch_ref = dur_ref = None
        hs_ref = rest[27] if len(rest) > 27 else None
    else:
        pitch_ref, dur_ref, summ_ref, len_ref = rest[24:28]
        hs_ref = rest[28] if len(rest) > 28 else None
    dtype = frame_h_ref.dtype
    W = spec.dur_width

    fwd = _run_forward(
        spec, refs, lambda k: coins_ref[k - 1, 0], frame_h_ref[:], x_emb_ref,
        dtype, pitch_ref=pitch_ref, dur_ref=dur_ref, keep_logits=loss_mode)
    hs, tokens, pred, lengths = fwd[:4]
    hf, hb = _summary_fwd(pred, lengths, we_ih_ref, we_hh_ref, be_ih_ref,
                          be_hh_ref, dtype)
    EH = we_hh_ref.shape[1]
    summ_ref[:, :EH] = hf
    summ_ref[:, EH:] = hb
    len_ref[:] = lengths

    if loss_mode:
        # masked-CE numerator partials (pitch + one per dur bit), summed in
        # f32 over the block and accumulated across the batch grid; the
        # logits stay in VMEM (fused-loss mode).
        # Denominators are mask counts the XLA caller computes from the
        # grid targets.
        ests, dur_logits = fwd[4], fwd[5]
        gt_p, gt_d = _gt_cat(spec, gt_pitch_ref, gt_dur_ref)
        parts = [_ce_nll_sum(jnp.concatenate(ests), gt_p, spec.pitch_pad)]
        for w in range(W):
            parts.append(_ce_nll_sum(
                jnp.concatenate([dl[w] for dl in dur_logits]), gt_d[w],
                spec.dur_pad))
        row = jnp.concatenate(
            parts + [jnp.zeros((1, NUMS_W - 1 - W), jnp.float32)], axis=-1)

        @pl.when(pl.program_id(0) == 0)
        def _zero_nums():
            nums_ref[...] = jnp.zeros(nums_ref.shape, nums_ref.dtype)

        nums_ref[...] += row
    if hs_ref is not None:
        # stash the serial-chain slot hiddens for the backward
        # (differentiation path only): they are the ONLY phase-1 product the
        # backward cannot rebuild with batched dots, so shipping them (bf16,
        # ~34 MB/frame at B=2048) lets the backward kernel skip the whole
        # serial forward recompute. The consumed tokens it rebuilds from
        # these + the gt embeddings it streams in anyway (_frame_bwd_core).
        for k in range(spec.max_simu_note):
            hs_ref[k] = hs[k]


# ---------------------------------------------------------------------------
# backward kernel: recompute fwd in VMEM, then reverse
# ---------------------------------------------------------------------------

_WNAMES = ("w_t2n", "b_t2n", "w_ih_frame", "w_ih_tok", "b_ih", "w_hh",
           "b_hh", "w_pitch", "b_pitch", "w_dhid", "b_dhid", "w_dih",
           "b_dih", "w_dhh", "b_dhh", "w_dout", "b_dout", "w_emb", "b_emb",
           "dur_sos", "we_ih", "we_hh", "be_ih", "be_hh")


# ---------------------------------------------------------------------------
# in-kernel masked cross-entropy (fused-loss mode):
# same math as ops/losses._nll (f32 logsumexp - one-hot pick), computed in
# VMEM on logits that never leave the kernel
# ---------------------------------------------------------------------------

def _ce_nll_sum(logits, gt, pad_index):
    """Masked CE-numerator sum: sum over rows with gt != pad of
    (logsumexp(logits_row) - logits_row[gt]). logits (N, C), gt (N, 1) i32.
    Returns a (1, 1) f32 partial (ops/losses.py semantics: the mean's
    denominator is a mask count, computed by the XLA caller from the grid
    targets)."""
    lg = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(lg, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
    picked = jnp.sum(lg * (col == gt).astype(jnp.float32), axis=-1,
                     keepdims=True)
    mask = (gt != pad_index).astype(jnp.float32)
    return jnp.sum((lse - picked) * mask).reshape(1, 1)


def _ce_grad(logits, gt, pad_index, g):
    """d(masked CE-numerator sum)/d(logits) scaled by the scalar cotangent
    ``g``: g * mask * (softmax(logits) - onehot(gt)), in f32."""
    lg = logits.astype(jnp.float32)
    sm = jnp.exp(lg - jax.nn.logsumexp(lg, axis=-1, keepdims=True))
    col = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
    oh = (col == gt).astype(jnp.float32)
    mask = (gt != pad_index).astype(jnp.float32)
    return (g * mask) * (sm - oh)


#: fused-loss partials row width: [pitch_num | dur_num x W | zero pad]
NUMS_W = 8


def _lane_col(x_f32, j: int):
    """Extract lane column ``j`` of a (bt, C) f32 block as a (bt, 1) value
    at lane offset 0, via a one-hot selector dot. A plain ``x[:, j:j+1]``
    slice keeps lane offset j in its Mosaic layout, and tpu.concatenate of
    blocks with mismatched non-concat-dim offsets has no lowering ("result/
    input offset mismatch"); the MXU dot is the offset-normalizing move.
    Bit-exact: a one-hot f32 contraction of integer-valued f32 data."""
    C = x_f32.shape[1]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0) == j).astype(
        jnp.float32)
    return jnp.dot(x_f32, sel, preferred_element_type=jnp.float32)


def _gt_cat(spec, gt_pitch_ref, gt_dur_ref):
    """Slot-concatenated targets, sublane-aligned with the (K-1)*B-row
    batched intermediates. The targets ship batch-major — (bt, K-1) and
    (bt, (K-1)*W) windows, batch in SUBLANES. Each slot/bit column is
    extracted with a selector dot (see _lane_col) so every piece lands at
    lane offset 0 before the sublane concatenate; values are exact (ints
    =< pitch_pad round-trip f32)."""
    K, W = spec.max_simu_note, spec.dur_width
    gt_pf = gt_pitch_ref[:].astype(jnp.float32)
    gt_df = gt_dur_ref[:].astype(jnp.float32)
    gt_p = jnp.concatenate(
        [_lane_col(gt_pf, k - 1) for k in range(1, K)]).astype(jnp.int32)
    gt_d = [jnp.concatenate(
        [_lane_col(gt_df, (k - 1) * W + w) for k in range(1, K)]).astype(
            jnp.int32) for w in range(W)]
    return gt_p, gt_d


def _ce_grad_pitch(spec, col, est_all, loss_md):
    del col  # the helper builds its own iota at the logits' shape
    return _ce_grad(est_all, loss_md["gt_pitch"], spec.pitch_pad,
                    loss_md["g_pitch"])


def _ce_grad_dur(spec, logit, w, loss_md):
    return _ce_grad(logit, loss_md["gt_dur"][w], spec.dur_pad,
                    loss_md["g_dur"][w])


def _frame_bwd_core(spec: PianoTreeSpec, nh: int, wts, coin_fn, frame_h,
                    hs, tokens, x_emb0, d_pitch, d_dur, d_summ, add,
                    loss_md=None, flush=lambda *names: None,
                    x_emb_rows=None):
    """Hand-differentiated frame backward, ref-free so the per-frame kernel
    (_bwd_kernel) shares it.

    wts: dict name -> weight ARRAY (see _WNAMES); coin_fn(k): slot k's
    scalar teacher coin; frame_h (B, TH); hs: the stashed serial chain
    (K entries); tokens: the consumed tokens (K entries) — OR None with
    ``x_emb_rows`` (list of K (B, E) ground-truth embeddings) supplied, in
    which case the tokens are REBUILT here from the phase-1 ``emb_all``
    (bit-equal recompute) as ``where(coin_k, x_emb[k], emb_k)``: the token
    stash is redundant given the gt embeddings are streamed in anyway;
    x_emb0 (B, E) = the gt sos token; d_pitch
    (K-1, B, P), d_dur (K-1, W, B, 2), d_summ (B, 2*EH) cotangents.
    add(name, val): f32 weight-grad accumulator. flush(*names): called when
    the named accumulators receive their LAST add — a kernel can then fold
    each into its VMEM-resident grad ref immediately, so the f32 grad
    values (~28 MB at canonical dims) never all coexist as live vector
    state (they dominated the register-allocator spill slots). Returns
    (d_frame_h f32, d_x_rows — list of K (B, E) cotangent rows in compute
    dtype).

    ``loss_md`` (fused-loss mode): d_pitch/d_dur
    are None and the logit cotangents are computed HERE from the rebuilt
    logits — the masked-CE gradient ``g * mask * (softmax(l) - onehot(gt))``
    — so logits never round-trip HBM. Keys: gt_pitch (KB, 1) i32,
    gt_dur (list of W (KB, 1) i32), g_pitch / g_dur[w] scalar f32 cotangents
    of the CE numerator sums (the 1/denom * weight factors fold in there)."""
    K, W, P = spec.max_simu_note, spec.dur_width, spec.pitch_range
    B = frame_h.shape[0]
    KB = (K - 1) * B
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    def wgrad(x, dy):
        # (B, X)^T @ (B, Y) -> (X, Y), contracting the batch dim
        return jax.lax.dot_general(
            x, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dtype = frame_h.dtype
    f32 = jnp.float32
    (w_ih_frame, b_ih, w_pitch, b_pitch, w_dhid, b_dhid, w_dih, b_dih,
     w_dout, w_emb, b_emb, dur_sos) = (
        wts["w_ih_frame"], wts["b_ih"], wts["w_pitch"], wts["b_pitch"],
        wts["w_dhid"], wts["b_dhid"], wts["w_dih"], wts["b_dih"],
        wts["w_dout"], wts["w_emb"], wts["b_emb"], wts["dur_sos"])
    col = jax.lax.broadcasted_iota(jnp.int32, (KB, P), 1)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (KB, W), 1)

    # ---- phase 1: rebuild everything from the STASHED serial chain. The
    # forward kernel ships the slot hiddens and consumed tokens — the only
    # products of the serial recurrence — so the backward runs NO serial
    # forward recompute: pitch heads, duration chains and predicted
    # embeddings rebuild as (K-1)*B-row batched dots (per-row dot products
    # identical to the forward's per-slot dots, deterministic row-wise MXU
    # accumulation => bit-equal argmax decisions), and only the short
    # summary bi-GRU recurrence re-runs serially. This removed serial
    # recompute was the dominant backward cost: it ran once per 256-row
    # grid block, i.e. 8x the whole forward chain at B=2048.
    gi_frame = dot(frame_h, w_ih_frame) + b_ih

    H_all = jnp.concatenate(hs[1:], axis=0)               # (KB, NH) slot k=1..
    est_all = (dot(H_all, w_pitch) + b_pitch).astype(dtype)
    pitch_ind_all = jnp.argmax(est_all.astype(f32), axis=-1).astype(jnp.int32)
    if loss_md is not None:
        d_pitch_flat, d_dur_rows = _ce_grad_pitch(
            spec, col, est_all, loss_md), []
    dhid_in_all = jnp.concatenate([H_all, est_all], axis=-1)
    hd0_all = (dot(dhid_in_all, w_dhid) + b_dhid).astype(dtype)

    gi_d_sos = (dot(dur_sos.astype(dtype), w_dih)
                + b_dih)                                  # (1, 3DH) row
    gi_d_row0 = w_dih[0:1, :] + b_dih
    gi_d_row1 = w_dih[1:2, :] + b_dih
    # same combined dur weights as the forward so the recompute is bit-equal
    w_dcomb, b_dcomb = _dur_comb(wts["w_dhh"], wts["b_dhh"],
                                 w_dout, wts["b_dout"])

    # Only the hidden states (bf16) and the decided bits stay live across
    # the chain recompute; the f32 gate tuples — the largest liveness term,
    # 4 tensors x W steps at (KB, DH) — are recomputed in the backward loop
    # from those stashes (same dots, same inputs => bit-exact), keeping
    # 256-row blocks inside VMEM.
    hds = [hd0_all]
    bits = []
    h_d = hd0_all
    X = dot(hd0_all, w_dcomb) + b_dcomb
    gi_d = jnp.broadcast_to(gi_d_sos, (KB, gi_d_sos.shape[-1]))
    for w in range(W):
        h_d, _ = _gru_gates(gi_d, X[:, _DUR_PAD:], h_d)
        h_d = h_d.astype(dtype)
        hds.append(h_d)
        X = dot(h_d, w_dcomb) + b_dcomb
        logit = X[:, 0:2].astype(dtype)
        if loss_md is not None:
            d_dur_rows.append(_ce_grad_dur(spec, logit, w, loss_md))
        bit = jnp.argmax(logit.astype(f32), axis=-1).astype(jnp.int32)
        bits.append(bit)
        gi_d = _row_select(logit, gi_d_row1, gi_d_row0)
    dur_bits_all = jnp.stack(bits, axis=-1)               # (KB, W)
    pitch_oh_all = (col == pitch_ind_all[:, None]).astype(dtype)
    emb_in_all = jnp.concatenate(
        [pitch_oh_all, dur_bits_all.astype(dtype)], axis=-1)

    # predicted-note embeddings + eos lengths, rebuilt batched (forward
    # semantics: first eos slot, else K-1)
    emb_all = (dot(emb_in_all, w_emb) + b_emb).astype(dtype)
    pred = [x_emb0] + [emb_all[(k - 1) * B:k * B] for k in range(1, K)]
    if tokens is None:
        # rebuild the consumed tokens from the (bit-equal) rebuilt
        # embeddings + the streamed gt embeddings: token_k = the forward's
        # teacher select. Only slots 0..K-2 are ever consumed (slot k+1
        # reads token k; there is no slot K).
        tokens = [x_emb0] + [
            jnp.where(coin_fn(k) != 0, x_emb_rows[k],
                      emb_all[(k - 1) * B:k * B])
            for k in range(1, K - 1)]
    lengths = jnp.zeros((B, 1), jnp.int32)
    for k in range(1, K):
        pk = pitch_ind_all[(k - 1) * B:k * B][:, None]
        is_eos = (pk == spec.pitch_eos) & (lengths == 0)
        lengths = jnp.where(is_eos, k, lengths)
    lengths = jnp.where(lengths == 0, K - 1, lengths)

    _, _, hf_list, hb_list, gif_all, gib_all = _summary_fwd(
        pred, lengths, wts["we_ih"], wts["we_hh"], wts["be_ih"],
        wts["be_hh"], dtype, keep_states=True)

    # ---- phase 2a: summary bi-GRU backward. The serial loop keeps only the
    # gate math and the d_gh @ w_hh.T recurrence dot: the hidden-side gate
    # projections batch upfront (states are saved), and every d_pred /
    # weight-grad dot defers into ONE batched dot after the loop.
    we_ih, we_hh, be_hh = wts["we_ih"], wts["we_hh"], wts["be_hh"]
    EH = we_hh.shape[1]
    hf_stack = jnp.concatenate(hf_list[:K], axis=0)       # states BEFORE k
    hb_stack = jnp.concatenate(hb_list[:K], axis=0)
    ghf_all = (dot(hf_stack, we_hh[0]) + be_hh[0:1, :]).reshape(
        K, B, 3 * EH)
    ghb_all = (dot(hb_stack, we_hh[1]) + be_hh[1:2, :]).reshape(
        K, B, 3 * EH)

    d_gif_steps = [None] * K            # fwd dir, step k consumed pred[k]
    d_ghf_steps = [None] * K
    d_gib_steps = [None] * K            # bwd dir, step k consumed pred[K-1-k]
    d_ghb_steps = [None] * K
    d_hf = d_summ[:, :EH].astype(f32)
    d_hb = d_summ[:, EH:].astype(f32)
    for k in range(K - 1, -1, -1):
        mf = (k < lengths).astype(f32)
        hf_prev = hf_list[k]
        _, (r, z, n, h_n) = _gru_gates(gif_all[k], ghf_all[k], hf_prev)
        d_gi, dh_prev, d_gh = _gru_bwd(mf * d_hf, hf_prev, r, z, n, h_n,
                                       we_hh[0])
        d_gif_steps[k], d_ghf_steps[k] = d_gi, d_gh
        d_hf = (1.0 - mf) * d_hf + dh_prev

        kb = K - 1 - k
        mb = (kb < lengths).astype(f32)
        hb_prev = hb_list[k]
        _, (rb, zb, nb, h_nb) = _gru_gates(gib_all[kb], ghb_all[k], hb_prev)
        d_gib, dhb_prev, d_ghb = _gru_bwd(mb * d_hb, hb_prev, rb, zb, nb,
                                          h_nb, we_hh[1])
        d_gib_steps[k], d_ghb_steps[k] = d_gib, d_ghb
        d_hb = (1.0 - mb) * d_hb + dhb_prev

    pred_stack = jnp.concatenate(pred, axis=0)            # (K*B, E) slot k
    d_gif_all = jnp.concatenate(d_gif_steps, axis=0)      # slot order == step
    d_ghf_all = jnp.concatenate(d_ghf_steps, axis=0)      # step order
    # bwd direction: step k consumed pred[K-1-k] -> slot order = reversed
    d_gib_slot = jnp.concatenate(d_gib_steps[::-1], axis=0)
    d_ghb_all = jnp.concatenate(d_ghb_steps, axis=0)      # step order
    hbk = tokens[0].shape[-1]
    d_pred_all = (dot(d_gif_all, we_ih[0].T) +
                  dot(d_gib_slot, we_ih[1].T)).reshape(K, B, hbk)
    add("we_ih", jnp.stack([wgrad(pred_stack, d_gif_all),
                            wgrad(pred_stack, d_gib_slot)]))
    add("we_hh", jnp.stack([wgrad(hf_stack, d_ghf_all),
                            wgrad(hb_stack, d_ghb_all)]))
    add("be_ih", jnp.concatenate(
        [jnp.sum(d_gif_all, axis=0, keepdims=True),
         jnp.sum(d_gib_slot, axis=0, keepdims=True)]))
    add("be_hh", jnp.concatenate(
        [jnp.sum(d_ghf_all, axis=0, keepdims=True),
         jnp.sum(d_ghb_all, axis=0, keepdims=True)]))
    flush("we_ih", "we_hh", "be_ih", "be_hh")

    # ---- phase 2b: duration-chain + head backward, batched over slots
    # (the chains were rebuilt in phase 1; the only cross-slot path is the
    # note-GRU hidden chain, handled in phase 2c).
    def dur_in(w):
        # step-w input token + its hoisted projection, rebuilt from the
        # stashed bits. bit is {0,1}; b*row1 + (1-b)*row0 is value-exact for
        # finite rows (the not-taken branch contributes exactly zero).
        if w == 0:
            return (jnp.broadcast_to(dur_sos, (KB, W)).astype(dtype),
                    jnp.broadcast_to(gi_d_sos, (KB, gi_d_sos.shape[-1])))
        # i1-compare -> f32 (Mosaic cannot legalize a direct i32 sitofp)
        b1 = (bits[w - 1][:, None] == 1).astype(f32)
        return ((col_w == bits[w - 1][:, None]).astype(dtype),
                b1 * gi_d_row1 + (1.0 - b1) * gi_d_row0)

    # duration backward, batched over slots (feedback tokens carry no grad)
    d_hd = jnp.zeros((KB, hds[0].shape[-1]), f32)
    for w in range(W - 1, -1, -1):
        d_logit = d_dur_rows[w] if loss_md is not None else \
            d_dur[:, w].reshape(KB, 2).astype(f32)
        add("w_dout", wgrad(hds[w + 1], d_logit))
        add("b_dout", jnp.sum(d_logit, axis=0, keepdims=True))
        d_hd = d_hd + dot(d_logit, w_dout.T)
        token_w, gi_d_w = dur_in(w)
        gh_w = (dot(hds[w], w_dcomb) + b_dcomb)[:, _DUR_PAD:]
        _, (r, z, n, h_n) = _gru_gates(gi_d_w, gh_w, hds[w])
        d_gi_d, d_hd, d_gh_d = _gru_bwd(d_hd, hds[w], r, z, n, h_n,
                                        wts["w_dhh"])
        add("w_dih", wgrad(token_w, d_gi_d))
        add("b_dih", jnp.sum(d_gi_d, axis=0, keepdims=True))
        add("w_dhh", wgrad(hds[w], d_gh_d))
        add("b_dhh", jnp.sum(d_gh_d, axis=0, keepdims=True))
        if w == 0:
            add("dur_sos",
                jnp.sum(dot(d_gi_d, w_dih.T), axis=0, keepdims=True))
    flush("w_dout", "b_dout", "w_dih", "b_dih", "w_dhh", "b_dhh", "dur_sos")

    # project the chains' cotangents back to the note hiddens, batched.
    # w_dhid's weight grad is computed from the H / est halves separately:
    # the rows of a [A | B]^T @ d product are disjoint in A and B, so this
    # is bit-identical to wgrad(concat, d) — and it lets the (KB, NH+P)
    # dhid_in_all concat die right after the hd0_all dot (~4.6M of VMEM
    # liveness at 256-row blocks).
    d_dhid_in = dot(d_hd, w_dhid.T)                       # (KB, NH + P)
    add("w_dhid",
        jnp.concatenate([wgrad(H_all, d_hd), wgrad(est_all, d_hd)]))
    add("b_dhid", jnp.sum(d_hd, axis=0, keepdims=True))
    d_est = (d_pitch_flat if loss_md is not None else
             d_pitch.reshape(KB, P).astype(f32)) + d_dhid_in[:, nh:]
    add("w_pitch", wgrad(H_all, d_est))
    add("b_pitch", jnp.sum(d_est, axis=0, keepdims=True))
    dh_inj = (d_dhid_in[:, :nh] + dot(d_est, w_pitch.T)).reshape(
        K - 1, B, nh)
    flush("w_dhid", "b_dhid", "w_pitch", "b_pitch")

    # ---- phase 2c: note-GRU reverse recurrence. Only the gate math and the
    # d_gh @ w_hh.T dot are serially dependent; the gate-projection dots for
    # slot k-1 issue one iteration EARLY so their latency hides behind the
    # recurrence, and the d_token dots / weight grads ride off-path.
    w_ih_tok, w_hh, b_hh = wts["w_ih_tok"], wts["w_hh"], wts["b_hh"]

    def note_gates(k):
        return (gi_frame + dot(tokens[k - 1], w_ih_tok),
                dot(hs[k - 1], w_hh) + b_hh)

    d_gi_frame = jnp.zeros((B, 3 * nh), f32)
    dh_next = jnp.zeros((B, nh), f32)       # d wrt h_k flowing down the chain
    d_token = [jnp.zeros((B, hbk), f32) for _ in range(K)]
    gigh = note_gates(K - 1)
    for k in range(K - 1, 0, -1):
        gi_k, gh_k = gigh
        if k > 1:
            gigh = note_gates(k - 1)
        _, (r, z, n, h_n) = _gru_gates(gi_k, gh_k, hs[k - 1])
        dh_k = dh_next + dh_inj[k - 1]
        d_gi, dh_prev, d_gh = _gru_bwd(dh_k, hs[k - 1], r, z, n, h_n, w_hh)
        add("w_hh", wgrad(hs[k - 1], d_gh))
        add("b_hh", jnp.sum(d_gh, axis=0, keepdims=True))
        add("w_ih_tok", wgrad(tokens[k - 1], d_gi))
        d_gi_frame = d_gi_frame + d_gi
        d_token[k - 1] = dot(d_gi, w_ih_tok.T)
        dh_next = dh_prev
    flush("w_hh", "b_hh", "w_ih_tok")

    # ---- phase 2d: emb grads + x_emb cotangents, batched over slots.
    # emb_k feeds the summary (d_pred) and, when the coin keeps the model
    # token, the next slot's input (d_token); the ground-truth branch routes
    # d_token into d_x_emb instead. Slot 0's token IS x_emb[:, 0].
    d_emb_rows = []
    d_x_rows = [(d_token[0] + d_pred_all[0]).astype(dtype)]
    for k in range(1, K):
        coin = coin_fn(k) != 0
        d_tok_k = d_token[k]
        d_emb_rows.append(d_pred_all[k] + jnp.where(coin, 0.0, d_tok_k))
        d_x_rows.append(jnp.where(coin, d_tok_k, 0.0).astype(dtype))
    d_emb_all = jnp.concatenate(d_emb_rows, axis=0)       # (KB, E) slot k=1..
    add("w_emb", wgrad(emb_in_all, d_emb_all))
    add("b_emb", jnp.sum(d_emb_all, axis=0, keepdims=True))
    flush("w_emb", "b_emb")

    # h0 and gi_frame inputs
    add("w_t2n", wgrad(frame_h, dh_next))
    add("b_t2n", jnp.sum(dh_next, axis=0, keepdims=True))
    add("w_ih_frame", wgrad(frame_h, d_gi_frame))
    add("b_ih", jnp.sum(d_gi_frame, axis=0, keepdims=True))
    d_frame_h = dot(dh_next, wts["w_t2n"].T) + \
        dot(d_gi_frame, w_ih_frame.T)
    flush("w_t2n", "b_t2n", "w_ih_frame", "b_ih")
    return d_frame_h, d_x_rows


def _bwd_kernel(spec: PianoTreeSpec, nh: int, loss_mode: bool, *args):
    (coins_ref, frame_h_ref, x_emb_ref, hs_in_ref, *rest) = args
    if loss_mode:
        gt_pitch_ref, gt_dur_ref, d_nums_ref = rest[:3]
        rest = rest[3:]
    refs = rest[:24]
    if loss_mode:
        d_pitch_ref = d_dur_ref = None
        d_summ_ref = rest[24]
        rest = rest[25:]
    else:
        d_pitch_ref, d_dur_ref, d_summ_ref = rest[24:27]
        rest = rest[27:]
    d_frame_h_ref, d_x_emb_ref = rest[:2]
    grad_refs = rest[2:]                    # one per _WNAMES entry, in order
    K, W = spec.max_simu_note, spec.dur_width

    # zero the accumulated weight-grad outputs on the first grid block
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in grad_refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    acc = {}
    ref_by_name = dict(zip(_WNAMES, grad_refs))

    def add(name, val):
        acc[name] = val if name not in acc else acc[name] + val

    def flush(*names):
        # fold completed accumulators into the grad refs immediately so the
        # f32 grad values don't all stay live until the end of the kernel
        # (they dominated the register-allocator spill slots)
        for name in names:
            ref = ref_by_name[name]
            ref[...] += acc.pop(name).astype(ref.dtype)

    loss_md = None
    if loss_mode:
        gt_p, gt_d = _gt_cat(spec, gt_pitch_ref, gt_dur_ref)
        loss_md = dict(gt_pitch=gt_p, gt_dur=gt_d,
                       g_pitch=d_nums_ref[0, 0],
                       g_dur=[d_nums_ref[0, 1 + w] for w in range(W)])
    wts = dict(zip(_WNAMES, (r[:] for r in refs)))
    d_frame_h, d_x_rows = _frame_bwd_core(
        spec, nh, wts, lambda k: coins_ref[k - 1, 0], frame_h_ref[:],
        [hs_in_ref[k] for k in range(K)], None, x_emb_ref[0],
        None if loss_mode else d_pitch_ref[:],
        None if loss_mode else d_dur_ref[:], d_summ_ref[:], add,
        loss_md=loss_md, flush=flush,
        x_emb_rows=[x_emb_ref[k] for k in range(K)])
    d_frame_h_ref[:] = d_frame_h.astype(d_frame_h_ref.dtype)
    d_x_emb_ref[...] = jnp.stack(d_x_rows)
    assert not acc, f"unflushed weight grads: {sorted(acc)}"


# ---------------------------------------------------------------------------
# wrapper with custom VJP
# ---------------------------------------------------------------------------

def core_weights(p: dict, cfg: ModelConfig) -> Tuple[jnp.ndarray, ...]:
    """Flatten the pianotree-decoder params into the kernel layout (same
    preparation as ar_decoder.frame_decode_pallas). The notes-GRU input
    projection is pre-split (frame part applied once per frame, token part
    per slot); dur-hidden and note-embedding weights ship WHOLE so the
    kernels use single concatenated dots (the XLA path's grouping). The last
    four entries are the stacked (fwd, bwd) summary-GRU weights."""
    th = cfg.dec_time_hidden
    ng, dg = p["notes_gru"], p["dur_gru"]
    row = lambda b: b.reshape(1, -1)
    return (
        p["time2notes"]["w"], row(p["time2notes"]["b"]),
        ng.w_ih[:th], ng.w_ih[th:], row(ng.b_ih),
        ng.w_hh, row(ng.b_hh),
        p["pitch_out"]["w"], row(p["pitch_out"]["b"]),
        p["dur_hid"]["w"], row(p["dur_hid"]["b"]),
        dg.w_ih, row(dg.b_ih), dg.w_hh, row(dg.b_hh),
        p["dur_out"]["w"], row(p["dur_out"]["b"]),
        p["note_emb"]["w"], row(p["note_emb"]["b"]),
        row(p["dur_sos"]),
        jnp.stack([p["emb_fwd"].w_ih, p["emb_bwd"].w_ih]),
        jnp.stack([p["emb_fwd"].w_hh, p["emb_bwd"].w_hh]),
        jnp.stack([p["emb_fwd"].b_ih, p["emb_bwd"].b_ih]),
        jnp.stack([p["emb_fwd"].b_hh, p["emb_bwd"].b_hh]),
    )


_BLOCK_OVERRIDE = None      # tests force a small block to exercise the grid


def _pick_block_bwd(B: int) -> int:
    # The slot-batched backward (phases 2a/2b/2d) keeps (K-1)*bt-row
    # intermediates live at once. 256-row blocks fit VMEM before the
    # chain-state stash landed; with the stash input windows
    # (double-buffered) and the shared fused-loss core the compile measures
    # 157M of the 128M space at 256 rows (v5e), so the backward now takes
    # 128-row blocks. Batches not divisible by the block are zero-padded to
    # the next multiple by the callers; padded rows contribute exactly zero
    # to the weight grads because every in-kernel cotangent is linear in
    # the zero cotangents passed for those rows.
    if _BLOCK_OVERRIDE is not None:
        return _BLOCK_OVERRIDE
    return min(B, 128)


_FWD_BLOCK = 1024
_FWD_BLOCK_STASH = 512


def _pick_block_fwd(B: int, stash: bool = False,
                    loss_mode: bool = False) -> int:
    # The primal forward keeps only the slot hiddens/tokens live (no
    # gradient stash, no f32 weight-grad accumulators), so it affords much
    # larger row blocks than the backward — fewer, fatter VPU/MXU ops for
    # the same math (the per-op issue overhead is what made the fwd kernel
    # measure ~12 ms slower than XLA's B=2048 scans at 256-row blocks).
    # The STASH forward (the VJP path) additionally streams the per-slot
    # chain hiddens (hs (K, bt, NH)) out, double-buffered: at 1024-row
    # blocks the output windows overflow the 128 MB VMEM space (measured
    # 166 MB on v5e back when the token stash also shipped); 512-row
    # blocks fit. The fused-loss mode drops the padded logit output windows
    # but computes the masked CE on the (K-1)*bt-row logits in VMEM: 512
    # rows fit for loss-only (the eval/primal program) and stash-only (the
    # nofuse VJP), but their SUM overflows — the stash+loss VJP forward
    # fails VMEM allocation at 512 on v5e (the probe's dump shows the fwd
    # pallas_call's scoped space exhausted) — so that mode takes 256.
    if _BLOCK_OVERRIDE is not None:
        return _BLOCK_OVERRIDE
    if B <= 256:
        return B
    for bt in ((256,) if (stash and loss_mode)
               else (_FWD_BLOCK_STASH, 256) if (stash or loss_mode)
               else (_FWD_BLOCK, 512, 256)):
        if B % bt == 0:
            return bt
    return 128     # minimizes padding for non-divisible batches


def _pad_rows(a, axis: int, Bp: int):
    """Zero-pad the batch dimension ``axis`` of ``a`` up to Bp rows."""
    B = a.shape[axis]
    if B == Bp:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, Bp - B)
    return jnp.pad(a, pad)


def _pad_rows_const(a, axis: int, Bp: int, val):
    """Pad the batch dimension with a CONSTANT — targets pad with their
    ignore index so padded rows mask out of the fused-loss CE sums."""
    B = a.shape[axis]
    if B == Bp:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, Bp - B)
    return jnp.pad(a, pad, constant_values=val)


def _specs(bt, coins_shape):
    """Block-spec builders. Slot-indexed tensors use SLOT-LEADING layout
    ((K, B, ...) etc.) — Mosaic cannot lower the (B, 1, X) unit-dim
    reshapes that batch-leading per-slot writes would need."""

    def batch_spec(*shape, pos=0):
        # batch dim (blocked) at position ``pos`` of the block shape
        full = shape[:pos] + (bt,) + shape[pos:]
        n = len(full)

        def imap(i, _pos=pos, _n=n):
            idx = [0] * _n
            idx[_pos] = i
            return tuple(idx)

        return pl.BlockSpec(full, imap, memory_space=pltpu.VMEM)

    def wspec(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    coin_spec = pl.BlockSpec(coins_shape, lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    return batch_spec, wspec, coin_spec


def _VMEM_LIMIT() -> int:
    # 120 MiB of the v5e's 128 MiB ceiling (8 MiB headroom was measured
    # necessary for the grid machinery); scale both to this device's VMEM
    from pctd_tpu.utils import device_mem

    return int(device_mem.vmem_bytes() * 120 / 128)


def _fwd_call(spec, eh, nh, weights, frame_h, x_emb_t, coins, interpret,
              stash=False, gt=None):
    """``gt`` = (gt_pitch (B, K-1) i32, gt_dur (B, (K-1)*W) i32) selects
    fused-loss mode: the pitch/dur logits never leave VMEM and the first
    public output is the (1, NUMS_W) masked-CE numerator partials row
    instead of the logits."""
    B = frame_h.shape[0]
    K, W, P = spec.max_simu_note, spec.dur_width, spec.pitch_range
    E = x_emb_t.shape[-1]
    bt = _pick_block_fwd(B, stash=stash, loss_mode=gt is not None)
    Bp = -(-B // bt) * bt               # pad batch to a block multiple
    grid = (Bp // bt,)
    dtype = frame_h.dtype
    batch_spec, wspec, coin_spec = _specs(bt, coins.shape)

    frame_h = _pad_rows(frame_h, 0, Bp)
    x_emb_kbe = _pad_rows(jnp.swapaxes(x_emb_t, 0, 1), 1, Bp)   # (K, Bp, E)
    gt_args = ()
    gt_specs = []
    if gt is not None:
        gt_pitch, gt_dur = gt
        gt_args = (_pad_rows_const(gt_pitch, 0, Bp, spec.pitch_pad),
                   _pad_rows_const(gt_dur, 0, Bp, spec.dur_pad))
        gt_specs = [batch_spec(K - 1), batch_spec((K - 1) * W)]
    in_specs = ([coin_spec, batch_spec(frame_h.shape[1]),
                 batch_spec(K, E, pos=1)] + gt_specs
                + [wspec(w) for w in weights])
    if gt is not None:
        out_shape = [jax.ShapeDtypeStruct((1, NUMS_W), jnp.float32)]
        out_specs = [pl.BlockSpec((1, NUMS_W), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((K - 1, Bp, P), dtype),
            jax.ShapeDtypeStruct((K - 1, W, Bp, 2), dtype),
        ]
        out_specs = [batch_spec(K - 1, P, pos=1),
                     batch_spec(K - 1, W, 2, pos=2)]
    out_shape += [jax.ShapeDtypeStruct((Bp, 2 * eh), dtype),
                  jax.ShapeDtypeStruct((Bp, 1), jnp.int32)]
    out_specs += [batch_spec(2 * eh), batch_spec(1)]
    if stash:
        out_shape += [jax.ShapeDtypeStruct((K, Bp, nh), dtype)]
        out_specs += [batch_spec(K, nh, pos=1)]
    kernel = functools.partial(_fwd_kernel, spec, gt is not None)
    outs = pl.pallas_call(
        kernel, grid=grid, out_shape=tuple(out_shape), in_specs=in_specs,
        out_specs=tuple(out_specs), interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT()),
    )(coins, frame_h, x_emb_kbe, *gt_args, *weights)
    if gt is not None:
        nums, summ, lengths = outs[:3]
        public = (nums, summ[:B], lengths[:B, 0])
        rest = outs[3:]
    else:
        pitch, dur, summ, lengths = outs[:4]
        public = (jnp.swapaxes(pitch[:, :B], 0, 1),
                  jnp.transpose(dur[:, :, :B], (2, 0, 1, 3)),
                  summ[:B], lengths[:B, 0])
        rest = outs[4:]
    if not stash:
        return public
    return public, rest[0][:, :B]                      # (K, B, NH)


def _bwd_call(spec, nh, eh, weights, frame_h, x_emb_t, coins,
              hs_st, d_pitch, d_dur, d_summ, interpret, gt=None):
    """``gt`` = (gt_pitch (B, K-1) i32, gt_dur (B, (K-1)*W) i32, d_nums
    (1, NUMS_W) f32) selects fused-loss mode: d_pitch/d_dur are None and the
    logit cotangents are computed in-kernel from the targets."""
    B = frame_h.shape[0]
    K, W, P = spec.max_simu_note, spec.dur_width, spec.pitch_range
    bt = _pick_block_bwd(B)
    Bp = -(-B // bt) * bt               # pad batch to a block multiple
    grid = (Bp // bt,)
    E = x_emb_t.shape[-1]
    batch_spec, wspec, coin_spec = _specs(bt, coins.shape)

    frame_h = _pad_rows(frame_h, 0, Bp)
    d_summ = _pad_rows(d_summ, 0, Bp)
    x_emb_kbe = _pad_rows(jnp.swapaxes(x_emb_t, 0, 1), 1, Bp)    # (K, Bp, E)
    hs_st = _pad_rows(hs_st, 1, Bp)                              # (K, Bp, NH)
    if gt is not None:
        gt_pitch, gt_dur, d_nums = gt
        ct_args = (_pad_rows_const(gt_pitch, 0, Bp, spec.pitch_pad),
                   _pad_rows_const(gt_dur, 0, Bp, spec.dur_pad), d_nums)
        ct_specs = [batch_spec(K - 1), batch_spec((K - 1) * W),
                    pl.BlockSpec(d_nums.shape, lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)]
    else:
        d_pitch_k = _pad_rows(jnp.swapaxes(d_pitch, 0, 1), 1, Bp)
        d_dur_k = _pad_rows(jnp.transpose(d_dur, (1, 2, 0, 3)), 2, Bp)
        ct_args = (d_pitch_k, d_dur_k)
        ct_specs = [batch_spec(K - 1, P, pos=1),
                    batch_spec(K - 1, W, 2, pos=2)]

    # loss mode: target/d_nums inputs ride BEFORE the weights in kernel arg
    # order; logit cotangents come after (matching _bwd_kernel's unpacking)
    in_specs = ([coin_spec, batch_spec(frame_h.shape[1]),
                 batch_spec(K, E, pos=1),
                 batch_spec(K, hs_st.shape[-1], pos=1)]
                + (ct_specs if gt is not None else [])
                + [wspec(w) for w in weights]
                + ([] if gt is not None else ct_specs)
                + [batch_spec(2 * eh)])
    # outputs: per-block d_frame_h, d_x_emb + accumulated f32 weight grads
    out_shape = [jax.ShapeDtypeStruct((Bp, frame_h.shape[1]), frame_h.dtype),
                 jax.ShapeDtypeStruct((K, Bp, E), frame_h.dtype)]
    out_specs = [batch_spec(frame_h.shape[1]), batch_spec(K, E, pos=1)]
    for w in weights:
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(wspec(w))
    kernel = functools.partial(_bwd_kernel, spec, nh, gt is not None)
    args = ((coins, frame_h, x_emb_kbe, hs_st)
            + (ct_args if gt is not None else ()) + tuple(weights)
            + (() if gt is not None else ct_args) + (d_summ,))
    outs = pl.pallas_call(
        kernel, grid=grid, out_shape=tuple(out_shape),
        in_specs=in_specs, out_specs=tuple(out_specs), interpret=interpret,
        # the slot-batched backward sits right at the VMEM ceiling at
        # 256-row blocks — grant it the full space (measured 123M peak)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(*args)
    d_frame_h, d_x_emb = outs[0][:B], jnp.swapaxes(outs[1][:, :B], 0, 1)
    d_weights = tuple(g.astype(w.dtype)
                      for g, w in zip(outs[2:], weights))
    return d_frame_h, d_x_emb, d_weights


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def frame_core(cfg: ModelConfig, interpret: bool,
               weights, frame_h, x_emb_t, coins):
    """Teacher-forced frame decode (note + duration levels + predicted-frame
    bi-GRU summary) as one kernel.

    weights: tuple from :func:`core_weights`; frame_h (B, TH);
    x_emb_t (B, K, E) ground-truth note embeddings; coins (K-1, 1) int32
    teacher flags for slots 1..K-1.
    Returns (pitch_logits (B, K-1, P), dur_logits (B, K-1, W, 2),
             pred_summary (B, 2*emb_hidden), lengths (B,) i32).
    """
    return _fwd_call(cfg.pianotree, cfg.dec_emb_hidden, cfg.dec_notes_hidden,
                     weights, frame_h, x_emb_t, coins, interpret)


def _frame_core_fwd(cfg, interpret, weights, frame_h, x_emb_t, coins):
    # stash=True ships the serial-chain slot hiddens to the backward so it
    # runs no serial forward recompute (it rebuilds the consumed tokens
    # from these + the gt embeddings it streams in anyway). The kernel path
    # runs WITHOUT jax.checkpoint (wrapping it replays the fwd kernel
    # redundantly, measured 6275 vs 7449 seg/s), so the stash of all
    # T frames is live across the fwd/bwd gap: ~1.07 GB at B=2048 bf16
    # canonical dims — a few ms of HBM traffic against a 16 GB chip.
    out, hs_st = _fwd_call(
        cfg.pianotree, cfg.dec_emb_hidden, cfg.dec_notes_hidden, weights,
        frame_h, x_emb_t, coins, interpret, stash=True)
    return out, (weights, frame_h, x_emb_t, coins, hs_st)


def _frame_core_bwd(cfg, interpret, res, cts):
    weights, frame_h, x_emb_t, coins, hs_st = res
    d_pitch, d_dur, d_summ, _ = cts
    d_frame_h, d_x_emb, d_weights = _bwd_call(
        cfg.pianotree, cfg.dec_notes_hidden, cfg.dec_emb_hidden, weights,
        frame_h, x_emb_t, coins, hs_st, d_pitch, d_dur, d_summ,
        interpret)
    d_coins = np.zeros(coins.shape, jax.dtypes.float0)
    return d_weights, d_frame_h, d_x_emb, d_coins


frame_core.defvjp(_frame_core_fwd, _frame_core_bwd)


# ---------------------------------------------------------------------------
# fused-loss wrapper: CE numerators instead of logits (per-frame variant of
# the time-level GRU stays an XLA scan)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def frame_recon_partials(cfg: ModelConfig, interpret: bool, weights,
                         frame_h, x_emb_t, coins, gt_pitch, gt_dur):
    """One frame's teacher-forced decode FUSED WITH the reconstruction-CE
    numerators: the pitch/dur logits never leave VMEM (the backward rebuilds
    them bit-equal from the slot-hidden stash and computes the masked-CE
    gradient in place), killing the padded logit round-trips — the dur
    tensor's 2-wide lane pads to 128 in HBM, ~1.3 GB/pass at B=2048
    canonical dims across the 32 frames.

    weights: tuple from :func:`core_weights`; frame_h (B, TH); x_emb_t
    (B, K, E) gt note embeddings; coins (K-1, 1) i32; gt_pitch (B, K-1) i32
    = x[:, t, 1:, 0]; gt_dur (B, (K-1)*W) i32 = x[:, t, 1:, 1:] flattened
    (reference recon-loss targets, ptvae.py:498-529).
    Returns ((1 + W,) f32 masked-CE numerator partials [pitch, dur bit 0..W),
    pred_summary (B, 2*emb_hidden)); the caller divides by the mask counts
    (and applies loss weights / psums) in XLA.
    """
    spec = cfg.pianotree
    nums, summ, _ = _fwd_call(
        spec, cfg.dec_emb_hidden, cfg.dec_notes_hidden, weights, frame_h,
        x_emb_t, coins, interpret, gt=(gt_pitch, gt_dur))
    return nums[0, :1 + spec.dur_width], summ


def _frame_recon_fwd(cfg, interpret, weights, frame_h, x_emb_t, coins,
                     gt_pitch, gt_dur):
    spec = cfg.pianotree
    (nums, summ, _), hs_st = _fwd_call(
        spec, cfg.dec_emb_hidden, cfg.dec_notes_hidden, weights, frame_h,
        x_emb_t, coins, interpret, stash=True, gt=(gt_pitch, gt_dur))
    return (nums[0, :1 + spec.dur_width], summ), (
        weights, frame_h, x_emb_t, coins, gt_pitch, gt_dur, hs_st)


def _frame_recon_bwd(cfg, interpret, res, cts):
    weights, frame_h, x_emb_t, coins, gt_pitch, gt_dur, hs_st = res
    d_nums, d_summ = cts
    spec = cfg.pianotree
    row = jnp.zeros((1, NUMS_W), jnp.float32)
    row = row.at[0, :1 + spec.dur_width].set(d_nums.astype(jnp.float32))
    d_frame_h, d_x_emb, d_weights = _bwd_call(
        cfg.pianotree, cfg.dec_notes_hidden, cfg.dec_emb_hidden, weights,
        frame_h, x_emb_t, coins, hs_st, None, None, d_summ, interpret,
        gt=(gt_pitch, gt_dur, row))
    zero = lambda c: np.zeros(c.shape, jax.dtypes.float0)
    return (d_weights, d_frame_h, d_x_emb, zero(coins), zero(gt_pitch),
            zero(gt_dur))


frame_recon_partials.defvjp(_frame_recon_fwd, _frame_recon_bwd)
