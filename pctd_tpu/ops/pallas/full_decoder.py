"""Pallas TPU kernel: the ENTIRE autoregressive grid decode in one kernel.

The per-frame kernel (ar_decoder) still returns to XLA between frames: 32
kernel launches, 32 weight re-DMAs, and the time-level GRU + summary
feedback run as XLA ops with HBM round-trips on the serial path. This
kernel keeps the WHOLE decode loop on-chip: weights load once, all three
levels (time GRU + 15-slot note chain x (combined slot matmul + 5-step dur
chain) + masked bi-GRU summary feedback) execute back-to-back on-chip, and
the only HBM traffic is z-derived inputs in and the (T, B, K-1) grids out.

Serial-chain design: see ar_decoder's module docstring — the slot loop and
summary are the SAME code (_slot_chain/_summary_from_raws), so the two
kernels cannot drift apart. This kernel adds the frame level on-chip:

- the chain-critical frame projections — the note-level init (w_t2n) and
  the notes-GRU frame-share input projection (w_ih_frame) — are ONE
  combined matmul from h_time (128-aligned blocks, column slices exact);
  the time-GRU hidden projection (wt_hh, not needed until the next frame)
  is a separate dot issued after it, overlapping the frame decode.

Semantics identical to pianotree_decoder.decode(p, cfg, z,
fold_heads=True) inference mode (reference ptvae.py:430-491 with argmax
feedback): verified vs the XLA path in interpret mode and on device
(tests/test_pallas_decoder.py).

VMEM budget (canonical dims, f32): ~30 MB of weights + ~2 MB activations at
B=128 — comfortable on a v5e core (~128 MB). The time loop is a
``fori_loop`` (32 iterations of straight-line slot code); the inner K-1
note slots and W dur steps are Python-unrolled at trace time into
unrolled straight-line code.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pctd_tpu.config import ModelConfig, PianoTreeSpec
from pctd_tpu.ops.pallas.ar_decoder import (_gru_pre, _pack_cols,
                                            _slot_chain, _summary_from_raws,
                                            _up128, folded_frame_weights)
from pctd_tpu.utils.init import dense_apply


def _frame_layout(cfg: ModelConfig):
    """Column offsets of the combined per-frame weight ``w_frame`` =
    [w_t2n | w_ih_frame], each block start 128-aligned. The time-GRU
    hidden projection (wt_hh, 3 TH wide) stays a separate dot issued after
    this one: it is not needed until the next frame, while these two gate
    the whole slot chain (same split rationale as ar_decoder._slot_layout)."""
    o_gif = _up128(cfg.dec_notes_hidden)
    total = o_gif + _up128(3 * cfg.dec_notes_hidden)
    return o_gif, total


def _full_kernel(spec: PianoTreeSpec, T: int, layout, frame_layout,
                 h0_ref, gi_z_ref, token0_ref, sos_emb_ref,
                 wt_tok_ref, wt_hh_ref, bt_hh_ref,
                 w_frame_ref, b_frame_ref, b_raw_gi_ref,
                 w_hh_ref, b_hh_ref, w_slot_ref, b_slot_ref,
                 w_pitch_gi_ref, w_dur_gi_ref, gi_tok_sos_ref,
                 w_dih_ref, b_dih_ref, w_dcomb_ref, b_dcomb_ref,
                 dur_sos_ref, w_emb_ref, b_emb_ref,
                 we_ih_ref, we_hh_ref, be_ih_ref, be_hh_ref,
                 out_ref):
    K = spec.max_simu_note
    W = spec.dur_width
    B = h0_ref.shape[0]
    o_gif, _ = frame_layout
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    gi_z = gi_z_ref[:]
    sos_emb = sos_emb_ref[:]
    NH = w_slot_ref.shape[0]
    NH3 = 3 * NH

    def frame(t, hid, gi_frame):
        """One frame's note+dur decode; writes outputs at time t, returns
        the masked bi-GRU summary of the predicted notes."""
        def emit(k, pitch_ind, dur_bits):
            # One full (8, B) tile store per slot into the (T, K-1, 8, B)
            # ref: rows = [pitch | W dur bits | zero pad]. Both store
            # indices (dynamic t, static k-1) land on UNTILED leading dims
            # and the stored block is exactly one (8, lanes) tile at
            # sublane offset 0 — the only store shape Mosaic accepts
            # unconditionally. (The original 2D rows-first layout stored at
            # sublane offset slot*W — not 8-aligned; MosaicError "cannot
            # statically prove that index in dimension 0 is a multiple of
            # 8" at B=512.)
            block = jnp.concatenate(
                [pitch_ind[None], dur_bits.T,
                 jnp.zeros((7 - W, B), jnp.int32)], axis=0)
            out_ref[t, k - 1] = block

        raws, lengths = _slot_chain(
            spec, layout, hid, gi_frame,
            w_hh_ref, b_hh_ref, w_slot_ref, b_slot_ref,
            w_pitch_gi_ref, w_dur_gi_ref, gi_tok_sos_ref,
            w_dih_ref, b_dih_ref, w_dcomb_ref, b_dcomb_ref,
            dur_sos_ref, emit)
        hf, hb = _summary_from_raws(spec, raws, sos_emb, lengths,
                                    w_emb_ref, b_emb_ref,
                                    we_ih_ref, we_hh_ref,
                                    be_ih_ref, be_hh_ref, hid.dtype)
        return jnp.concatenate([hf, hb], axis=-1)

    def body(t, carry):
        h_time, gh_time, token = carry
        gi = gi_z + dot(token, wt_tok_ref[:])
        h_time = _gru_pre(gi, gh_time, h_time)
        # chain-critical dot FIRST: [note-level init | notes-GRU
        # frame-share gi] gates the whole slot chain; the next frame's
        # time-GRU hidden projection issues after it and overlaps the
        # frame decode below
        Yf = dot(h_time, w_frame_ref[:]) + b_frame_ref[:]
        gh_time = dot(h_time, wt_hh_ref[:]) + bt_hh_ref[:]
        hid = Yf[:, 0:NH]
        gi_frame = Yf[:, o_gif:o_gif + NH3] + b_raw_gi_ref[:]
        summary = frame(t, hid, gi_frame)
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
    if W > 7:
        # the per-slot (8, B) output tile packs [1 pitch row | W dur rows |
        # (7-W) pad rows]; a wider dur code needs a 16-row tile + a matching
        # out_shape/unpack, which no shipped config uses
        raise ValueError(
            f"decode_grid_fused supports dur_width <= 7 (got {W}): the "
            "slot store uses one 8-row sublane tile of [pitch | dur bits | "
            "pad]. Use frame_decoder='pallas' or 'xla' for wider dur codes.")

    from pctd_tpu.models.pianotree_decoder import sos_token_raw

    h0 = dense_apply(p["z2hid"], z)
    z_in = dense_apply(p["z2in"], z)
    sos_emb = dense_apply(p["note_emb"],
                          sos_token_raw(spec).astype(p["note_emb"]["w"].dtype))
    sos_emb = jnp.broadcast_to(sos_emb, (B, sos_emb.shape[-1]))
    token0 = jnp.broadcast_to(p["init_input"], (B, p["init_input"].shape[-1]))
    tok_dim = token0.shape[-1]
    tg = p["time_gru"]
    gi_z = z_in @ tg.w_ih[tok_dim:] + tg.b_ih

    layout, frame_proj, slot_args, summary_args = folded_frame_weights(
        p, cfg)
    w_ih_frame, b_ih, b_raw_gi = frame_proj
    frame_layout = _frame_layout(cfg)
    w_frame, b_frame = _pack_cols(
        [(p["time2notes"]["w"], p["time2notes"]["b"]),
         (w_ih_frame, b_ih[0])], frame_layout[-1])

    args = (h0, gi_z, token0, sos_emb,
            tg.w_ih[:tok_dim], tg.w_hh, tg.b_hh.reshape(1, -1),
            w_frame, b_frame, b_raw_gi,
            ) + slot_args + summary_args

    kernel = functools.partial(_full_kernel, spec, T, layout, frame_layout)

    # Grid over the batch in 128-lane blocks: Mosaic compile time for this
    # kernel explodes with the lane width (B=128 compiles in ~14 s on v5e;
    # B=300 crashes the compile helper, B=512 hangs it >40 min), so we never
    # compile a wider-than-128 kernel body. Each grid step decodes one
    # 128-row batch slab; the ~30 MB of weights have constant index maps, so
    # the Pallas pipeline keeps them resident in VMEM across steps instead
    # of re-DMAing. Batches that are not a multiple of 128 are zero-padded
    # (rows are independent; pad rows compute garbage that is sliced off).
    bblk = min(B, 128)
    nb = -(-B // bblk)
    Bp = nb * bblk
    n_batch_args = 4  # h0, gi_z, token0, sos_emb — the only (B, d) inputs
    if Bp != B:
        args = tuple(
            jnp.pad(a, ((0, Bp - B), (0, 0))) if j < n_batch_args else a
            for j, a in enumerate(args))
    in_specs = [
        pl.BlockSpec((bblk, a.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for a in args[:n_batch_args]
    ] + [
        pl.BlockSpec(a.shape, functools.partial(
            lambda nd, i: (0,) * nd, a.ndim), memory_space=pltpu.VMEM)
        for a in args[n_batch_args:]
    ]
    # (T, K-1, 8, B): one (8, B) tile per (frame, slot) — row 0 pitch,
    # rows 1..W dur bits, rest pad (see emit in _full_kernel for why)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((T, K - 1, 8, Bp), jnp.int32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, K - 1, 8, bblk),
                               lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        # ~30 MB of resident weights + activations exceed the default 16 MB
        # scoped-VMEM budget; a v5e core has ~128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    out = out[..., :B]
    pitch_idx = out[:, :, 0, :].transpose(2, 0, 1)
    dur_bits = out[:, :, 1:1 + W, :].transpose(3, 0, 1, 2)
    return jnp.concatenate([pitch_idx[..., None], dur_bits], axis=-1)
