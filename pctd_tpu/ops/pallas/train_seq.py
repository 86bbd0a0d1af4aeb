"""Pallas TPU kernels: the ENTIRE teacher-forced decode (time + note + dur
levels) fused into one forward and one backward kernel.

The per-frame training kernel (ops/pallas/train_frame) still returns to XLA
between frames: the time-level GRU and the teacher/predicted token select run
as XLA ops, the lax.scan writes its (h, token) carry to HBM every frame, and
each frame pays a separate kernel launch forward and backward (reference
semantics: the 32-step time loop of ptvae.py:430-491 around the per-frame
note/dur decode of ptvae.py:370-428). This module folds the time level INTO
the kernel — VERDICT.md round-1 item 3's named lever:

- grid = (batch_blocks, T) with the LAST dimension innermost, so for a fixed
  batch block the frames run t = 0..T-1 back-to-back on-chip; the time-GRU
  carry (h_t, token_t) lives in VMEM scratch across grid steps instead of an
  XLA scan carry in HBM;
- all weights (frame levels + time GRU) stay VMEM-resident across the whole
  sequence — the per-frame kernel re-DMAs them 32x per pass;
- the backward iterates t = T-1..0 (reversed index maps), carries the
  (d_h, d_token) cotangents in scratch, and accumulates ALL weight
  gradients in f32 VMEM across the full (blocks x T) grid — the per-frame
  path materializes per-frame weight grads to HBM and tree-sums them in XLA.

The frame math is shared with train_frame.py (_run_forward forward,
_frame_bwd_core hand-differentiated backward), so the two kernels cannot
drift: the sequence kernel adds ONLY the time-GRU cell, the token select
``token_{t+1} = where(coin1_t, gt_summary_t, pred_summary_t)`` and their
backward.

Like the per-frame kernel, the forward stashes the serial-chain states (time
hiddens + time tokens + per-slot note hiddens/tokens) on the differentiation
path; the backward rebuilds everything else with batched dots (bit-equal
argmax decisions) and runs no serial forward recompute. The stash is
whole-sequence here (~1.4 GB at B=2048 bf16 canonical dims — a few ms of HBM
traffic against a ~16 GB chip).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pctd_tpu.config import ModelConfig
from pctd_tpu.ops.pallas.train_frame import (NUMS_W, _WNAMES, _ce_nll_sum,
                                             _frame_bwd_core, _gru_bwd,
                                             _gru_gates, _gt_cat, _pad_rows,
                                             _pad_rows_const, _run_forward,
                                             _summary_fwd, core_weights)

_SEQ_WNAMES = _WNAMES + ("wt_tok", "wt_hh", "bt_hh")


def seq_weights(p: dict, cfg: ModelConfig):
    """Frame-kernel weight tuple + the time-GRU weights. The z share of the
    time-GRU input projection is NOT shipped: the caller precomputes
    ``gi_z = z_in @ w_ih[tok:] + b_ih`` once (it is frame-invariant) and the
    kernel adds the token share per step — the same hoist as the XLA path
    (pianotree_decoder.decode) and the fused inference kernel."""
    tok_dim = 2 * cfg.dec_emb_hidden
    tg = p["time_gru"]
    return core_weights(p, cfg) + (
        tg.w_ih[:tok_dim], tg.w_hh, tg.b_hh.reshape(1, -1))


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _seq_fwd_kernel(spec, T: int, loss_mode: bool, *args):
    (coins1_ref, coins2_ref, h0_ref, token0_ref, gi_z_ref, x_emb_ref,
     x_sum_ref, *rest) = args
    if loss_mode:
        gt_pitch_ref, gt_dur_ref = rest[:2]
        rest = rest[2:]
    refs = rest[:20]
    we_ih_ref, we_hh_ref, be_ih_ref, be_hh_ref = rest[20:24]
    wt_tok_ref, wt_hh_ref, bt_hh_ref = rest[24:27]
    outs = rest[27:]
    pitch_ref = dur_ref = nums_ref = None
    if loss_mode:
        nums_ref = outs[0]
        outs = outs[1:]
    else:
        pitch_ref, dur_ref = outs[:2]
        outs = outs[2:]
    if len(outs) == 2:          # primal: no stash
        h_st_ref = ttok_st_ref = hs_ref = ntok_ref = None
    else:
        h_st_ref, ttok_st_ref, hs_ref, ntok_ref = outs[:4]
        outs = outs[4:]
    h_scr, tok_scr = outs
    K, W = spec.max_simu_note, spec.dur_width
    dtype = h0_ref.dtype
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        tok_scr[:] = token0_ref[:]

    h = h_scr[:]
    token = tok_scr[:]
    # time-GRU cell (reference ptvae.py:476-479): gi_z is the hoisted
    # z_in share of the input projection, the token share is per-step
    gi = gi_z_ref[:] + dot(token, wt_tok_ref[:])
    gh = dot(h, wt_hh_ref[:]) + bt_hh_ref[:]
    h_new, _ = _gru_gates(gi, gh, h)
    h_new = h_new.astype(dtype)
    if h_st_ref is not None:
        h_st_ref[:] = h_new
        ttok_st_ref[:] = token

    fwd = _run_forward(
        spec, refs, lambda k: coins2_ref[t, k - 1], h_new, x_emb_ref, dtype,
        pitch_ref=pitch_ref, dur_ref=dur_ref, keep_logits=loss_mode)
    hs, tokens, pred, lengths = fwd[:4]
    hf, hb = _summary_fwd(pred, lengths, we_ih_ref, we_hh_ref, be_ih_ref,
                          be_hh_ref, dtype)
    summ = jnp.concatenate([hf, hb], axis=-1)
    if hs_ref is not None:
        for k in range(K):
            hs_ref[k] = hs[k]
            ntok_ref[k] = tokens[k]

    if loss_mode:
        # masked-CE numerator partials (pitch + one per dur bit), summed in
        # f32 over the block and accumulated across the whole grid; the
        # logits stay in VMEM. Denominators are mask counts the XLA caller
        # computes directly from the grid targets.
        ests, dur_logits = fwd[4], fwd[5]
        gt_p, gt_d = _gt_cat(spec, gt_pitch_ref, gt_dur_ref)
        parts = [_ce_nll_sum(jnp.concatenate(ests), gt_p, spec.pitch_pad)]
        for w in range(W):
            parts.append(_ce_nll_sum(
                jnp.concatenate([dl[w] for dl in dur_logits]), gt_d[w],
                spec.dur_pad))
        row = jnp.concatenate(
            parts + [jnp.zeros((1, NUMS_W - 1 - W), jnp.float32)], axis=-1)

        @pl.when((pl.program_id(0) == 0) & (t == 0))
        def _zero_nums():
            nums_ref[...] = jnp.zeros(nums_ref.shape, nums_ref.dtype)

        nums_ref[...] += row

    # teacher/predicted frame-summary token select (ptvae.py:476, the
    # batch-global coin1): feeds the NEXT frame's time-GRU input
    c1 = coins1_ref[t, 0] != 0
    h_scr[:] = h_new
    tok_scr[:] = jnp.where(c1, x_sum_ref[:], summ).astype(dtype)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _seq_bwd_kernel(spec, T: int, nh: int, loss_mode: bool, *args):
    (coins1_ref, coins2_ref, h0_ref, gi_z_ref, h_st_ref, h_prev_ref,
     ttok_st_ref, hs_ref, ntok_ref, *rest) = args
    if loss_mode:
        gt_pitch_ref, gt_dur_ref, d_nums_ref = rest[:3]
        rest = rest[3:]
    wrefs = rest[:27]                      # _SEQ_WNAMES order
    if loss_mode:
        d_pitch_ref = d_dur_ref = None
        rest = rest[27:]
    else:
        d_pitch_ref, d_dur_ref = rest[27:29]
        rest = rest[29:]
    (d_h0_ref, d_token0_ref, d_gi_z_ref, d_x_emb_ref,
     d_x_sum_ref) = rest[:5]
    grad_refs = rest[5:5 + len(_SEQ_WNAMES)]
    dh_scr, dtok_scr = rest[5 + len(_SEQ_WNAMES):]
    K, W = spec.max_simu_note, spec.dur_width
    dtype = h0_ref.dtype
    f32 = jnp.float32
    dot = functools.partial(jnp.dot, preferred_element_type=f32)

    def wgrad(x, dy):
        return jax.lax.dot_general(
            x, dy, (((0,), (0,)), ((), ())), preferred_element_type=f32)

    j = pl.program_id(1)
    t = T - 1 - j               # frames run reversed

    @pl.when((pl.program_id(0) == 0) & (j == 0))
    def _zero_grads():
        for ref in grad_refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    @pl.when(j == 0)
    def _init_carry():
        dh_scr[...] = jnp.zeros(dh_scr.shape, f32)
        dtok_scr[...] = jnp.zeros(dtok_scr.shape, f32)

    acc = {}
    ref_by_name = dict(zip(_SEQ_WNAMES, grad_refs))

    def add(name, val):
        acc[name] = val if name not in acc else acc[name] + val

    def flush(*names):
        # fold completed accumulators into the grad refs immediately (the
        # f32 grad values otherwise all stay live until kernel end and
        # dominated the register-allocator spill slots)
        for name in names:
            ref = ref_by_name[name]
            ref[...] += acc.pop(name).astype(ref.dtype)

    # token_{t+1} = where(coin1_t, x_sum_t, summ_t): the carried d_token is
    # the cotangent of the token consumed at step t+1, so it routes to this
    # frame's summary or to the ground-truth summary input
    d_token_next = dtok_scr[...]
    c1 = coins1_ref[t, 0] != 0
    d_summ = jnp.where(c1, 0.0, d_token_next)
    d_x_sum_ref[:] = jnp.where(c1, d_token_next, 0.0).astype(dtype)

    loss_md = None
    if loss_mode:
        gt_p, gt_d = _gt_cat(spec, gt_pitch_ref, gt_dur_ref)
        loss_md = dict(gt_pitch=gt_p, gt_dur=gt_d,
                       g_pitch=d_nums_ref[0, 0],
                       g_dur=[d_nums_ref[0, 1 + w] for w in range(W)])
    wts = dict(zip(_SEQ_WNAMES, (r[:] for r in wrefs)))
    frame_h = h_st_ref[:]
    tokens = [ntok_ref[k] for k in range(K)]
    d_frame_h, d_x_rows = _frame_bwd_core(
        spec, nh, wts, lambda k: coins2_ref[t, k - 1], frame_h,
        [hs_ref[k] for k in range(K)], tokens, tokens[0],
        None if loss_mode else d_pitch_ref[:],
        None if loss_mode else d_dur_ref[:], d_summ, add,
        loss_md=loss_md, flush=flush)
    d_x_emb_ref[...] = jnp.stack(d_x_rows)

    # time-GRU cell backward: h_t feeds this frame (d_frame_h) and the next
    # step's recurrence (dh carry); gates rebuild from the stashed
    # (h_{t-1}, token_t) with the same dots as the forward
    h_prev = jnp.where(t == 0, h0_ref[:], h_prev_ref[:])
    token_t = ttok_st_ref[:]
    wt_tok, wt_hh = wts["wt_tok"], wts["wt_hh"]
    gi_t = gi_z_ref[:] + dot(token_t, wt_tok)
    gh_t = dot(h_prev, wt_hh) + wts["bt_hh"]
    _, (r, z, n, h_n) = _gru_gates(gi_t, gh_t, h_prev)
    dh_t = d_frame_h + dh_scr[...]
    d_gi, dh_prev, d_gh = _gru_bwd(dh_t, h_prev, r, z, n, h_n, wt_hh)
    add("wt_hh", wgrad(h_prev, d_gh))
    add("bt_hh", jnp.sum(d_gh, axis=0, keepdims=True))
    add("wt_tok", wgrad(token_t, d_gi))
    flush("wt_hh", "bt_hh", "wt_tok")

    # gi_z is consumed at EVERY step: accumulate its per-row cotangent
    # across the t grid dim (block index constant in j)
    @pl.when(j == 0)
    def _gi_z_first():
        d_gi_z_ref[:] = d_gi

    @pl.when(j > 0)
    def _gi_z_acc():
        d_gi_z_ref[:] += d_gi

    d_token_t = dot(d_gi, wt_tok.T)
    dh_scr[...] = dh_prev
    dtok_scr[...] = d_token_t

    @pl.when(j == T - 1)        # t == 0: the chain heads are inputs
    def _heads():
        d_h0_ref[:] = dh_prev.astype(dtype)
        d_token0_ref[:] = d_token_t.astype(dtype)

    assert not acc, f"unflushed weight grads: {sorted(acc)}"


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------

_BLOCK_OVERRIDE = None          # tests force small blocks (both kernels)
_FWD_BLOCK_OVERRIDE = None      # independent overrides for device tuning
_BWD_BLOCK_OVERRIDE = None


def _scale_cap(base: int) -> int:
    """Block-row caps below were measured to the byte against the v5e's
    128 MiB VMEM; scale them for a device with a different ceiling
    (VERDICT r2 item 6 — same-or-unknown VMEM returns ``base`` unchanged,
    and the Trainer's one-shot XLA degrade still backstops a mispredict)."""
    from pctd_tpu.utils import device_mem

    return device_mem.scale_by_vmem(base)


def _pick_block_fwd(B: int, stash: bool = False,
                    loss_mode: bool = False) -> int:
    # The sequence forward carries the same VMEM load as the per-frame
    # forward plus the time-GRU weights (~8 MB bf16) and the (h, token)
    # scratch. The PRIMAL logits-out forward fits 512-row blocks; the
    # stash-mode forward (grad path: 4 double-buffered stash output windows
    # on top) measured 151.5M of 128M VMEM at 512, and the fused-loss
    # primal (in-VMEM masked CE on the (K-1)*bt-row logits) 129.0M — both
    # dominated by ~99M of register-allocator spill slots — so those modes
    # take 256-row blocks.
    if _FWD_BLOCK_OVERRIDE or _BLOCK_OVERRIDE:
        return _FWD_BLOCK_OVERRIDE or _BLOCK_OVERRIDE
    cap = _scale_cap(256 if (stash or loss_mode) else 512)
    if B <= cap:
        # round the (single) block up to a multiple of 64 so the padded
        # batch Bp is divisible by every backward block size (the bwd
        # picker's fallbacks are 64/32) — a raw odd B like 300 would
        # otherwise produce a Bp nothing downstream divides
        return min(cap, -(-B // 64) * 64)
    for bt in (cap, 256, 128):
        if bt <= cap and B % bt == 0:
            return bt
    return 128


def _pick_block_bwd(B: int, loss_mode: bool = False) -> int:
    # The per-frame backward sits at the VMEM ceiling at 256 rows; the
    # sequence backward adds the time-GRU weights (bf16 ~8 MB) + their f32
    # grad accumulators (~16 MB) + the gi_z window and d_gi_z accumulator,
    # so it takes 128-row blocks. In fused-loss mode the in-kernel CE
    # gradient (target windows, selector extracts, softmax rebuild) pushes
    # register pressure past VMEM at 128 (measured 135.2M of 128M, 78.6M
    # of it register-allocator spill slots) — 64-row blocks clear it.
    if _BWD_BLOCK_OVERRIDE or _BLOCK_OVERRIDE:
        return _BWD_BLOCK_OVERRIDE or _BLOCK_OVERRIDE
    cap = _scale_cap(64 if loss_mode else 128)
    if B <= cap:
        return B
    for bt in (cap, 64):
        if bt <= cap and B % bt == 0:
            return bt
    return 32


def _VMEM_LIMIT() -> int:
    from pctd_tpu.utils import device_mem

    return device_mem.vmem_bytes()


def _seq_fwd_call(spec, eh, nh, weights, h0, token0, gi_z, x_emb_tk,
                  x_sum_t, coins1, coins2, interpret, stash=False, gt=None):
    """x_emb_tk (T, K, B, E); x_sum_t (T, B, 2EH); coins1 (T, 1) i32;
    coins2 (T, K-1) i32. Returns (pitch (T, K-1, Bp, P),
    dur (T, K-1, W, Bp, 2)) [+ stashes], batch-padded. With ``gt`` =
    (gt_pitch (T, B, K-1) i32, gt_dur (T, B, (K-1)*W) i32) the kernel runs
    in fused-loss mode: the logits never leave VMEM and the first output is
    instead the (1, NUMS_W) masked-CE numerator partials."""
    B = h0.shape[0]
    T, K, W, P = (spec.num_step, spec.max_simu_note, spec.dur_width,
                  spec.pitch_range)
    E = x_emb_tk.shape[-1]
    th = h0.shape[-1]
    bt = _pick_block_fwd(B, stash=stash, loss_mode=gt is not None)
    Bp = -(-B // bt) * bt
    grid = (Bp // bt, T)        # t innermost: frames sequential per block
    dtype = h0.dtype

    h0 = _pad_rows(h0, 0, Bp)
    token0 = _pad_rows(token0, 0, Bp)
    gi_z = _pad_rows(gi_z, 0, Bp)
    x_emb_tk = _pad_rows(x_emb_tk, 2, Bp)
    x_sum_t = _pad_rows(x_sum_t, 1, Bp)

    def bspec(*shape, pos=0, tdim=None):
        """Batch-blocked spec; ``tdim`` = position of a squeezed per-frame
        axis in the FULL array (block size None -> the kernel sees the
        per-frame window without the unit dim)."""
        full = list(shape[:pos]) + [bt] + list(shape[pos:])
        if tdim is not None:
            full.insert(tdim, None)
        bpos = pos + (1 if tdim is not None and tdim <= pos else 0)
        n = len(full)

        def imap(i, t, _bpos=bpos, _tdim=tdim, _n=n):
            idx = [0] * _n
            idx[_bpos] = i
            if _tdim is not None:
                idx[_tdim] = t
            return tuple(idx)

        return pl.BlockSpec(tuple(full), imap, memory_space=pltpu.VMEM)

    def wspec(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, t, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    smem = lambda a: pl.BlockSpec(a.shape, lambda i, t: (0, 0),
                                  memory_space=pltpu.SMEM)

    gt_args = ()
    gt_specs = []
    if gt is not None:
        gt_pitch, gt_dur = gt
        gt_args = (_pad_rows_const(gt_pitch, 1, Bp, spec.pitch_pad),
                   _pad_rows_const(gt_dur, 1, Bp, spec.dur_pad))
        gt_specs = [bspec(K - 1, tdim=0), bspec((K - 1) * W, tdim=0)]

    in_specs = ([smem(coins1), smem(coins2), bspec(th), bspec(2 * eh),
                 bspec(3 * th), bspec(K, E, pos=1, tdim=0),
                 bspec(2 * eh, tdim=0)] + gt_specs
                + [wspec(w) for w in weights])
    if gt is not None:
        out_shape = [jax.ShapeDtypeStruct((1, NUMS_W), jnp.float32)]
        out_specs = [pl.BlockSpec((1, NUMS_W), lambda i, t: (0, 0),
                                  memory_space=pltpu.VMEM)]
    else:
        out_shape = [jax.ShapeDtypeStruct((T, K - 1, Bp, P), dtype),
                     jax.ShapeDtypeStruct((T, K - 1, W, Bp, 2), dtype)]
        out_specs = [bspec(K - 1, P, pos=1, tdim=0),
                     bspec(K - 1, W, 2, pos=2, tdim=0)]
    if stash:
        out_shape += [jax.ShapeDtypeStruct((T, Bp, th), dtype),
                      jax.ShapeDtypeStruct((T, Bp, 2 * eh), dtype),
                      jax.ShapeDtypeStruct((T, K, Bp, nh), dtype),
                      jax.ShapeDtypeStruct((T, K, Bp, E), dtype)]
        out_specs += [bspec(th, tdim=0), bspec(2 * eh, tdim=0),
                      bspec(K, nh, pos=1, tdim=0),
                      bspec(K, E, pos=1, tdim=0)]
    kernel = functools.partial(_seq_fwd_kernel, spec, T, gt is not None)
    outs = pl.pallas_call(
        kernel, grid=grid, out_shape=tuple(out_shape), in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((bt, th), dtype),
                        pltpu.VMEM((bt, 2 * eh), dtype)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT()),
    )(coins1, coins2, h0, token0, gi_z, x_emb_tk, x_sum_t, *gt_args,
      *weights)
    return outs


def _seq_bwd_call(spec, eh, nh, weights, h0, gi_z, coins1, coins2,
                  h_st, ttok_st, hs_st, ntok_st, d_pitch_t, d_dur_t,
                  interpret, gt=None):
    """Inputs in kernel (batch-padded) layouts; returns (d_h0, d_token0,
    d_gi_z, d_x_emb (T, K, Bp, E), d_x_sum (T, Bp, 2EH), d_weights).
    ``gt`` = (gt_pitch (T, B, K-1), gt_dur (T, B, (K-1)*W), d_nums (1,
    NUMS_W) f32) selects fused-loss mode: d_pitch_t/d_dur_t are None and
    the logit cotangents are computed in-kernel from the targets."""
    Bp = h_st.shape[1]
    T, K, W, P = (spec.num_step, spec.max_simu_note, spec.dur_width,
                  spec.pitch_range)
    E = ntok_st.shape[-1]
    th = h0.shape[-1]
    bt = _pick_block_bwd(Bp, loss_mode=gt is not None)
    assert Bp % bt == 0, (Bp, bt)
    grid = (Bp // bt, T)
    dtype = h0.dtype

    def bspec(*shape, pos=0, tdim=None, rev=False, prev=False):
        full = list(shape[:pos]) + [bt] + list(shape[pos:])
        if tdim is not None:
            full.insert(tdim, None)
        bpos = pos + (1 if tdim is not None and tdim <= pos else 0)
        n = len(full)

        def imap(i, j, _bpos=bpos, _tdim=tdim, _n=n):
            idx = [0] * _n
            idx[_bpos] = i
            if _tdim is not None:
                t = (T - 1 - j) if rev else j
                if prev:        # the PREVIOUS frame's window (clamped at 0;
                    t = jnp.maximum(t - 1, 0)   # t=0 reads h0 instead)
                idx[_tdim] = t
            return tuple(idx)

        return pl.BlockSpec(tuple(full), imap, memory_space=pltpu.VMEM)

    def wspec(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, lambda i, j, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    smem = lambda a: pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                  memory_space=pltpu.SMEM)

    if gt is not None:
        gt_pitch, gt_dur, d_nums = gt
        ct_args = (_pad_rows_const(gt_pitch, 1, Bp, spec.pitch_pad),
                   _pad_rows_const(gt_dur, 1, Bp, spec.dur_pad), d_nums)
        ct_specs = [bspec(K - 1, tdim=0, rev=True),
                    bspec((K - 1) * W, tdim=0, rev=True), smem(d_nums)]
    else:
        ct_args = (d_pitch_t, d_dur_t)
        ct_specs = [bspec(K - 1, P, pos=1, tdim=0, rev=True),
                    bspec(K - 1, W, 2, pos=2, tdim=0, rev=True)]
    # cotangent/target inputs ride BEFORE the weights in kernel arg order
    # only in loss mode (gt windows); logit cotangents come after
    in_specs = ([smem(coins1), smem(coins2), bspec(th), bspec(3 * th),
                 bspec(th, tdim=0, rev=True),
                 bspec(th, tdim=0, rev=True, prev=True),
                 bspec(2 * eh, tdim=0, rev=True),
                 bspec(K, nh, pos=1, tdim=0, rev=True),
                 bspec(K, E, pos=1, tdim=0, rev=True)]
                + (ct_specs if gt is not None else [])
                + [wspec(w) for w in weights]
                + ([] if gt is not None else ct_specs))
    out_shape = [jax.ShapeDtypeStruct((Bp, th), dtype),
                 jax.ShapeDtypeStruct((Bp, 2 * eh), dtype),
                 jax.ShapeDtypeStruct((Bp, 3 * th), jnp.float32),
                 jax.ShapeDtypeStruct((T, K, Bp, E), dtype),
                 jax.ShapeDtypeStruct((T, Bp, 2 * eh), dtype)]
    out_specs = [bspec(th), bspec(2 * eh), bspec(3 * th),
                 bspec(K, E, pos=1, tdim=0, rev=True),
                 bspec(2 * eh, tdim=0, rev=True)]
    for w in weights:
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(wspec(w))
    kernel = functools.partial(_seq_bwd_kernel, spec, T, nh, gt is not None)
    args = ((coins1, coins2, h0, gi_z, h_st, h_st, ttok_st, hs_st, ntok_st)
            + (ct_args if gt is not None else ()) + tuple(weights)
            + (() if gt is not None else ct_args))
    outs = pl.pallas_call(
        kernel, grid=grid, out_shape=tuple(out_shape), in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((bt, th), jnp.float32),
                        pltpu.VMEM((bt, 2 * eh), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT()),
    )(*args)
    d_h0, d_token0, d_gi_z, d_x_emb, d_x_sum = outs[:5]
    d_weights = tuple(g.astype(w.dtype) for g, w in zip(outs[5:], weights))
    return d_h0, d_token0, d_gi_z, d_x_emb, d_x_sum, d_weights


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def seq_core(cfg: ModelConfig, interpret: bool, weights, h0, token0, gi_z,
             x_emb, x_sum, coins1, coins2):
    """Whole-sequence teacher-forced decode as one kernel.

    weights: tuple from :func:`seq_weights`; h0 (B, TH) = z2hid(z);
    token0 (B, 2EH) = broadcast init_input; gi_z (B, 3TH) = the hoisted
    z_in share of the time-GRU input projection; x_emb (B, T, K, E)
    ground-truth note embeddings; x_sum (B, T, 2EH) teacher frame
    summaries; coins1 (T, 1) / coins2 (T, K-1) int32 teacher flags.
    Returns (pitch_logits (B, T, K-1, P), dur_logits (B, T, K-1, W, 2)).
    """
    spec = cfg.pianotree
    B = h0.shape[0]
    outs = _seq_fwd_call(
        spec, cfg.dec_emb_hidden, cfg.dec_notes_hidden, weights, h0, token0,
        gi_z, jnp.transpose(x_emb, (1, 2, 0, 3)),
        jnp.swapaxes(x_sum, 0, 1), coins1, coins2, interpret)
    pitch, dur = outs
    return (jnp.transpose(pitch[:, :, :B], (2, 0, 1, 3)),
            jnp.transpose(dur[:, :, :, :B], (3, 0, 1, 2, 4)))


def _seq_core_fwd(cfg, interpret, weights, h0, token0, gi_z, x_emb, x_sum,
                  coins1, coins2):
    spec = cfg.pianotree
    B = h0.shape[0]
    outs = _seq_fwd_call(
        spec, cfg.dec_emb_hidden, cfg.dec_notes_hidden, weights, h0, token0,
        gi_z, jnp.transpose(x_emb, (1, 2, 0, 3)),
        jnp.swapaxes(x_sum, 0, 1), coins1, coins2, interpret, stash=True)
    pitch, dur, h_st, ttok_st, hs_st, ntok_st = outs
    public = (jnp.transpose(pitch[:, :, :B], (2, 0, 1, 3)),
              jnp.transpose(dur[:, :, :, :B], (3, 0, 1, 2, 4)))
    return public, (weights, h0, gi_z, coins1, coins2,
                    h_st, ttok_st, hs_st, ntok_st)


def _seq_core_bwd(cfg, interpret, res, cts):
    (weights, h0, gi_z, coins1, coins2, h_st, ttok_st, hs_st, ntok_st) = res
    d_pitch, d_dur = cts
    spec = cfg.pianotree
    B = h0.shape[0]
    Bp = h_st.shape[1]
    # cotangents into kernel layout, zero-padded like the primal batch
    d_pitch_t = _pad_rows(jnp.transpose(d_pitch, (1, 2, 0, 3)), 2, Bp)
    d_dur_t = _pad_rows(jnp.transpose(d_dur, (1, 2, 3, 0, 4)), 3, Bp)
    d_h0, d_token0, d_gi_z, d_x_emb, d_x_sum, d_weights = _seq_bwd_call(
        spec, cfg.dec_emb_hidden, cfg.dec_notes_hidden, weights,
        _pad_rows(h0, 0, Bp), _pad_rows(gi_z, 0, Bp), coins1, coins2,
        h_st, ttok_st, hs_st, ntok_st, d_pitch_t, d_dur_t, interpret)
    zero = lambda c: np.zeros(c.shape, jax.dtypes.float0)
    return (d_weights, d_h0[:B], d_token0[:B],
            d_gi_z[:B].astype(gi_z.dtype),
            jnp.transpose(d_x_emb[:, :, :B], (2, 0, 1, 3)),
            jnp.swapaxes(d_x_sum[:, :B], 0, 1),
            zero(coins1), zero(coins2))


seq_core.defvjp(_seq_core_fwd, _seq_core_bwd)


# ---------------------------------------------------------------------------
# fused-loss wrapper: CE numerators instead of logits
# ---------------------------------------------------------------------------

def _gt_layouts(spec, gt_pitch, gt_dur):
    """(B, T, K-1) / (B, T, K-1, W) int targets -> the kernels' batch-major
    (T, B, K-1) / (T, B, (K-1)*W) windows (batch in sublanes; slot/bit
    columns are lane slices — see _gt_cat)."""
    T = spec.num_step
    B = gt_pitch.shape[0]
    gp = jnp.transpose(gt_pitch, (1, 0, 2)).astype(jnp.int32)
    gd = jnp.transpose(gt_dur, (1, 0, 2, 3)).astype(jnp.int32).reshape(
        T, B, -1)
    return gp, gd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def seq_recon_partials(cfg: ModelConfig, interpret: bool, weights, h0,
                       token0, gi_z, x_emb, x_sum, coins1, coins2,
                       gt_pitch, gt_dur):
    """Whole-sequence decode FUSED WITH the reconstruction-CE numerators:
    the pitch/dur logits never leave VMEM (they are rebuilt bit-equal in the
    backward from the serial-chain stash, where the masked-CE gradient is
    computed in place). Returns (1 + W,) f32 = [pitch CE-numerator sum,
    one dur CE-numerator sum per bit] over valid (non-pad) positions —
    ops/losses.cross_entropy_ignore numerators; the caller divides by the
    mask counts (and applies loss weights / psums) in XLA.

    gt_pitch (B, T, K-1) int = x[:, :, 1:, 0]; gt_dur (B, T, K-1, W) int =
    x[:, :, 1:, 1:] (reference recon-loss targets, ptvae.py:498-529)."""
    spec = cfg.pianotree
    nums = _seq_fwd_call(
        spec, cfg.dec_emb_hidden, cfg.dec_notes_hidden, weights, h0, token0,
        gi_z, jnp.transpose(x_emb, (1, 2, 0, 3)),
        jnp.swapaxes(x_sum, 0, 1), coins1, coins2, interpret,
        gt=_gt_layouts(spec, gt_pitch, gt_dur))[0]
    return nums[0, :1 + spec.dur_width]


def _seq_recon_fwd(cfg, interpret, weights, h0, token0, gi_z, x_emb, x_sum,
                   coins1, coins2, gt_pitch, gt_dur):
    spec = cfg.pianotree
    gt = _gt_layouts(spec, gt_pitch, gt_dur)
    outs = _seq_fwd_call(
        spec, cfg.dec_emb_hidden, cfg.dec_notes_hidden, weights, h0, token0,
        gi_z, jnp.transpose(x_emb, (1, 2, 0, 3)),
        jnp.swapaxes(x_sum, 0, 1), coins1, coins2, interpret, stash=True,
        gt=gt)
    nums, h_st, ttok_st, hs_st, ntok_st = outs
    return nums[0, :1 + spec.dur_width], (
        weights, h0, gi_z, coins1, coins2, gt, h_st, ttok_st, hs_st, ntok_st)


def _seq_recon_bwd(cfg, interpret, res, d_nums):
    (weights, h0, gi_z, coins1, coins2, gt, h_st, ttok_st, hs_st,
     ntok_st) = res
    spec = cfg.pianotree
    B = h0.shape[0]
    Bp = h_st.shape[1]
    row = jnp.zeros((1, NUMS_W), jnp.float32)
    row = row.at[0, :1 + spec.dur_width].set(d_nums.astype(jnp.float32))
    d_h0, d_token0, d_gi_z, d_x_emb, d_x_sum, d_weights = _seq_bwd_call(
        spec, cfg.dec_emb_hidden, cfg.dec_notes_hidden, weights,
        _pad_rows(h0, 0, Bp), _pad_rows(gi_z, 0, Bp), coins1, coins2,
        h_st, ttok_st, hs_st, ntok_st, None, None, interpret,
        gt=gt + (row,))
    zero = lambda c: np.zeros(c.shape, jax.dtypes.float0)
    return (d_weights, d_h0[:B], d_token0[:B],
            d_gi_z[:B].astype(gi_z.dtype),
            jnp.transpose(d_x_emb[:, :, :B], (2, 0, 1, 3)),
            jnp.swapaxes(d_x_sum[:, :B], 0, 1),
            zero(coins1), zero(coins2),
            np.zeros((B, spec.num_step, spec.max_simu_note - 1),
                     jax.dtypes.float0),
            np.zeros((B, spec.num_step, spec.max_simu_note - 1,
                      spec.dur_width), jax.dtypes.float0))


seq_recon_partials.defvjp(_seq_recon_fwd, _seq_recon_bwd)
