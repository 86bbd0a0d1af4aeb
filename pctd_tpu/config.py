"""Typed configuration tree for the whole framework.

The reference has no config system (constants scattered through
/root/reference/train.py:18-26 and construction sites model.py:244-265);
here every knob lives in one dataclass tree with the reference's canonical
values as defaults.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PianoTreeSpec:
    """Vocabulary / shape contract of the PianoTree grid representation.

    Mirrors the grid built in the reference's dataset.py:98-105 and consumed by
    ptvae.py:218-241: 32 time steps x <=16 simultaneous-note slots, pitch column
    with sos/eos/pad specials, 5-bit binary duration with pad=2.
    """

    num_step: int = 32
    max_simu_note: int = 16
    max_pitch: int = 127
    min_pitch: int = 0
    pitch_sos: int = 128
    pitch_eos: int = 129
    pitch_pad: int = 130
    dur_pad: int = 2
    dur_width: int = 5

    @property
    def pitch_range(self) -> int:
        """Number of pitch classes excluding pad (reference ptvae.py:236)."""
        return self.max_pitch - self.min_pitch + 3

    @property
    def note_size(self) -> int:
        return self.pitch_range + self.dur_width


@dataclasses.dataclass(frozen=True)
class ChordSpec:
    """8 beat steps x 36-d expanded chord [root 1-hot | chroma | bass 1-hot]."""

    num_step: int = 8
    dim: int = 36


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """DisentangleVAE architecture (parity anchors: reference model.py:244-265,
    train.py:31-37)."""

    # latents
    chd_z_dim: int = 256
    txt_z_dim: int = 256

    # chord encoder (RnnEncoder(36, 1024, 256), reference ptvae.py:11-29)
    chd_enc_hidden: int = 1024

    # texture encoder variant: "conv" (TextureEncoder, ptvae.py:90-122,
    # canonical via model.init_model) or "pianotree" (PtvaeEncoder over the
    # detrended grid, the train.py:32 "nozoth" config).
    txt_encoder: str = "conv"

    # conv texture encoder
    txt_conv_channels: int = 10
    txt_emb_size: int = 256
    txt_enc_hidden: int = 1024

    # pianotree texture encoder (PtvaeEncoder, ptvae.py:125-215); note feature
    # is the 39-d detrended note (dataset.py:123-168): pitch_range=34, dur=5.
    ptenc_max_pitch: int = 31            # 39 - 8, reference train.py:32
    ptenc_min_pitch: int = 0
    ptenc_note_emb: int = 128
    ptenc_notes_hidden: int = 256
    ptenc_time_hidden: int = 512

    # chord decoder (RnnDecoder, ptvae.py:32-87)
    chd_dec_hidden: int = 512
    chd_dec_z_in: int = 256

    # PianoTree decoder (PtvaeDecoder, ptvae.py:218-291; dur hid 64 from
    # model.py:259-261)
    note_emb_size: int = 128
    dec_emb_hidden: int = 128
    dec_time_hidden: int = 1024
    dec_notes_hidden: int = 512
    dec_z_in: int = 256
    dec_dur_hidden: int = 64

    # data shapes
    pianotree: PianoTreeSpec = dataclasses.field(default_factory=PianoTreeSpec)
    chord: ChordSpec = dataclasses.field(default_factory=ChordSpec)

    # numerics: params stay f32; matmul-heavy paths may run in bf16.
    compute_dtype: str = "float32"

    # Rematerialize each frame's note/dur decode in the backward pass
    # (jax.checkpoint): trades ~1/3 more FLOPs for dropping the
    # (T, K, B, hidden) saved-activation temps — required for training
    # batches >= 1024 on a 16G-HBM chip (measured OOM at B=1024 without);
    # also net faster from B >= 512 (less HBM activation traffic).
    remat_frames: bool = False

    # lax.scan unroll factors for the inner decoder chains. The dur chain is
    # 2400 near-zero-FLOP links per step; unrolling merges its per-iteration
    # ops into larger fusions (at some compile-time cost).
    unroll_dur: int = 1
    unroll_notes: int = 1

    # Teacher-forced decode via the fused Pallas frame kernel with a
    # hand-written VJP (ops/pallas/train_frame): the whole note+dur frame
    # runs in VMEM forward AND backward (the backward recomputes in VMEM —
    # checkpoint semantics — so remat_frames is moot on this path).
    train_frame_kernel: bool = False

    # (A whole-sequence kernel variant, train_seq_kernel, was built in
    # rounds 2-4 and retired in round 5: it measured consistently SLOWER
    # than the per-frame kernel (7,683 vs 7,786 seg/s at B=2048) while
    # costing 680 LoC of maintenance — the negative result and its VMEM
    # analysis are preserved in ARCHITECTURE.md "Retired experiments".)

    # Round-5 measurement: with the CURRENT XLA stack the logits-out
    # variant (fused_loss=False) consistently beats this fusion by ~2% at
    # B=2048 (7,894 vs 7,728 seg/s over three runs) — the padded-DMA cost
    # the fusion avoids has shrunk while its backward VMEM pressure
    # remains. The default stays True for config stability; bench.py
    # measures both and reports the faster as the headline
    # (ARCHITECTURE.md "MFU ceiling").
    # With train_frame_kernel: fuse the reconstruction
    # cross-entropy INTO the kernel (models/pianotree_decoder.decode_recon).
    # The fwd kernel emits masked-CE numerator partials and the bwd computes
    # the logit cotangents in place from the targets, so the (B, T, K-1, P)
    # pitch and (B, T, K-1, W, 2) dur logits never round-trip HBM (the dur
    # tensor's 2-wide lane pads to 128 — ~1.3 GB of padded DMA per pass at
    # B=2048). Loss values match the XLA recon_loss to fp-reassociation.
    fused_loss: bool = True

    @property
    def z_dim(self) -> int:
        return self.chd_z_dim + self.txt_z_dim

    @property
    def ptenc_pitch_range(self) -> int:
        return self.ptenc_max_pitch - self.ptenc_min_pitch + 3

    @property
    def ptenc_note_size(self) -> int:
        return self.ptenc_pitch_range + self.pianotree.dur_width


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference train.py:18-26, 50-52)."""

    batch_size: int = 128
    n_epoch: int = 6
    lr: float = 1e-3
    lr_decay: float = 0.9999
    lr_min: float = 1e-5
    clip_norm: float = 1.0
    beta: float = 0.1
    weights: Tuple[float, float] = (1.0, 0.5)
    # (high, low) pairs for tfr1 / tfr2 / tfr3 (train.py:24)
    tf_rates: Tuple[Tuple[float, float], ...] = ((0.6, 0.0), (0.5, 0.0), (0.5, 0.0))
    # The reference's scheduled_sampling collapses within ~1 batch
    # (train_utils.py:17-30, quirk documented in SURVEY.md §2); we expose the
    # horizon so the published (high, low) pairs describe a real transition.
    sched_horizon: float = 1.0
    seed: int = 3345
    weighted_dur: bool = False
    # Validation / best-checkpoint policy. False (default) = reference
    # parity: eval runs at the CURRENT scheduled tfr/beta (module.py:161-177),
    # so val loss drifts with the schedule. True = eval at the schedules'
    # final values (tfr lows, full beta), making val loss and the Trainer's
    # best-checkpoint selection comparable across epochs.
    eval_fixed_schedule: bool = False
    # Gradient accumulation: split each batch into this many microbatches
    # scanned sequentially (activation memory = one microbatch). Combine with
    # ModelConfig.remat_frames for very large effective batches.
    # 0 = auto: engage just enough microbatches to keep each under the
    # measured single-step HBM envelope (trainer.auto_accum_steps), so e.g.
    # batch_size=4096 trains instead of OOMing on a 16G chip.
    accum_steps: int = 0
    # run dirs / checkpointing
    result_root: str = "result"
    save_every_epoch: bool = True


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Corpus / tensorization settings (reference dataset.py:13-15, 265-281)."""

    data_path: str = "data/POP09-PIANOROLL-4-bin-quantization"
    index_path: str = "data/index.xlsx"
    seed: int = 3345
    portion: int = 8            # train:val = portion:1
    shift_low: int = -6
    shift_high: int = 5
    num_bar: int = 2
    ts: int = 4                 # beats per bar
    contain_chord: bool = True
    # The reference's xlsx meter filter keeps songs with
    # num_beats_per_measure == 2 while the whole downstream pipeline assumes
    # 4 beats/bar (reference dataset.py:225-227 — a known defect, moot there
    # because ind.pkl overrides the list). Here the filter defaults to == ts;
    # set ref_meter_filter=True to reproduce the reference's literal == 2.
    ref_meter_filter: bool = False


def tiny_model_config(**overrides) -> ModelConfig:
    """Miniature dims for CI smoke runs: identical topology to the canonical
    model at ~1000x fewer FLOPs (shared by scripts/serve.py,
    scripts/make_demos.py and their tests so a checkpoint written by one is
    loadable by the others)."""
    return dataclasses.replace(
        ModelConfig(), chd_z_dim=8, txt_z_dim=8, chd_enc_hidden=12,
        txt_emb_size=12, txt_enc_hidden=12, chd_dec_hidden=12,
        chd_dec_z_in=8, note_emb_size=12, dec_emb_hidden=8,
        dec_time_hidden=16, dec_notes_hidden=12, dec_z_in=8,
        dec_dur_hidden=8, **overrides)
