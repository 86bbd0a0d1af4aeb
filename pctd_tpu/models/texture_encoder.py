"""Texture encoders -> 256-d Gaussian latent. Two variants, as in the
reference (SURVEY.md §2):

- ``conv``: Conv(4x12/stride 4x1) + MaxPool(1x4) + 2xFC + bi-GRU over the
  duration matrix (capability of reference TextureEncoder, ptvae.py:90-122;
  the canonical model.init_model config, model.py:253).
- ``pianotree``: note-embedding + note-level masked bi-GRU + time bi-GRU over
  the detrended PianoTree feature (capability of reference PtvaeEncoder,
  ptvae.py:125-215; the train.py:32 "nozoth" config).

Quirk preserved knowingly: the reference flattens the conv feature map with
``(B,10,8,29).view(B, 8, -1)`` (ptvae.py:114), which interleaves channel and
time in raveled order rather than giving each GRU step its own time slice. We
reproduce those exact semantics (transpose to channel-major, then row-major
reshape) so oracle parity holds; a learned model is equivalent either way up
to a fixed permutation of fc1's input weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pctd_tpu.config import ModelConfig
from pctd_tpu.ops import DiagNormal, bigru_last, bigru_last_masked, gru_init
from pctd_tpu.utils.init import (conv2d_params, dense_params, dense_apply)


# ---------------------------------------------------------------------------
# conv variant
# ---------------------------------------------------------------------------

def _conv_dims(cfg: ModelConfig):
    """Conv output (H, W) and fc1 input size. The reference hardcodes 8 GRU
    steps and fc1 = Linear(ch * 29, 1000) for 32-step segments
    (ptvae.py:100,114); generalized here so the 32-bar stretch config
    (num_step=128) works: the raveled conv map is regrouped into 8 GRU steps
    of ch*H*W/8 features (identical to the reference at num_step=32)."""
    H = (cfg.pianotree.num_step - 4) // 4 + 1
    W = (128 - 12 + 1) // 4
    fc1_in = cfg.txt_conv_channels * H * W // 8
    return H, W, fc1_in


def init_conv(key: jax.Array, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 6)
    ch = cfg.txt_conv_channels
    emb = cfg.txt_emb_size
    h = cfg.txt_enc_hidden
    _, _, fc1_in = _conv_dims(cfg)
    return {
        "conv": conv2d_params(ks[0], 1, ch, (4, 12)),
        "fc1": dense_params(ks[1], fc1_in, 1000),
        "fc2": dense_params(ks[2], 1000, emb),
        "gru_fwd": gru_init(ks[3], emb, h),
        "gru_bwd": gru_init(ks[4], emb, h),
        "mu": dense_params(jax.random.split(ks[5])[0], 2 * h, cfg.txt_z_dim),
        "std": dense_params(jax.random.split(ks[5])[1], 2 * h, cfg.txt_z_dim),
    }


def apply_conv(p: dict, pr_mat: jnp.ndarray) -> DiagNormal:
    """pr_mat: (B, 32, 128) duration matrix -> DiagNormal over (B, z_txt)."""
    B = pr_mat.shape[0]
    x = pr_mat[..., None]                                   # NHWC (B,32,128,1)
    x = jax.lax.conv_general_dilated(
        x, p["conv"]["w"], window_strides=(4, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p["conv"]["b"]
    x = jax.nn.relu(x)                                      # (B, 8, 117, C)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, 4, 1), window_strides=(1, 1, 4, 1),
        padding="VALID")                                    # (B, 8, 29, C)
    # torch (B, C, 8, 29).view(B, 8, -1) parity: channel-major ravel
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, 8, -1)    # (B, 8, C*29)
    x = dense_apply(p["fc2"], dense_apply(p["fc1"], x))     # (B, 8, emb)
    h = bigru_last(p["gru_fwd"], p["gru_bwd"], x)
    mu = dense_apply(p["mu"], h)
    std = jnp.exp(dense_apply(p["std"], h))
    return DiagNormal(mu, std)


# ---------------------------------------------------------------------------
# pianotree variant
# ---------------------------------------------------------------------------

def init_pianotree(key: jax.Array, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 7)
    ne = cfg.ptenc_note_emb
    nh = cfg.ptenc_notes_hidden
    th = cfg.ptenc_time_hidden
    return {
        "note_emb": dense_params(ks[0], cfg.ptenc_note_size, ne),
        "notes_fwd": gru_init(ks[1], ne, nh),
        "notes_bwd": gru_init(ks[2], ne, nh),
        "time_fwd": gru_init(ks[3], 2 * nh, th),
        "time_bwd": gru_init(ks[4], 2 * nh, th),
        "mu": dense_params(ks[5], 2 * th, cfg.txt_z_dim),
        "std": dense_params(ks[6], 2 * th, cfg.txt_z_dim),
    }


def apply_pianotree(p: dict, notes: jnp.ndarray,
                    lengths: jnp.ndarray) -> DiagNormal:
    """notes: (B, T, K, note_size) multi-hot note features (e.g. the 39-d
    detrended feature), lengths: (B, T) valid note counts per step.

    Note-level masked bi-GRUs run for all B*T frames at once — the packing
    loop of the reference (ptvae.py:190-206) becomes two scans of length K
    over a (B*T, ...) batch.
    """
    B, T, K, _ = notes.shape
    emb = dense_apply(p["note_emb"], notes)                 # (B,T,K,ne)
    flat = emb.reshape(B * T, K, emb.shape[-1])
    note_h = bigru_last_masked(p["notes_fwd"], p["notes_bwd"], flat,
                               lengths.reshape(B * T))
    note_h = note_h.reshape(B, T, -1)                       # (B,T,2*nh)
    h = bigru_last(p["time_fwd"], p["time_bwd"], note_h)
    mu = dense_apply(p["mu"], h)
    std = jnp.exp(dense_apply(p["std"], h))
    return DiagNormal(mu, std)


def lengths_from_detrended(dt_x: jnp.ndarray) -> jnp.ndarray:
    """Valid note counts per time step for the 39-d detrended feature:
    K minus the number of pad notes (is_note one-hot index 3 set;
    see pctd_tpu.data.detrend feature layout)."""
    K = dt_x.shape[2]
    return (K - dt_x[..., 3].sum(axis=-1)).astype(jnp.int32)
