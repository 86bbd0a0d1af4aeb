"""Chord encoder: bi-GRU over the 8-beat expanded chord sequence -> 256-d
Gaussian latent (capability of reference RnnEncoder, ptvae.py:11-29;
instantiated RnnEncoder(36, 1024, 256) at model.py:251).

The whole 8-step bi-GRU runs as two scans whose input projections are a
single batched matmul each (see pctd_tpu.ops.gru).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pctd_tpu.config import ModelConfig
from pctd_tpu.ops import DiagNormal, bigru_last, gru_init
from pctd_tpu.utils.init import dense_params, dense_apply


def init(key: jax.Array, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 4)
    h = cfg.chd_enc_hidden
    return {
        "gru_fwd": gru_init(ks[0], cfg.chord.dim, h),
        "gru_bwd": gru_init(ks[1], cfg.chord.dim, h),
        "mu": dense_params(ks[2], 2 * h, cfg.chd_z_dim),
        "std": dense_params(ks[3], 2 * h, cfg.chd_z_dim),
    }


def apply(p: dict, c: jnp.ndarray) -> DiagNormal:
    """c: (B, 8, 36) expanded chord -> DiagNormal over (B, z_chd)."""
    h = bigru_last(p["gru_fwd"], p["gru_bwd"], c)
    mu = dense_apply(p["mu"], h)
    std = jnp.exp(dense_apply(p["std"], h))
    return DiagNormal(mu, std)
