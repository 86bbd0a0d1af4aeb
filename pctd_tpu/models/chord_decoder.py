"""Autoregressive chord decoder: z_chd -> 8 beats of (root, chroma, bass)
logits (capability of reference RnnDecoder, ptvae.py:32-87).

The 8-step Python loop with argmax feedback becomes one ``lax.scan``; the
reference's batch-global per-step teacher-forcing coin becomes a precomputed
(8,) Bernoulli vector selecting between the ground-truth chord row and the
argmax-decoded token (SURVEY.md §7 "teacher-forcing branch divergence").

Deliberate fix vs the reference: the reference's root/bass feedback one-hots
are built with mismatched advanced indexing
(``t_root[torch.arange(bs), 0, r_root.max(-1)[-1]]`` where the second index
is (bs, 1), reference ptvae.py:73-77), which broadcasts to (bs, bs) pairs and
sets every sample's token at the *union* of the whole batch's argmax
positions. We build correct per-sample one-hots; the two coincide exactly at
batch size 1 (verified in tests/test_models_parity.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pctd_tpu.config import ModelConfig
from pctd_tpu.ops import gru_init, gru_cell_pre
from pctd_tpu.utils.init import dense_params, dense_apply, free_param


def init(key: jax.Array, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 7)
    h = cfg.chd_dec_hidden
    zin = cfg.chd_dec_z_in
    dim = cfg.chord.dim
    return {
        "z2hid": dense_params(ks[0], cfg.chd_z_dim, h),
        "z2in": dense_params(ks[1], cfg.chd_z_dim, zin),
        "gru": gru_init(ks[2], dim + zin, h),
        "root": dense_params(ks[3], h, 12),
        "chroma": dense_params(ks[4], h, 24),
        "bass": dense_params(ks[5], h, 12),
        "init_input": free_param(ks[6], (dim,)),
    }


def apply(p: dict, z_chd: jnp.ndarray, c: Optional[jnp.ndarray],
          teacher_coins: Optional[jnp.ndarray],
          num_step: int = 8) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode ``num_step`` chord beats.

    z_chd: (B, z_chd); c: (B, num_step, 36) ground truth or None (inference);
    teacher_coins: (num_step,) bool — coin[t] selects the ground-truth token as
    input for step t+1 (drawn with prob tfr; reference ptvae.py:81-83).
    Returns (root (B,S,12), chroma (B,S,12,2), bass (B,S,12)) logits.
    """
    B = z_chd.shape[0]
    dim = p["init_input"].shape[0]
    h0 = dense_apply(p["z2hid"], z_chd)
    z_in = dense_apply(p["z2in"], z_chd)

    # split the GRU input projection: [token | z_in]; the z_in part is
    # constant across steps and hoisted out of the scan.
    w_tok = p["gru"].w_ih[:dim]
    gi_z = z_in @ p["gru"].w_ih[dim:] + p["gru"].b_ih       # (B, 3H)

    token0 = jnp.broadcast_to(p["init_input"], (B, dim))
    if c is None:
        c_steps = jnp.zeros((num_step, B, dim), z_chd.dtype)
        coins = jnp.zeros((num_step,), bool)
    else:
        c_steps = jnp.swapaxes(c, 0, 1)
        coins = teacher_coins

    def step(carry, inp):
        h, token = carry
        c_t, coin_t = inp
        h = gru_cell_pre(p["gru"], gi_z + token @ w_tok, h)
        r_root = dense_apply(p["root"], h)                   # (B, 12)
        r_chroma = dense_apply(p["chroma"], h).reshape(B, 12, 2)
        r_bass = dense_apply(p["bass"], h)
        t_root = jax.nn.one_hot(jnp.argmax(r_root, -1), 12, dtype=h.dtype)
        t_chroma = jnp.argmax(r_chroma, -1).astype(h.dtype)  # (B, 12)
        t_bass = jax.nn.one_hot(jnp.argmax(r_bass, -1), 12, dtype=h.dtype)
        pred_token = jnp.concatenate([t_root, t_chroma, t_bass], axis=-1)
        token_next = jnp.where(coin_t, c_t, pred_token)
        return (h, token_next), (r_root, r_chroma, r_bass)

    (_, _), (roots, chromas, basses) = jax.lax.scan(
        step, (h0, token0), (c_steps, coins))
    return (jnp.swapaxes(roots, 0, 1), jnp.swapaxes(chromas, 0, 1),
            jnp.swapaxes(basses, 0, 1))
