"""DisentangleVAE: chord + texture encoders -> concatenated latent ->
PianoTree decoder, with an auxiliary chord decoder grounding the chord latent
(capability of reference model.py:11-265).

Everything is a pure function over a params pytree so the train step, the
sampler, and every latent-control workflow (swap / posterior / prior /
interp) jit and shard cleanly. A thin ``DisentangleVAE`` class packages
cfg + jitted callables for interactive use.

Latent-control API (the four demo workflows, reference model.py:117-242):
- ``swap``             compositional style transfer: decode with mean latents
                       from mixed sources
- ``posterior_sample`` texture variation: rsample around the posterior with
                       optional sigma scaling
- ``prior_sample``     replace chord and/or texture latent with N(0, scale^2)
- ``interp``           SLERP on normalized latents + log-linear norm ramp
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pctd_tpu.config import ModelConfig
from pctd_tpu.models import chord_decoder as chd_dec
from pctd_tpu.utils import host
from pctd_tpu.models import chord_encoder as chd_enc
from pctd_tpu.models import pianotree_decoder as pt_dec
from pctd_tpu.models import texture_encoder as txt_enc
from pctd_tpu.ops import DiagNormal, kl_std_normal
from pctd_tpu.ops.losses import cross_entropy_mean
from pctd_tpu.utils import precision

METRIC_NAMES = ("loss", "recon_loss", "pl", "dl", "kl_loss", "kl_chd",
                "kl_rhy", "chord_loss", "root_loss", "chroma_loss",
                "bass_loss")


def init_params(key: jax.Array, cfg: ModelConfig) -> dict:
    ks = jax.random.split(key, 4)
    if cfg.txt_encoder == "conv":
        txt = txt_enc.init_conv(ks[1], cfg)
    elif cfg.txt_encoder == "pianotree":
        txt = txt_enc.init_pianotree(ks[1], cfg)
    else:
        raise ValueError(f"unknown texture encoder {cfg.txt_encoder!r}")
    return {
        "chd_enc": chd_enc.init(ks[0], cfg),
        "txt_enc": txt,
        "dec": pt_dec.init(ks[2], cfg),
        "chd_dec": chd_dec.init(ks[3], cfg),
    }


def confuse_pr_mat(key: jax.Array, pr_mat: jnp.ndarray) -> jnp.ndarray:
    """Pitch-neighbor corruption regularizer: every non-zero entry copies its
    value onto a random +-1 pitch neighbor, originals preserved (capability of
    the reference's unused confuse_prmat, model.py:22-29 — there invoked on
    nonzero() indices; here expressed densely for jit as two masked shifts)."""
    eps_up = jax.random.bernoulli(key, 0.5, pr_mat.shape)
    up_src = jnp.where(eps_up, pr_mat, 0.0)
    down_src = jnp.where(eps_up, 0.0, pr_mat)
    shifted_up = jnp.concatenate(
        [jnp.zeros_like(up_src[..., :1]), up_src[..., :-1]], axis=-1)
    shifted_down = jnp.concatenate(
        [down_src[..., 1:], jnp.zeros_like(down_src[..., :1])], axis=-1)
    out = jnp.where(shifted_up != 0, shifted_up, pr_mat)
    return jnp.where(shifted_down != 0, shifted_down, out)


def get_chroma(pr_mat: jnp.ndarray) -> jnp.ndarray:
    """Log-chroma summary of a duration matrix, per beat (capability of the
    reference's unused get_chroma, model.py:31-40): (B, 32, 128) -> (B, 8, 12).
    """
    B = pr_mat.shape[0]
    padded = jnp.concatenate(
        [pr_mat, jnp.zeros((B, pr_mat.shape[1], 4), pr_mat.dtype)], axis=-1)
    c = padded.reshape(B, pr_mat.shape[1], -1, 12).sum(axis=-2)
    c = c.reshape(B, 8, 4, 12).sum(axis=-2)
    return jnp.log(c + 1.0)


def _texture_dist(params: dict, cfg: ModelConfig, pr_mat: jnp.ndarray,
                  dt_x: Optional[jnp.ndarray]) -> DiagNormal:
    if cfg.txt_encoder == "conv":
        return txt_enc.apply_conv(params["txt_enc"], pr_mat)
    lengths = txt_enc.lengths_from_detrended(dt_x)
    return txt_enc.apply_pianotree(params["txt_enc"], dt_x, lengths)


def _apply_precision(params: dict, cfg: ModelConfig, *floats):
    """Cast params (Gaussian heads excluded) + float inputs to the compute
    dtype; bf16 runs the MXU path at 2x (see utils.precision). The Gaussian
    distributions and losses stay f32 via dtype promotion at the heads."""
    dtype = jnp.dtype(cfg.compute_dtype)
    if dtype == jnp.float32:
        return (params,) + floats
    params = precision.cast_params(params, dtype)
    return (params,) + tuple(None if f is None else f.astype(dtype)
                             for f in floats)


def _forward_parts(params: dict, cfg: ModelConfig, key: jax.Array, x, c,
                   pr_mat, dt_x, tfr1, tfr2, tfr3, sample: bool):
    """Everything of the teacher-forced forward EXCEPT the PianoTree decode:
    embeddings, encoders, z, teacher coins and the chord-decoder recon.
    Split out so loss() can route the decode into the fused decode+CE kernel
    (fused_loss mode) without duplicating — or reordering the RNG of —
    the surrounding graph."""
    spec = cfg.pianotree
    k_chd, k_rhy, k_coins, k_coin3 = jax.random.split(key, 4)
    params, c, pr_mat, dt_x = _apply_precision(params, cfg, c, pr_mat, dt_x)
    dtype = jnp.dtype(cfg.compute_dtype)

    x_emb, lengths = pt_dec.emb_x(params["dec"], x, spec)
    dist_chd = chd_enc.apply(params["chd_enc"], c)
    dist_rhy = _texture_dist(params, cfg, pr_mat, dt_x)
    z_chd = dist_chd.sample_or_mean(k_chd, sample)
    z_rhy = dist_rhy.sample_or_mean(k_rhy, sample)
    z = jnp.concatenate([z_chd, z_rhy], axis=-1).astype(dtype)

    coins1, coins2 = pt_dec.draw_coins(k_coins, cfg, tfr1, tfr2)
    coins3 = jax.random.uniform(k_coin3, (cfg.chord.num_step,)) < tfr3
    recon_chd = chd_dec.apply(params["chd_dec"], z_chd.astype(dtype), c,
                              coins3, cfg.chord.num_step)
    return (params, x_emb, lengths, dist_chd, dist_rhy, z, coins1, coins2,
            recon_chd)


def run(params: dict, cfg: ModelConfig, key: jax.Array, x: jnp.ndarray,
        c: jnp.ndarray, pr_mat: jnp.ndarray, dt_x: Optional[jnp.ndarray],
        tfr1, tfr2, tfr3, sample: bool = True):
    """Teacher-forced forward pass (reference model.py:42-55).

    x (B,32,K,6) int grid; c (B,8,36); pr_mat (B,32,128);
    dt_x (B,32,16,39) — required iff cfg.txt_encoder == 'pianotree'.
    ``sample=False`` uses posterior means (deterministic eval / parity tests).
    """
    (params, x_emb, lengths, dist_chd, dist_rhy, z, coins1, coins2,
     recon_chd) = _forward_parts(params, cfg, key, x, c, pr_mat, dt_x,
                                 tfr1, tfr2, tfr3, sample)
    out = pt_dec.decode(params["dec"], cfg, z, x_emb, lengths, coins1, coins2)
    recon_root, recon_chroma, recon_bass = recon_chd
    return out, dist_chd, dist_rhy, recon_root, recon_chroma, recon_bass


def chord_loss(c: jnp.ndarray, recon_root, recon_chroma, recon_bass):
    """Root/chroma/bass CE (reference model.py:70-83)."""
    root = jnp.argmax(c[:, :, 0:12], axis=-1)
    chroma = c[:, :, 12:24].astype(jnp.int32)
    bass = jnp.argmax(c[:, :, 24:], axis=-1)
    root_l = cross_entropy_mean(recon_root, root)
    chroma_l = cross_entropy_mean(recon_chroma, chroma)
    bass_l = cross_entropy_mean(recon_bass, bass)
    return root_l + chroma_l + bass_l, root_l, chroma_l, bass_l


def loss(params: dict, cfg: ModelConfig, key: jax.Array, x, c, pr_mat,
         dt_x=None, tfr1=0.0, tfr2=0.0, tfr3=0.0, beta=0.1,
         weights=(1.0, 0.5), weighted_dur: bool = False, sample: bool = True,
         axis_name=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """ELBO + auxiliary chord loss; returns (total, 11-metric dict matching
    the reference writer names, model.py:57-68 / train.py:54-55).

    ``axis_name``: when running sharded under shard_map, the mesh axis (or
    axes) over which the masked-CE terms reduce globally — making a
    data-parallel loss/grad EXACTLY equal the single-program one. The other
    terms (chord CE, KL) are plain means over equal-sized shards, already
    exact under the caller's pmean."""
    if cfg.fused_loss and cfg.train_frame_kernel:
        # fused decode+CE: the per-frame kernel emits masked-CE numerator
        # partials and the logits never leave VMEM
        (p_cast, x_emb, lengths, dist_chd, dist_rhy, z, coins1, coins2,
         recon_chd) = _forward_parts(params, cfg, key, x, c, pr_mat, dt_x,
                                     tfr1, tfr2, tfr3, sample)
        recon, pl, dl = pt_dec.decode_recon(
            p_cast["dec"], cfg, z, x_emb, lengths, coins1, coins2, x,
            weights, weighted_dur, axis_name=axis_name)
        r_root, r_chroma, r_bass = recon_chd
    else:
        out, dist_chd, dist_rhy, r_root, r_chroma, r_bass = run(
            params, cfg, key, x, c, pr_mat, dt_x, tfr1, tfr2, tfr3, sample)
        recon, pl, dl = pt_dec.recon_loss(x, out, cfg.pianotree, weights,
                                          weighted_dur, axis_name=axis_name)
    kl_chd = kl_std_normal(dist_chd)
    kl_rhy = kl_std_normal(dist_rhy)
    kl = kl_chd + kl_rhy
    chord, root_l, chroma_l, bass_l = chord_loss(c, r_root, r_chroma, r_bass)
    total = recon + beta * kl + chord
    metrics = dict(zip(METRIC_NAMES, (total, recon, pl, dl, kl, kl_chd,
                                      kl_rhy, chord, root_l, chroma_l,
                                      bass_l)))
    return total, metrics


# ---------------------------------------------------------------------------
# inference / latent-control API
# ---------------------------------------------------------------------------

def encode(params: dict, cfg: ModelConfig, pr_mat, c, dt_x=None
           ) -> Tuple[DiagNormal, DiagNormal]:
    """Posterior distributions (reference inference_encode, model.py:117)."""
    params, c, pr_mat, dt_x = _apply_precision(params, cfg, c, pr_mat, dt_x)
    return (chd_enc.apply(params["chd_enc"], c),
            _texture_dist(params, cfg, pr_mat, dt_x))


def encode_chord(params: dict, cfg: ModelConfig, c) -> DiagNormal:
    """Chord latent alone from an expanded (B, 8, 36) chord tensor — the
    entry point for chord-symbol-conditioned generation (scripts/generate.py)
    where no piano roll exists."""
    params, c = _apply_precision(params, cfg, c)
    return chd_enc.apply(params["chd_enc"], c)


def decode_z(params: dict, cfg: ModelConfig, z_chd, z_rhy,
             frame_decoder: str = "xla") -> jnp.ndarray:
    """Pure autoregressive decode of latents -> estimated grid
    (B, 32, K-1, 6) (reference inference_decode, model.py:124-131).
    ``frame_decoder='pallas'`` selects the fused VMEM sampling kernel."""
    z = jnp.concatenate([z_chd, z_rhy], axis=-1)
    params, z = _apply_precision(params, cfg, z)
    return pt_dec.decode_grid(params["dec"], cfg, z,
                              frame_decoder=frame_decoder)


def inference(params: dict, cfg: ModelConfig, pr_mat, c, sample: bool,
              key: Optional[jax.Array] = None, dt_x=None) -> jnp.ndarray:
    """Encode -> (sample | mean) -> decode (reference model.py:133-143)."""
    dist_chd, dist_rhy = encode(params, cfg, pr_mat, c, dt_x)
    if sample:
        k1, k2 = jax.random.split(key)
        z_chd, z_rhy = dist_chd.rsample(k1), dist_rhy.rsample(k2)
    else:
        z_chd, z_rhy = dist_chd.mean, dist_rhy.mean
    return decode_z(params, cfg, z_chd, z_rhy)


def swap(params: dict, cfg: ModelConfig, pr_mat1, pr_mat2, c1, c2,
         fix_rhy: bool, fix_chd: bool, dt_x1=None, dt_x2=None) -> jnp.ndarray:
    """Compositional style transfer (reference model.py:145-149)."""
    pr_mat = pr_mat1 if fix_rhy else pr_mat2
    dt_x = dt_x1 if fix_rhy else dt_x2
    c = c1 if fix_chd else c2
    return inference(params, cfg, pr_mat, c, sample=False, dt_x=dt_x)


def posterior_sample(params: dict, cfg: ModelConfig, key: jax.Array, pr_mat,
                     c, scale: Optional[float] = None, sample_chd: bool = True,
                     sample_txt: bool = True, dt_x=None) -> jnp.ndarray:
    """Texture/chord variation by sampling around the posterior
    (reference model.py:151-172)."""
    dist_chd, dist_rhy = encode(params, cfg, pr_mat, c, dt_x)
    if scale is not None:
        dist_chd = DiagNormal(dist_chd.mean, dist_chd.std * scale)
        dist_rhy = DiagNormal(dist_rhy.mean, dist_rhy.std * scale)
    k1, k2 = jax.random.split(key)
    z_chd = dist_chd.rsample(k1) if sample_chd else dist_chd.mean
    z_rhy = dist_rhy.rsample(k2) if sample_txt else dist_rhy.mean
    return decode_z(params, cfg, z_chd, z_rhy)


def prior_sample(params: dict, cfg: ModelConfig, key: jax.Array, pr_mat, c,
                 sample_chd: bool = False, sample_rhy: bool = False,
                 scale: float = 1.0, dt_x=None) -> jnp.ndarray:
    """Replace chord and/or texture latent with N(0, scale^2) draws
    (reference model.py:174-184)."""
    dist_chd, dist_rhy = encode(params, cfg, pr_mat, c, dt_x)
    if sample_chd:
        dist_chd = DiagNormal(jnp.zeros_like(dist_chd.mean),
                              jnp.full_like(dist_chd.std, scale))
    if sample_rhy:
        dist_rhy = DiagNormal(jnp.zeros_like(dist_rhy.mean),
                              jnp.full_like(dist_rhy.std, scale))
    k1, k2 = jax.random.split(key)
    return decode_z(params, cfg, dist_chd.rsample(k1), dist_rhy.rsample(k2))


def gt_sample(x: jnp.ndarray) -> np.ndarray:
    """Ground-truth grid sans sos slot (reference model.py:186-188)."""
    return host.fetch_np(jnp.asarray(x)[:, :, 1:])


def interp_path(z1: np.ndarray, z2: np.ndarray, int_count: int = 10
                ) -> np.ndarray:
    """SLERP on normalized directions + log-linear norm interpolation
    (reference model.py:218-242). Host-side numpy on small latents."""
    shape = z1.shape
    z1 = z1.reshape(-1)
    z2 = z2.reshape(-1)
    n1, n2 = np.linalg.norm(z1), np.linalg.norm(z2)
    u1, u2 = z1 / n1, z2 / n2
    omega = np.arccos(np.clip(np.dot(u1, u2), -1.0, 1.0))
    so = np.sin(omega)
    t = np.linspace(0.0, 1.0, int_count)
    if so < 1e-8:
        dirs = (1 - t)[:, None] * u1[None] + t[:, None] * u2[None]
    else:
        dirs = (np.sin((1 - t) * omega)[:, None] / so * u1[None] +
                np.sin(t * omega)[:, None] / so * u2[None])
    norms = np.exp(np.linspace(np.log(n1), np.log(n2), int_count))
    return (dirs * norms[:, None]).reshape((int_count,) + shape)


def interp(params: dict, cfg: ModelConfig, pr_mat1, c1, pr_mat2, c2,
           interp_chd: bool = False, interp_rhy: bool = False,
           int_count: int = 10, dt_x1=None, dt_x2=None) -> np.ndarray:
    """Latent interpolation decode (reference model.py:190-209).
    Returns (B, int_count, 32, K-1, 6)."""
    d_chd1, d_rhy1 = encode(params, cfg, pr_mat1, c1, dt_x1)
    d_chd2, d_rhy2 = encode(params, cfg, pr_mat2, c2, dt_x2)
    z_chd1, z_rhy1 = np.asarray(d_chd1.mean), np.asarray(d_rhy1.mean)
    z_chd2, z_rhy2 = np.asarray(d_chd2.mean), np.asarray(d_rhy2.mean)
    B = z_chd1.shape[0]
    if interp_chd:
        z_chds = np.stack([interp_path(a, b, int_count)
                           for a, b in zip(z_chd1, z_chd2)])
    else:
        z_chds = np.repeat(z_chd1[:, None], int_count, axis=1)
    if interp_rhy:
        z_rhys = np.stack([interp_path(a, b, int_count)
                           for a, b in zip(z_rhy1, z_rhy2)])
    else:
        z_rhys = np.repeat(z_rhy1[:, None], int_count, axis=1)
    est = decode_z(params, cfg,
                   jnp.asarray(z_chds.reshape(B * int_count, -1)),
                   jnp.asarray(z_rhys.reshape(B * int_count, -1)))
    K1 = cfg.pianotree.max_simu_note - 1
    # host.fetch_np: decode grids carry the Mosaic tiled layout; direct
    # np.asarray de-tiles at ~4 KB/s through the transfer path (host.py)
    return host.fetch_np(est).reshape(B, int_count, cfg.pianotree.num_step,
                                      K1, 6)


# ---------------------------------------------------------------------------
# convenience wrapper
# ---------------------------------------------------------------------------

class DisentangleVAE:
    """cfg + params + jitted entry points (factory parity with reference
    DisentangleVAE.init_model, model.py:244-265)."""

    def __init__(self, cfg: ModelConfig, params: dict):
        self.cfg = cfg
        self.params = params
        self._loss = jax.jit(partial(loss, cfg=cfg))
        self._decode_z = jax.jit(partial(decode_z, cfg=cfg))

    @staticmethod
    def init_model(key: Optional[jax.Array] = None,
                   cfg: Optional[ModelConfig] = None) -> "DisentangleVAE":
        cfg = cfg or ModelConfig()
        key = key if key is not None else jax.random.PRNGKey(0)
        return DisentangleVAE(cfg, init_params(key, cfg))

    def loss(self, key, x, c, pr_mat, dt_x=None, **kw):
        return self._loss(self.params, key=key, x=x, c=c, pr_mat=pr_mat,
                          dt_x=dt_x, **kw)

    def swap(self, pr_mat1, pr_mat2, c1, c2, fix_rhy, fix_chd, **kw):
        return swap(self.params, self.cfg, pr_mat1, pr_mat2, c1, c2,
                    fix_rhy, fix_chd, **kw)

    def posterior_sample(self, key, pr_mat, c, **kw):
        return posterior_sample(self.params, self.cfg, key, pr_mat, c, **kw)

    def prior_sample(self, key, pr_mat, c, **kw):
        return prior_sample(self.params, self.cfg, key, pr_mat, c, **kw)

    def interp(self, pr_mat1, c1, pr_mat2, c2, **kw):
        return interp(self.params, self.cfg, pr_mat1, c1, pr_mat2, c2, **kw)

    def inference(self, pr_mat, c, sample=False, key=None, dt_x=None):
        return inference(self.params, self.cfg, pr_mat, c, sample, key, dt_x)

    # -- persistence (capability of reference load_model, module.py:46-53) --

    def save(self, path: str):
        from pctd_tpu.train.checkpoint import save_state
        save_state(path, self.params)

    def load(self, path: str) -> "DisentangleVAE":
        from pctd_tpu.train.checkpoint import restore_state
        self.params = restore_state(path, self.params)
        return self

    @staticmethod
    def from_train_checkpoint(path: str,
                              cfg: Optional[ModelConfig] = None
                              ) -> "DisentangleVAE":
        """Load the params from a full TrainState checkpoint written by the
        Trainer (models/<name>_{epoch,valid,final})."""
        from pctd_tpu.train.checkpoint import restore_state
        from pctd_tpu.train.trainer import init_state
        from pctd_tpu.config import TrainConfig

        cfg = cfg or ModelConfig()
        template, _ = init_state(jax.random.PRNGKey(0), cfg, TrainConfig())
        state = restore_state(path, template)
        return DisentangleVAE(cfg, state.params)
