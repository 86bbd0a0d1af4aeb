"""Auxiliary regularizers (get_chroma / confuse_pr_mat) + the 32-bar stretch
configuration (num_step=128) from BASELINE.md."""
import dataclasses

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from pctd_tpu.config import ModelConfig, PianoTreeSpec, ChordSpec
from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.models import pianotree_decoder as ptd

from tests.reference_oracle import load_reference, reference_available
from tests.test_models_parity import random_batch

REF = load_reference()
needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference tree not mounted")


@needs_ref
def test_get_chroma_parity():
    _, _, pr_mat = random_batch(3, seed=30)
    ref_model = REF.model.DisentangleVAE.__new__(REF.model.DisentangleVAE)
    ref_model.device = torch.device("cpu")
    want = REF.model.DisentangleVAE.get_chroma(
        ref_model, torch.from_numpy(pr_mat))
    got = dv.get_chroma(jnp.asarray(pr_mat))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)


def test_confuse_pr_mat_properties():
    _, _, pr_mat = random_batch(2, seed=31)
    pm = jnp.asarray(pr_mat)
    out = dv.confuse_pr_mat(jax.random.PRNGKey(0), pm)
    out = np.asarray(out)
    # original non-zero entries are preserved (possibly overwritten by a
    # neighbor's copy, which is also the reference behavior)
    nz = pr_mat != 0
    assert (out[nz] != 0).all()
    # corruption added mass at neighbors
    assert (out != 0).sum() > nz.sum()
    # values only come from the original value set
    vals = set(np.unique(pr_mat)) | {0}
    assert set(np.unique(out)).issubset(vals)


def _stretch_cfg():
    """32-bar hierarchical config: num_step=128, chord seq 32 beats."""
    return dataclasses.replace(
        ModelConfig(),
        pianotree=PianoTreeSpec(num_step=128),
        chord=ChordSpec(num_step=32),
        chd_z_dim=16, txt_z_dim=16, chd_enc_hidden=24, txt_emb_size=24,
        txt_enc_hidden=24, chd_dec_hidden=24, chd_dec_z_in=16,
        note_emb_size=24, dec_emb_hidden=12, dec_time_hidden=32,
        dec_notes_hidden=16, dec_z_in=16, dec_dur_hidden=8)


@pytest.mark.slow
def test_stretch_32bar_decoder_shapes():
    cfg = _stretch_cfg()
    spec = cfg.pianotree
    params = ptd.init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    out = ptd.decode(params, cfg, z)
    assert out.pitch_logits.shape == (2, 128, spec.max_simu_note - 1,
                                      spec.pitch_range)
    assert out.dur_logits.shape == (2, 128, spec.max_simu_note - 1, 5, 2)


@pytest.mark.slow
def test_stretch_32bar_full_loss():
    """Full VAE loss on 128-step segments built from tiled 2-bar rolls; the
    texture conv encoder generalizes (its GRU length scales with num_step)."""
    cfg = _stretch_cfg()
    params = dv.init_params(jax.random.PRNGKey(2), cfg)
    x, c, pr_mat = random_batch(2, seed=32)
    x4 = np.tile(x, (1, 4, 1, 1))
    c4 = np.tile(c, (1, 4, 1))
    pm4 = np.tile(pr_mat, (1, 4, 1))
    total, metrics = dv.loss(params, cfg, jax.random.PRNGKey(3),
                             jnp.asarray(x4), jnp.asarray(c4),
                             jnp.asarray(pm4), tfr1=0.5, tfr2=0.5, tfr3=0.5)
    assert np.isfinite(float(total))
    assert all(np.isfinite(float(v)) for v in metrics.values())


@pytest.mark.slow  # interpret-mode kernel over 128 frames, ~2min
def test_stretch_32bar_frame_kernel_loss_parity():
    """The fused train-frame kernel at the 32-bar stretch T (num_step=128):
    whole-VAE loss + all metrics must match the XLA scan path. Replaces the
    stretch-T kernel coverage that lived in the retired whole-sequence
    kernel's suite (the per-frame kernel is T-independent, but decode_recon's
    scan over T frames and its partials accumulation are exercised at the
    stretch length here)."""
    cfg = _stretch_cfg()
    fused = dataclasses.replace(cfg, train_frame_kernel=True)
    assert fused.fused_loss
    params = dv.init_params(jax.random.PRNGKey(2), cfg)
    x, c, pr_mat = random_batch(2, seed=33)
    x4 = np.tile(x, (1, 4, 1, 1))
    c4 = np.tile(c, (1, 4, 1))
    pm4 = np.tile(pr_mat, (1, 4, 1))
    key = jax.random.PRNGKey(4)
    _, mx = dv.loss(params, cfg, key, jnp.asarray(x4), jnp.asarray(c4),
                    jnp.asarray(pm4), tfr1=0.5, tfr2=0.5, tfr3=0.5)
    _, mk = dv.loss(params, fused, key, jnp.asarray(x4), jnp.asarray(c4),
                    jnp.asarray(pm4), tfr1=0.5, tfr2=0.5, tfr3=0.5)
    for k in mx:
        np.testing.assert_allclose(float(mk[k]), float(mx[k]), rtol=2e-5,
                                   err_msg=k)
