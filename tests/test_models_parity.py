"""Module-level numerical parity vs the reference PyTorch implementation
(weights transplanted; deterministic teacher-coin configurations)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch-oracle / mesh / compile-heavy
import torch
import jax.numpy as jnp

from pctd_tpu.config import ModelConfig
from pctd_tpu.models import (chord_encoder, texture_encoder, chord_decoder,
                             pianotree_decoder as ptd)
from pctd_tpu.data import converter as cv

from tests.reference_oracle import load_reference, reference_available
from tests import torch_bridge as tb
from tests.test_converter import rolls_for_tests

REF = load_reference()
needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference tree not mounted")

CFG = ModelConfig()


def random_batch(B=2, seed=0):
    """A realistic (x grid, chord, pr_mat) batch from random well-formed rolls."""
    rng = np.random.RandomState(seed)
    prs = rolls_for_tests(B, seed=seed)
    pr_mats = cv.piano_roll_to_target(cv.pr_to_onehot_pr(prs))
    grids = cv.batch_target_to_3dtarget(pr_mats)
    chords = np.zeros((B, 8, 14))
    chords[..., 0] = rng.randint(0, 12, (B, 8))
    chords[..., 1:13] = rng.randint(0, 2, (B, 8, 12))
    chords[..., 13] = rng.randint(0, 12, (B, 8))
    cexp = cv.batch_expand_chord(chords, np.zeros(B, int))
    return (grids.astype(np.int64), cexp.astype(np.float32),
            pr_mats.astype(np.float32))


@needs_ref
def test_chord_encoder_parity():
    torch.manual_seed(0)
    ref = REF.ptvae.RnnEncoder(36, 64, 16)
    p = tb.chord_encoder_params(ref)
    _, c, _ = random_batch(3, seed=1)
    with torch.no_grad():
        dist = ref(torch.from_numpy(c))
    got = chord_encoder.apply(p, jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(got.mean), dist.mean.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.std), dist.scale.numpy(),
                               atol=1e-5)


@needs_ref
def test_texture_conv_encoder_parity():
    torch.manual_seed(1)
    ref = REF.ptvae.TextureEncoder(32, 24, 8, num_channel=10)
    p = tb.texture_conv_params(ref)
    _, _, pr_mat = random_batch(3, seed=2)
    with torch.no_grad():
        dist = ref(torch.from_numpy(pr_mat))
    got = texture_encoder.apply_conv(p, jnp.asarray(pr_mat))
    np.testing.assert_allclose(np.asarray(got.mean), dist.mean.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.std), dist.scale.numpy(),
                               atol=1e-5)


@needs_ref
def test_pianotree_encoder_parity():
    torch.manual_seed(2)
    ref = REF.ptvae.PtvaeEncoder(device="cpu", max_simu_note=16,
                                 max_pitch=127, min_pitch=0,
                                 note_emb_size=32, enc_notes_hid_size=16,
                                 enc_time_hid_size=24, z_size=8)
    p = tb.texture_pianotree_params(ref)
    x, _, _ = random_batch(2, seed=3)
    with torch.no_grad():
        dist, _, _ = ref(torch.from_numpy(x))
    spec = CFG.pianotree
    mh = ptd.grid_to_multihot(jnp.asarray(x), spec)
    lens = ptd.grid_lengths(jnp.asarray(x), spec)
    got = texture_encoder.apply_pianotree(p, mh, lens)
    np.testing.assert_allclose(np.asarray(got.mean), dist.mean.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.std), dist.scale.numpy(),
                               atol=1e-5)


@needs_ref
@pytest.mark.parametrize("tfr", [0.0, 1.0])
def test_chord_decoder_parity(tfr):
    # B=1 for the argmax-feedback path: the reference's feedback one-hot has a
    # cross-batch indexing bug (ptvae.py:73-77) that only vanishes at B=1; we
    # implement per-sample one-hots (see chord_decoder.py docstring). At
    # tfr=1 the feedback token is replaced by ground truth, so any B works.
    B = 3 if tfr > 0.5 else 1
    torch.manual_seed(3)
    ref = REF.ptvae.RnnDecoder(input_dim=36, z_input_dim=16, hidden_dim=24,
                               z_dim=8, num_step=32)
    p = tb.chord_decoder_params(ref)
    rng = np.random.RandomState(4)
    z = rng.randn(B, 8).astype(np.float32)
    _, c, _ = random_batch(B, seed=5)
    with torch.no_grad():
        r_root, r_chroma, r_bass = ref(torch.from_numpy(z), False, tfr,
                                       torch.from_numpy(c))
    coins = jnp.full((8,), tfr > 0.5, dtype=bool)
    g_root, g_chroma, g_bass = chord_decoder.apply(
        p, jnp.asarray(z), jnp.asarray(c), coins, num_step=8)
    np.testing.assert_allclose(np.asarray(g_root), r_root.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_chroma), r_chroma.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_bass), r_bass.numpy(), atol=1e-5)


@needs_ref
def test_chord_decoder_inference_parity():
    torch.manual_seed(3)
    ref = REF.ptvae.RnnDecoder(input_dim=36, z_input_dim=16, hidden_dim=24,
                               z_dim=8, num_step=32)
    p = tb.chord_decoder_params(ref)
    z = np.random.RandomState(6).randn(1, 8).astype(np.float32)
    with torch.no_grad():
        r_root, r_chroma, r_bass = ref(torch.from_numpy(z), True, 0.7, None)
    g_root, g_chroma, g_bass = chord_decoder.apply(
        p, jnp.asarray(z), None, None, num_step=8)
    np.testing.assert_allclose(np.asarray(g_root), r_root.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_chroma), r_chroma.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_bass), r_bass.numpy(), atol=1e-5)


def _small_ptdec(seed=4):
    torch.manual_seed(seed)
    ref = REF.ptvae.PtvaeDecoder(device="cpu", note_embedding=None,
                                 max_simu_note=16, max_pitch=127, min_pitch=0,
                                 num_step=32, note_emb_size=32, z_size=24,
                                 dec_emb_hid_size=16, dec_time_hid_size=48,
                                 dec_notes_hid_size=20, dec_z_in_size=12,
                                 dec_dur_hid_size=10)
    import dataclasses
    cfg = dataclasses.replace(
        ModelConfig(), chd_z_dim=12, txt_z_dim=12, note_emb_size=32,
        dec_emb_hidden=16, dec_time_hidden=48, dec_notes_hidden=20,
        dec_z_in=12, dec_dur_hidden=10)
    return ref, tb.pianotree_decoder_params(ref), cfg


@needs_ref
@pytest.mark.parametrize("tfr", [(0.0, 0.0), (1.0, 1.0), (1.0, 0.0),
                                 (0.0, 1.0)])
def test_pianotree_decoder_teacher_forced_parity(tfr):
    tfr1, tfr2 = tfr
    ref, p, cfg = _small_ptdec()
    spec = cfg.pianotree
    x, _, _ = random_batch(2, seed=7)
    z = np.random.RandomState(8).randn(2, 24).astype(np.float32)

    xt = torch.from_numpy(x)
    with torch.no_grad():
        emb_t, len_t = ref.emb_x(xt)
        pitch_t, dur_t = ref.decoder(torch.from_numpy(z), False, emb_t,
                                     len_t, tfr1, tfr2)

    x_emb, lengths = ptd.emb_x(p, jnp.asarray(x), spec)
    np.testing.assert_allclose(np.asarray(x_emb), emb_t.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lengths), len_t.numpy())
    coins1 = jnp.full((spec.num_step,), tfr1 > 0.5, dtype=bool)
    coins2 = jnp.full((spec.num_step, spec.max_simu_note), tfr2 > 0.5,
                      dtype=bool)
    out = ptd.decode(p, cfg, jnp.asarray(z), x_emb, lengths, coins1, coins2)
    np.testing.assert_allclose(np.asarray(out.pitch_logits), pitch_t.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.dur_logits),
        dur_t.numpy().reshape(out.dur_logits.shape), atol=2e-4)


@needs_ref
def test_pianotree_decoder_inference_parity():
    ref, p, cfg = _small_ptdec(seed=9)
    z = np.random.RandomState(10).randn(2, 24).astype(np.float32)
    with torch.no_grad():
        pitch_t, dur_t = ref.decoder(torch.from_numpy(z), True, None, None,
                                     0, 0)
    out = ptd.decode(p, cfg, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(out.pitch_logits), pitch_t.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out.dur_logits),
        dur_t.numpy().reshape(out.dur_logits.shape), atol=2e-4)


@needs_ref
def test_recon_loss_parity():
    ref, p, cfg = _small_ptdec(seed=11)
    spec = cfg.pianotree
    x, _, _ = random_batch(2, seed=12)
    z = np.random.RandomState(13).randn(2, 24).astype(np.float32)
    x_emb, lengths = ptd.emb_x(p, jnp.asarray(x), spec)
    coins1 = jnp.ones((spec.num_step,), bool)
    coins2 = jnp.ones((spec.num_step, spec.max_simu_note), bool)
    out = ptd.decode(p, cfg, jnp.asarray(z), x_emb, lengths, coins1, coins2)

    with torch.no_grad():
        for weighted in (False, True):
            l_t, pl_t, dl_t = ref.recon_loss(
                torch.from_numpy(x),
                torch.from_numpy(np.asarray(out.pitch_logits)),
                torch.from_numpy(np.asarray(out.dur_logits)),
                weights=(1, 0.5), weighted_dur=weighted)
            l_j, pl_j, dl_j = ptd.recon_loss(jnp.asarray(x), out, spec,
                                             (1.0, 0.5), weighted)
            np.testing.assert_allclose(float(l_j), l_t.item(), rtol=1e-5)
            np.testing.assert_allclose(float(pl_j), pl_t.item(), rtol=1e-5)
            np.testing.assert_allclose(float(dl_j), dl_t.item(), rtol=1e-5)
