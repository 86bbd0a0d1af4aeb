"""End-to-end DisentangleVAE: full-dims loss parity vs the reference (with
transplanted weights and deterministic latents), plus smoke/grad tests for
both texture-encoder variants and the latent-control API."""
import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch-oracle / mesh / compile-heavy
import torch
import jax
import jax.numpy as jnp

from pctd_tpu.config import ModelConfig
from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.data.detrend import detrend_pianotree_batch

from tests.reference_oracle import load_reference, reference_available
from tests import torch_bridge as tb
from tests.test_models_parity import random_batch

REF = load_reference()
needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference tree not mounted")


@needs_ref
def test_full_vae_loss_parity_canonical_config():
    """All 11 loss terms match the reference DisentangleVAE.init_model
    (conv texture encoder, full dims) on an identical batch with z = posterior
    means and full teacher forcing."""
    torch.manual_seed(0)
    ref = REF.model.DisentangleVAE.init_model(device=torch.device("cpu"))
    params = {
        "chd_enc": tb.chord_encoder_params(ref.chd_encoder),
        "txt_enc": tb.texture_conv_params(ref.rhy_encoder),
        "dec": tb.pianotree_decoder_params(ref.decoder),
        "chd_dec": tb.chord_decoder_params(ref.chd_decoder),
    }
    cfg = ModelConfig()  # canonical dims

    x, c, pr_mat = random_batch(2, seed=20)

    # deterministic reference: posterior means instead of rsample
    orig = REF.model.get_zs_from_dists
    REF.model.get_zs_from_dists = lambda dists, sample=False: \
        [d.mean for d in dists]
    try:
        with torch.no_grad():
            ref_losses = ref.loss(torch.from_numpy(x), torch.from_numpy(c),
                                  torch.from_numpy(pr_mat), tfr1=1.0,
                                  tfr2=1.0, tfr3=1.0, beta=0.1,
                                  weights=(1, 0.5))
    finally:
        REF.model.get_zs_from_dists = orig

    total, metrics = dv.loss(params, cfg, jax.random.PRNGKey(0),
                             jnp.asarray(x), jnp.asarray(c),
                             jnp.asarray(pr_mat), tfr1=1.0, tfr2=1.0,
                             tfr3=1.0, beta=0.1, weights=(1.0, 0.5),
                             sample=False)
    for name, ref_val in zip(dv.METRIC_NAMES, ref_losses):
        np.testing.assert_allclose(float(metrics[name]), ref_val.item(),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("variant", ["conv", "pianotree"])
def test_vae_loss_and_grad_finite(variant):
    cfg = dataclasses.replace(
        ModelConfig(), txt_encoder=variant, chd_z_dim=16, txt_z_dim=16,
        chd_enc_hidden=24, txt_emb_size=24, txt_enc_hidden=24,
        chd_dec_hidden=24, chd_dec_z_in=16, note_emb_size=24,
        dec_emb_hidden=12, dec_time_hidden=32, dec_notes_hidden=16,
        dec_z_in=16, dec_dur_hidden=8, ptenc_note_emb=16,
        ptenc_notes_hidden=12, ptenc_time_hidden=16)
    params = dv.init_params(jax.random.PRNGKey(1), cfg)
    x, c, pr_mat = random_batch(2, seed=21)
    dt_x = detrend_pianotree_batch(x, c) if variant == "pianotree" else None

    def loss_fn(p):
        total, _ = dv.loss(p, cfg, jax.random.PRNGKey(2), jnp.asarray(x),
                           jnp.asarray(c), jnp.asarray(pr_mat),
                           dt_x=None if dt_x is None else jnp.asarray(dt_x),
                           tfr1=0.5, tfr2=0.5, tfr3=0.5)
        return total

    total, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(total))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # gradients reach every parameter group
    nonzero = [float(jnp.abs(g).max()) > 0 for g in leaves]
    assert sum(nonzero) > len(nonzero) * 0.9


def test_latent_control_api_shapes():
    cfg = dataclasses.replace(
        ModelConfig(), chd_z_dim=8, txt_z_dim=8, chd_enc_hidden=12,
        txt_emb_size=12, txt_enc_hidden=12, chd_dec_hidden=12,
        chd_dec_z_in=8, note_emb_size=12, dec_emb_hidden=8,
        dec_time_hidden=16, dec_notes_hidden=12, dec_z_in=8,
        dec_dur_hidden=8)
    params = dv.init_params(jax.random.PRNGKey(3), cfg)
    x, c, pr_mat = random_batch(2, seed=22)
    x2, c2, pr_mat2 = random_batch(2, seed=23)
    key = jax.random.PRNGKey(4)
    K1 = cfg.pianotree.max_simu_note - 1

    est = dv.swap(params, cfg, jnp.asarray(pr_mat), jnp.asarray(pr_mat2),
                  jnp.asarray(c), jnp.asarray(c2), fix_rhy=True, fix_chd=False)
    assert est.shape == (2, 32, K1, 6)

    est = dv.posterior_sample(params, cfg, key, jnp.asarray(pr_mat),
                              jnp.asarray(c), scale=0.5)
    assert est.shape == (2, 32, K1, 6)

    est = dv.prior_sample(params, cfg, key, jnp.asarray(pr_mat),
                          jnp.asarray(c), sample_chd=True, sample_rhy=True)
    assert est.shape == (2, 32, K1, 6)

    est = dv.interp(params, cfg, jnp.asarray(pr_mat), jnp.asarray(c),
                    jnp.asarray(pr_mat2), jnp.asarray(c2), interp_chd=True,
                    int_count=4)
    assert est.shape == (2, 4, 32, K1, 6)

    # decoded grids use the pitch vocabulary
    assert (np.asarray(est)[..., 0] <= cfg.pianotree.pitch_eos).all()


@needs_ref
def test_interp_path_parity():
    rng = np.random.RandomState(5)
    z1 = rng.randn(16).astype(np.float32)
    z2 = rng.randn(16).astype(np.float32)
    ref_model = REF.model.DisentangleVAE.__new__(REF.model.DisentangleVAE)
    ref_model.device = torch.device("cpu")
    want = REF.model.DisentangleVAE.interp_path(ref_model, z1.copy(),
                                                z2.copy(), 7)
    got = dv.interp_path(z1, z2, 7)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)
