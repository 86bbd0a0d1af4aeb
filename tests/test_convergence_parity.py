"""Multi-epoch training-trajectory parity vs the live torch reference.

The round-1 parity evidence was single-step (transplanted-weight 11-term loss
parity). What that cannot catch is optimizer / LR-schedule / clipping /
beta-annealing drift compounding over many updates. Here both frameworks
train end-to-end on the SAME corpus from the SAME transplanted initial
weights with deterministic semantics (posterior means, full teacher forcing
— removing RNG-draw differences so any trajectory divergence is real
numerics drift), and the per-step loss curves must track each other:

  torch:  Adam(lr) + MinExponentialLR(gamma, floor) + clip_grad_norm_(1)
          (reference train.py:50-52, module.py:140-144, example.py:4-13)
  jax:    schedules.make_optimizer (optax adam + exponential_decay floor +
          clip_by_global_norm) — the claim under test.

beta follows the reference's kl_anealing schedule on both sides (identical
scalar series by construction, schedules.train_params_at).
"""
import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains the torch reference on CPU

import torch
import jax
import jax.numpy as jnp

from pctd_tpu.config import DataConfig, TrainConfig
from pctd_tpu.data.loaders import make_loaders
from pctd_tpu.data.synthetic import synthetic_corpora
from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.train import schedules
from pctd_tpu.train.trainer import batch_features

from tests import torch_bridge as tb
from tests.reference_oracle import load_reference, reference_available
from tests.test_training import SMALL

REF = load_reference()
needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference tree not mounted")

BS = 8
STEPS_PER_EPOCH = 8
EPOCHS = 2


def _build_ref_small():
    """Reference modules at the SMALL dims (test_training.SMALL)."""
    torch.manual_seed(0)
    chd_enc = REF.ptvae.RnnEncoder(36, SMALL.chd_enc_hidden, SMALL.chd_z_dim)
    rhy_enc = REF.ptvae.TextureEncoder(SMALL.txt_emb_size,
                                       SMALL.txt_enc_hidden, SMALL.txt_z_dim,
                                       SMALL.txt_conv_channels)
    chd_dec = REF.ptvae.RnnDecoder(input_dim=36,
                                   z_input_dim=SMALL.chd_dec_z_in,
                                   hidden_dim=SMALL.chd_dec_hidden,
                                   z_dim=SMALL.chd_z_dim)
    pt_dec = REF.ptvae.PtvaeDecoder(
        device="cpu", note_embedding=None, max_simu_note=16, max_pitch=127,
        min_pitch=0, num_step=32, note_emb_size=SMALL.note_emb_size,
        z_size=SMALL.z_dim, dec_emb_hid_size=SMALL.dec_emb_hidden,
        dec_time_hid_size=SMALL.dec_time_hidden,
        dec_notes_hid_size=SMALL.dec_notes_hidden,
        dec_z_in_size=SMALL.dec_z_in, dec_dur_hid_size=SMALL.dec_dur_hidden)
    return REF.model.DisentangleVAE("parity", torch.device("cpu"), chd_enc,
                                    rhy_enc, pt_dec, chd_dec)


def _shared_batches():
    """One fixed corpus -> identical (x, c, pr_mat) batch streams."""
    dcfg = dataclasses.replace(DataConfig(), portion=4)
    train_c, _ = synthetic_corpora(n_songs=6, seed=11, n_bars=8, cfg=dcfg)
    tl, _ = make_loaders(train_c, train_c, batch_size=BS, seed=3)
    batches = []
    it = tl.epoch()
    while len(batches) < STEPS_PER_EPOCH:
        try:
            b = next(it)
        except StopIteration:
            it = tl.epoch()
            continue
        x, c, pr_mat, _ = batch_features(jnp.asarray(b["pr"]),
                                         jnp.asarray(b["chord"]),
                                         jnp.asarray(b["shift"]), SMALL)
        batches.append((np.asarray(x, np.int64),    # torch CE wants Long
                        np.asarray(c, np.float32),
                        np.asarray(pr_mat, np.float32)))
    return batches


@needs_ref
def test_multiepoch_training_trajectory_parity():
    ref = _build_ref_small()
    params = {
        "chd_enc": tb.chord_encoder_params(ref.chd_encoder),
        "txt_enc": tb.texture_conv_params(ref.rhy_encoder),
        "dec": tb.pianotree_decoder_params(ref.decoder),
        "chd_dec": tb.chord_decoder_params(ref.chd_decoder),
    }
    # deep-copy: jnp.asarray(tensor.numpy()) may ALIAS torch memory on the
    # CPU backend, and torch's in-place Adam updates below would otherwise
    # leak into the "initial" jax params
    params = jax.tree_util.tree_map(lambda a: jnp.array(np.array(a)), params)
    batches = _shared_batches()
    tcfg = TrainConfig(batch_size=BS)
    n_steps = EPOCHS * STEPS_PER_EPOCH
    betas = [float(schedules.train_params_at(jnp.asarray(s), tcfg)["beta"])
             for s in range(n_steps)]

    # -- torch trajectory (the reference's exact optimizer stack) ----------
    import sys
    sys.path.insert(0, "/root/reference")
    from amc_dl.torch_plus.example import MinExponentialLR

    opt = torch.optim.Adam(ref.parameters(), lr=tcfg.lr)
    sched = MinExponentialLR(opt, gamma=tcfg.lr_decay, minimum=tcfg.lr_min)
    orig = REF.model.get_zs_from_dists
    REF.model.get_zs_from_dists = lambda dists, sample=False: \
        [d.mean for d in dists]
    torch_losses = []
    try:
        for s in range(n_steps):
            x, c, pr_mat = batches[s % STEPS_PER_EPOCH]
            opt.zero_grad()
            outs = ref.loss(torch.from_numpy(x), torch.from_numpy(c),
                            torch.from_numpy(pr_mat), tfr1=1.0, tfr2=1.0,
                            tfr3=1.0, beta=betas[s], weights=(1.0, 0.5))
            outs[0].backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), tcfg.clip_norm)
            opt.step()
            sched.step()
            torch_losses.append(float(outs[0].item()))
    finally:
        REF.model.get_zs_from_dists = orig

    # -- jax trajectory (this framework's optimizer stack) -----------------
    tx = schedules.make_optimizer(tcfg)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(0)           # consumed but inert (sample=False)

    @jax.jit
    def step(params, opt_state, x, c, pr_mat, beta):
        def loss_fn(p):
            total, _ = dv.loss(p, SMALL, key, x, c, pr_mat, tfr1=1.0,
                               tfr2=1.0, tfr3=1.0, beta=beta,
                               weights=(1.0, 0.5), sample=False)
            return total

        total, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax_apply(params, updates), opt_state, total

    import optax

    def optax_apply(p, u):
        return optax.apply_updates(p, u)

    jax_losses = []
    for s in range(n_steps):
        x, c, pr_mat = batches[s % STEPS_PER_EPOCH]
        params, opt_state, total = step(params, opt_state, jnp.asarray(x),
                                        jnp.asarray(c), jnp.asarray(pr_mat),
                                        jnp.asarray(betas[s]))
        jax_losses.append(float(total))

    t = np.asarray(torch_losses)
    j = np.asarray(jax_losses)
    print("torch:", np.round(t, 4).tolist())
    print("jax:  ", np.round(j, 4).tolist())

    # identical weights -> first step matches tightly (sanity anchor)
    np.testing.assert_allclose(j[0], t[0], rtol=1e-4)
    # per-step trajectory tracks within 1% across BOTH epochs (float drift
    # compounds through 16 Adam updates; anything structural — wrong LR
    # decay, clip mismatch, beta schedule skew — blows far past this)
    np.testing.assert_allclose(j, t, rtol=1e-2)
    # and both curves actually descend epoch over epoch
    e0_t, e1_t = t[:STEPS_PER_EPOCH].mean(), t[STEPS_PER_EPOCH:].mean()
    e0_j, e1_j = j[:STEPS_PER_EPOCH].mean(), j[STEPS_PER_EPOCH:].mean()
    assert e1_t < e0_t and e1_j < e0_j
    # epoch-mean agreement even tighter than per-step
    np.testing.assert_allclose([e0_j, e1_j], [e0_t, e1_t], rtol=5e-3)
