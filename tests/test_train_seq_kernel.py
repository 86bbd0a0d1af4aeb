"""Whole-sequence fused training kernel (ops/pallas/train_seq): forward and
hand-written-VJP gradient parity vs the XLA nested-scan decode, in interpret
mode on CPU. The frame math is shared with the per-frame kernel
(test_train_frame_kernel), so these tests target what the sequence kernel
ADDS: the in-kernel time-GRU, the teacher/predicted token select, the
(d_h, d_token) scratch carries across the reversed grid, and the gi_z /
x_sum cotangent plumbing."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pctd_tpu.models import pianotree_decoder as ptd
from pctd_tpu.ops.pallas import train_seq as ts

from tests.test_models_parity import random_batch
from tests.test_training import SMALL

SEQ = dataclasses.replace(SMALL, train_seq_kernel=True)


def setup(B=4, seed=0, tfr=0.5):
    spec = SMALL.pianotree
    p = ptd.init(jax.random.PRNGKey(seed), SMALL)
    x, _, _ = random_batch(B, seed=seed + 1)
    x = jnp.asarray(x)
    c1, c2 = ptd.draw_coins(jax.random.PRNGKey(seed + 2), SMALL, tfr, tfr)
    z = jax.random.normal(jax.random.PRNGKey(seed + 3), (B, SMALL.z_dim))
    return spec, p, x, c1, c2, z


def run_decode(p, cfg, z, x, c1, c2, spec):
    x_emb, lengths = ptd.emb_x(p, x, spec)
    return ptd.decode(p, cfg, z, x_emb, lengths, c1, c2)


def test_fwd_parity():
    spec, p, x, c1, c2, z = setup()
    out_x = run_decode(p, SMALL, z, x, c1, c2, spec)
    out_k = run_decode(p, SEQ, z, x, c1, c2, spec)
    np.testing.assert_allclose(np.asarray(out_k.pitch_logits),
                               np.asarray(out_x.pitch_logits), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_k.dur_logits),
                               np.asarray(out_x.dur_logits), atol=2e-5)


@pytest.mark.slow  # interpret-mode VJP over all 32 frames, ~2 min
def test_grad_parity():
    """recon-loss gradients wrt ALL decoder params and z must match the XLA
    path (covers every weight-grad accumulator incl. the time GRU, the
    d_x_emb/d_x_sum routing and the d_h0/d_token0/d_gi_z heads)."""
    spec, p, x, c1, c2, z = setup(seed=7)

    def loss(p_, cfg, z_):
        out = run_decode(p_, cfg, z_, x, c1, c2, spec)
        return ptd.recon_loss(x, out, spec)[0]

    lx, gx = jax.value_and_grad(
        lambda pp, zz: loss(pp, SMALL, zz), argnums=(0, 1))(p, z)
    lk, gk = jax.value_and_grad(
        lambda pp, zz: loss(pp, SEQ, zz), argnums=(0, 1))(p, z)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(gx),
                                   jax.tree_util.tree_leaves(gk))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4,
                                   err_msg=f"grad leaf {i} mismatch")


@pytest.mark.slow
def test_grad_parity_multiblock_padded():
    """Several batch blocks + padded rows: weight grads accumulate across
    the full (blocks x T) grid, the scratch carries reset per block, and the
    zero-padded rows contribute nothing (B=6, block 4 -> Bp=8, 2 blocks)."""
    spec, p, x, c1, c2, z = setup(B=6, seed=3)

    def loss(p_, z_):
        out = run_decode(p_, SEQ, z_, x, c1, c2, spec)
        return ptd.recon_loss(x, out, spec)[0]

    l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(p, z)
    ts._BLOCK_OVERRIDE = 4
    try:
        l2, g2 = jax.value_and_grad(loss, argnums=(0, 1))(p, z)
    finally:
        ts._BLOCK_OVERRIDE = None
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-6)
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(g1),
                                   jax.tree_util.tree_leaves(g2))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   err_msg=f"multiblock grad leaf {i}")


def test_coin_extremes_fwd():
    """tfr=0 (pure argmax feedback against gt logits) and tfr=1 (pure
    teacher) exercise both sides of every token select."""
    for tfr in (0.0, 1.0):
        spec, p, x, c1, c2, z = setup(seed=11, tfr=tfr)
        out_x = run_decode(p, SMALL, z, x, c1, c2, spec)
        out_k = run_decode(p, SEQ, z, x, c1, c2, spec)
        np.testing.assert_allclose(np.asarray(out_k.pitch_logits),
                                   np.asarray(out_x.pitch_logits), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_k.dur_logits),
                                   np.asarray(out_x.dur_logits), atol=2e-5)


def test_fwd_parity_stretch_T():
    """A non-default sequence length (the 32-bar stretch uses num_step=128)
    must flow through the (blocks, T) grid, the SMEM coin tables and every
    t-indexed window — catches hardcoded-T assumptions (T=8 keeps interpret
    mode fast; the kernel is generic in T)."""
    spec8 = dataclasses.replace(SMALL.pianotree, num_step=8)
    base = dataclasses.replace(SMALL, pianotree=spec8)
    seq = dataclasses.replace(base, train_seq_kernel=True)
    B, T, K = 3, 8, spec8.max_simu_note
    p = ptd.init(jax.random.PRNGKey(2), base)
    ks = jax.random.split(jax.random.PRNGKey(21), 3)
    x_emb = jax.random.normal(ks[0], (B, T, K, SMALL.note_emb_size))
    lengths = jax.random.randint(ks[1], (B, T), 1, K)
    z = jax.random.normal(ks[2], (B, base.z_dim))
    c1, c2 = ptd.draw_coins(jax.random.PRNGKey(6), base, 0.5, 0.5)
    out_x = ptd.decode(p, base, z, x_emb, lengths, c1, c2)
    out_k = ptd.decode(p, seq, z, x_emb, lengths, c1, c2)
    np.testing.assert_allclose(np.asarray(out_k.pitch_logits),
                               np.asarray(out_x.pitch_logits), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_k.dur_logits),
                               np.asarray(out_x.dur_logits), atol=2e-5)


def _vae_loss_args(B=3, seed=11):
    import jax.numpy as jnp

    x, c, pr = random_batch(B, seed=seed)
    return (jnp.asarray(x), jnp.asarray(c), jnp.asarray(pr), None)


def test_fused_loss_metrics_parity():
    """train_seq_kernel + fused_loss: the whole-VAE loss and ALL 11 metrics
    must match the XLA path (the kernel emits CE numerators; denominators
    and weighting stay in XLA)."""
    from pctd_tpu.models import disentangle_vae as dv

    fused = dataclasses.replace(SMALL, train_seq_kernel=True)
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    args = _vae_loss_args()
    key = jax.random.PRNGKey(5)
    _, mx = dv.loss(params, SMALL, key, *args, tfr1=0.5, tfr2=0.5, tfr3=0.5)
    _, mk = dv.loss(params, fused, key, *args, tfr1=0.5, tfr2=0.5, tfr3=0.5)
    for k in mx:
        np.testing.assert_allclose(float(mk[k]), float(mx[k]), rtol=2e-5,
                                   err_msg=k)


@pytest.mark.slow
def test_fused_loss_weighted_dur_parity():
    from pctd_tpu.models import disentangle_vae as dv

    fused = dataclasses.replace(SMALL, train_seq_kernel=True)
    params = dv.init_params(jax.random.PRNGKey(1), SMALL)
    args = _vae_loss_args(seed=13)
    key = jax.random.PRNGKey(7)
    lx, _ = dv.loss(params, SMALL, key, *args, tfr1=0.3, tfr2=0.7, tfr3=0.5,
                    weighted_dur=True)
    lk, _ = dv.loss(params, fused, key, *args, tfr1=0.3, tfr2=0.7, tfr3=0.5,
                    weighted_dur=True)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)


@pytest.mark.slow  # whole-VAE interpret-mode grads, ~5 min
def test_fused_loss_grad_parity():
    """Gradients through the fused decode+CE kernel (in-kernel logit
    cotangents from targets) must match the XLA decode + recon_loss path for
    every parameter leaf."""
    from pctd_tpu.models import disentangle_vae as dv

    fused = dataclasses.replace(SMALL, train_seq_kernel=True)
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    args = _vae_loss_args()
    key = jax.random.PRNGKey(5)

    def tot(cfg, p):
        t, _ = dv.loss(p, cfg, key, *args, tfr1=0.5, tfr2=0.5, tfr3=0.5)
        return t

    lx, gx = jax.value_and_grad(lambda p: tot(SMALL, p))(params)
    lk, gk = jax.value_and_grad(lambda p: tot(fused, p))(params)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(gx),
                                   jax.tree_util.tree_leaves(gk))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4,
                                   err_msg=f"fused-loss grad leaf {i}")


def test_block_pickers():
    assert ts._pick_block_fwd(2048) == 512
    assert ts._pick_block_fwd(256) == 256
    # sub-cap batches round up to a 64-multiple block so Bp stays divisible
    # by the backward's 64/32-row fallbacks
    assert ts._pick_block_fwd(300) == 320
    assert ts._pick_block_fwd(2048, stash=True) == 256
    assert ts._pick_block_fwd(2048, loss_mode=True) == 256
    assert ts._pick_block_bwd(2048) == 128
    assert ts._pick_block_bwd(64) == 64
    assert ts._pick_block_bwd(320) == 64
    assert ts._pick_block_bwd(2048, loss_mode=True) == 64
