"""Training-path fused frame kernel (ops/pallas/train_frame): forward AND
hand-written-VJP gradient parity vs the XLA nested-scan path, in interpret
mode on the CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pctd_tpu.models import pianotree_decoder as ptd
from pctd_tpu.ops import GRUParams
from pctd_tpu.ops.pallas.train_frame import core_weights, frame_core

from tests.test_training import SMALL


def rebuild_params(weights, cfg):
    """Inverse of core_weights: kernel weight tuple -> decoder params subset
    (so one function of the tuple can run either path)."""
    (w_t2n, b_t2n, w_ihf, w_iht, b_ih, w_hh, b_hh, w_p, b_p,
     w_dhid, b_dhid, w_dih, b_dih, w_dhh, b_dhh, w_dout, b_dout,
     w_emb, b_e, dur_sos, we_ih, we_hh, be_ih, be_hh) = weights
    return {
        "emb_fwd": GRUParams(w_ih=we_ih[0], w_hh=we_hh[0], b_ih=be_ih[0],
                             b_hh=be_hh[0]),
        "emb_bwd": GRUParams(w_ih=we_ih[1], w_hh=we_hh[1], b_ih=be_ih[1],
                             b_hh=be_hh[1]),
        "time2notes": {"w": w_t2n, "b": b_t2n[0]},
        "notes_gru": GRUParams(w_ih=jnp.concatenate([w_ihf, w_iht]),
                               w_hh=w_hh, b_ih=b_ih[0], b_hh=b_hh[0]),
        "pitch_out": {"w": w_p, "b": b_p[0]},
        "dur_hid": {"w": w_dhid, "b": b_dhid[0]},
        "dur_gru": GRUParams(w_ih=w_dih, w_hh=w_dhh, b_ih=b_dih[0],
                             b_hh=b_dhh[0]),
        "dur_out": {"w": w_dout, "b": b_dout[0]},
        "note_emb": {"w": w_emb, "b": b_e[0]},
        "dur_sos": dur_sos[0],
    }


def setup(B=4, seed=0):
    cfg = SMALL
    spec = cfg.pianotree
    p = ptd.init(jax.random.PRNGKey(seed), cfg)
    weights = core_weights(p, cfg)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
    frame_h = jax.random.normal(ks[0], (B, cfg.dec_time_hidden))
    x_emb = jax.random.normal(ks[1], (B, spec.max_simu_note,
                                      cfg.note_emb_size))
    coins_b = jax.random.uniform(ks[2], (spec.max_simu_note,)) < 0.5
    sos_emb = jax.random.normal(ks[3], (B, cfg.note_emb_size))
    return cfg, spec, weights, frame_h, x_emb, coins_b, sos_emb


def xla_frame(weights, frame_h, x_emb, coins_b, sos_emb, cfg, spec):
    """XLA path incl. the predicted-frame summary (matching the kernel's
    fused outputs)."""
    from pctd_tpu.ops import bigru_last_masked

    p = rebuild_params(weights, cfg)
    pitch, dur, pred_notes, lens = ptd._decode_notes(
        p, spec, frame_h, x_emb, coins_b, sos_emb)
    summ = bigru_last_masked(p["emb_fwd"], p["emb_bwd"], pred_notes, lens)
    return pitch, dur, summ, lens


def kernel_frame(weights, frame_h, x_emb, coins_b, cfg):
    coins = coins_b[1:].astype(jnp.int32)[:, None]
    return frame_core(cfg, True, weights, frame_h, x_emb, coins)


def test_fwd_parity():
    cfg, spec, weights, frame_h, x_emb, coins_b, sos_emb = setup()
    pitch_x, dur_x, summ_x, len_x = xla_frame(weights, frame_h, x_emb,
                                              coins_b, sos_emb, cfg, spec)
    pitch_k, dur_k, summ_k, len_k = kernel_frame(weights, frame_h, x_emb,
                                                 coins_b, cfg)
    np.testing.assert_allclose(np.asarray(pitch_k), np.asarray(pitch_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dur_k), np.asarray(dur_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(summ_k), np.asarray(summ_x),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(len_k), np.asarray(len_x))


@pytest.mark.slow  # interpret-mode VJP, ~90s
def test_grad_parity():
    cfg, spec, weights, frame_h, x_emb, coins_b, sos_emb = setup(seed=7)
    K, W, P = spec.max_simu_note, spec.dur_width, spec.pitch_range
    B = frame_h.shape[0]
    ks = jax.random.split(jax.random.PRNGKey(99), 3)
    # random cotangent projections so every output position matters
    gp = jax.random.normal(ks[0], (B, K - 1, P))
    gd = jax.random.normal(ks[1], (B, K - 1, W, 2))
    ge = jax.random.normal(ks[2], (B, 2 * cfg.dec_emb_hidden))

    def loss_xla(weights, frame_h, x_emb):
        pitch, dur, summ, _ = xla_frame(weights, frame_h, x_emb, coins_b,
                                        sos_emb, cfg, spec)
        return (pitch * gp).sum() + (dur * gd).sum() + (summ * ge).sum()

    def loss_ker(weights, frame_h, x_emb):
        pitch, dur, summ, _ = kernel_frame(weights, frame_h, x_emb,
                                           coins_b, cfg)
        return (pitch * gp).sum() + (dur * gd).sum() + (summ * ge).sum()

    lx = loss_xla(weights, frame_h, x_emb)
    lk = loss_ker(weights, frame_h, x_emb)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)

    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(weights, frame_h, x_emb)
    gk = jax.grad(loss_ker, argnums=(0, 1, 2))(weights, frame_h, x_emb)
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(gx),
                                   jax.tree_util.tree_leaves(gk))):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"grad leaf {i} mismatch")


@pytest.mark.slow  # whole-VAE interpret-mode grads, ~2min
def test_full_decode_loss_and_grad_parity():
    """decode() with train_frame_kernel=True must match the XLA path at the
    whole-VAE loss level, gradients included (interpret mode on CPU)."""
    import dataclasses

    from pctd_tpu.models import disentangle_vae as dv
    from tests.test_models_parity import random_batch
    from pctd_tpu.train.trainer import batch_features

    base = SMALL
    fused = dataclasses.replace(SMALL, train_frame_kernel=True)
    params = dv.init_params(jax.random.PRNGKey(0), base)
    x, c, pr_mat = random_batch(4, seed=11)
    key = jax.random.PRNGKey(5)

    def loss(cfg, p):
        total, _ = dv.loss(p, cfg, key, jnp.asarray(x), jnp.asarray(c),
                           jnp.asarray(pr_mat), None,
                           tfr1=0.5, tfr2=0.5, tfr3=0.5)
        return total

    lx, gx = jax.value_and_grad(lambda p: loss(base, p))(params)
    lk, gk = jax.value_and_grad(lambda p: loss(fused, p))(params)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gk)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_fused_loss_metrics_parity_frame():
    """train_frame_kernel + fused_loss (the default): the whole-VAE loss
    and ALL 11 metrics must match the XLA path — the per-frame kernel emits
    CE numerator partials summed in the scan carry; denominators and
    weighting stay in XLA."""
    import dataclasses

    from pctd_tpu.models import disentangle_vae as dv
    from tests.test_models_parity import random_batch

    fused = dataclasses.replace(SMALL, train_frame_kernel=True)
    assert fused.fused_loss
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    x, c, pr_mat = random_batch(3, seed=23)
    key = jax.random.PRNGKey(5)
    _, mx = dv.loss(params, SMALL, key, jnp.asarray(x), jnp.asarray(c),
                    jnp.asarray(pr_mat), None, tfr1=0.5, tfr2=0.5, tfr3=0.5)
    _, mk = dv.loss(params, fused, key, jnp.asarray(x), jnp.asarray(c),
                    jnp.asarray(pr_mat), None, tfr1=0.5, tfr2=0.5, tfr3=0.5)
    for k in mx:
        np.testing.assert_allclose(float(mk[k]), float(mx[k]), rtol=2e-5,
                                   err_msg=k)


@pytest.mark.slow  # interpret-mode VJP over several grid blocks, ~2min
def test_fused_loss_grad_parity_multiblock_frame():
    """frame_recon_partials: the CE-numerator grid accumulation and the
    in-kernel logit cotangents must agree with the XLA decode+recon_loss
    across MULTIPLE batch blocks (catches a broken nums accumulator init or
    a padded row leaking into the masked CE)."""
    import dataclasses

    from pctd_tpu.models import disentangle_vae as dv
    from pctd_tpu.ops.pallas import train_frame as tf
    from tests.test_models_parity import random_batch

    fused = dataclasses.replace(SMALL, train_frame_kernel=True)
    params = dv.init_params(jax.random.PRNGKey(2), SMALL)
    x, c, pr_mat = random_batch(6, seed=29)     # forced block 4 -> Bp=8
    key = jax.random.PRNGKey(9)

    def loss(cfg, p):
        total, _ = dv.loss(p, cfg, key, jnp.asarray(x), jnp.asarray(c),
                           jnp.asarray(pr_mat), None,
                           tfr1=0.5, tfr2=0.5, tfr3=0.5)
        return total

    lx, gx = jax.value_and_grad(lambda p: loss(SMALL, p))(params)
    tf._BLOCK_OVERRIDE = 4
    try:
        lk, gk = jax.value_and_grad(lambda p: loss(fused, p))(params)
    finally:
        tf._BLOCK_OVERRIDE = None
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(gx),
                                   jax.tree_util.tree_leaves(gk))):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"fused-frame multiblock grad leaf {i}")


@pytest.mark.slow
def test_grad_parity_multiblock():
    """Grid accumulation: weight grads must sum correctly across several
    batch blocks (the single-block case can't catch a broken accumulator
    init or index map)."""
    from pctd_tpu.ops.pallas import train_frame as tf

    cfg, spec, weights, frame_h, x_emb, coins_b, sos_emb = setup(B=8, seed=3)
    K, W, P = spec.max_simu_note, spec.dur_width, spec.pitch_range
    ks = jax.random.split(jax.random.PRNGKey(42), 3)
    gp = jax.random.normal(ks[0], (8, K - 1, P))
    gd = jax.random.normal(ks[1], (8, K - 1, W, 2))
    ge = jax.random.normal(ks[2], (8, 2 * cfg.dec_emb_hidden))

    def loss_ker(weights, frame_h, x_emb):
        pitch, dur, summ, _ = kernel_frame(weights, frame_h, x_emb,
                                           coins_b, cfg)
        return (pitch * gp).sum() + (dur * gd).sum() + (summ * ge).sum()

    g1 = jax.grad(loss_ker, argnums=(0, 1, 2))(weights, frame_h, x_emb)
    tf._BLOCK_OVERRIDE = 4        # -> 2 grid blocks
    try:
        g2 = jax.grad(loss_ker, argnums=(0, 1, 2))(weights, frame_h, x_emb)
    finally:
        tf._BLOCK_OVERRIDE = None
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(g1),
                                   jax.tree_util.tree_leaves(g2))):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4,
            err_msg=f"multiblock grad leaf {i} mismatch")


@pytest.mark.slow
def test_fwd_and_grad_parity_padded_batch():
    """A batch NOT divisible by the block is zero-padded to the next block
    multiple: outputs and grads must still match the XLA path exactly
    (B=6 with a forced block of 4 -> Bp=8, 2 blocks, 2 padded rows)."""
    from pctd_tpu.ops.pallas import train_frame as tf

    cfg, spec, weights, frame_h, x_emb, coins_b, sos_emb = setup(B=6, seed=5)
    K, W, P = spec.max_simu_note, spec.dur_width, spec.pitch_range
    ks = jax.random.split(jax.random.PRNGKey(17), 3)
    gp = jax.random.normal(ks[0], (6, K - 1, P))
    gd = jax.random.normal(ks[1], (6, K - 1, W, 2))
    ge = jax.random.normal(ks[2], (6, 2 * cfg.dec_emb_hidden))

    def proj(outs):
        pitch, dur, summ, _ = outs
        return (pitch * gp).sum() + (dur * gd).sum() + (summ * ge).sum()

    def loss_xla(weights, frame_h, x_emb):
        return proj(xla_frame(weights, frame_h, x_emb, coins_b, sos_emb,
                              cfg, spec))

    def loss_ker(weights, frame_h, x_emb):
        return proj(kernel_frame(weights, frame_h, x_emb, coins_b, cfg))

    tf._BLOCK_OVERRIDE = 4
    try:
        fx = xla_frame(weights, frame_h, x_emb, coins_b, sos_emb, cfg, spec)
        fk = kernel_frame(weights, frame_h, x_emb, coins_b, cfg)
        for a, b in zip(fx[:3], fk[:3]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5)
        np.testing.assert_array_equal(np.asarray(fk[3]), np.asarray(fx[3]))
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(weights, frame_h, x_emb)
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(weights, frame_h, x_emb)
    finally:
        tf._BLOCK_OVERRIDE = None
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(gx),
                                   jax.tree_util.tree_leaves(gk))):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4,
            err_msg=f"padded-batch grad leaf {i} mismatch")


def test_block_pickers():
    """Block-size selection: the primal forward affords 1024-row blocks,
    the STASH forward (VJP path, streams the chain states out) caps at 512
    (1024 measured 166M > 128M VMEM on v5e), the backward stays at 256
    (VMEM-bound); non-divisible batches fall back to 128 with zero-padding."""
    from pctd_tpu.ops.pallas import train_frame as tf

    assert tf._pick_block_fwd(2048) == 1024
    assert tf._pick_block_fwd(2048, stash=True) == 512
    assert tf._pick_block_fwd(2048, loss_mode=True) == 512
    assert tf._pick_block_fwd(2048, stash=True, loss_mode=True) == 256
    assert tf._pick_block_fwd(1536) == 512
    assert tf._pick_block_fwd(1536, stash=True) == 512
    assert tf._pick_block_fwd(256) == 256
    assert tf._pick_block_fwd(100) == 100      # single block, padded rows
    assert tf._pick_block_fwd(300) == 128
    assert tf._pick_block_fwd(1280, stash=True) == 256
    assert tf._pick_block_bwd(2048) == 128
    assert tf._pick_block_bwd(300) == 128   # zero-padded to 384
    assert tf._pick_block_bwd(64) == 64
