"""8-bar (128-step) corpus assembly + full stretch train step from real
(synthetic) data — the BASELINE.md stretch configuration end to end."""

import pytest

pytestmark = pytest.mark.slow  # torch-oracle / mesh / compile-heavy

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pctd_tpu.config import (ChordSpec, DataConfig, ModelConfig,
                             PianoTreeSpec, TrainConfig)
from pctd_tpu.data.synthetic import synthetic_corpora
from pctd_tpu.data.loaders import make_loaders
from pctd_tpu.train.trainer import init_state, make_train_step


def test_8bar_corpus_shapes_and_train_step():
    dcfg = dataclasses.replace(DataConfig(), num_bar=8, portion=3)
    train_c, val_c = synthetic_corpora(n_songs=6, seed=9, n_bars=16, cfg=dcfg)
    assert train_c.pr.shape[1:] == (128, 128)
    assert train_c.chord.shape[1:] == (32, 14)
    assert train_c.mel.shape[1:] == (128, 130)
    # notes exist across the whole window
    assert train_c.pr[:, 96:].any()

    mcfg = dataclasses.replace(
        ModelConfig(), pianotree=PianoTreeSpec(num_step=128),
        chord=ChordSpec(num_step=32),
        chd_z_dim=8, txt_z_dim=8, chd_enc_hidden=12, txt_emb_size=12,
        txt_enc_hidden=12, chd_dec_hidden=12, chd_dec_z_in=8,
        note_emb_size=12, dec_emb_hidden=8, dec_time_hidden=16,
        dec_notes_hidden=12, dec_z_in=8, dec_dur_hidden=8)
    tcfg = dataclasses.replace(TrainConfig(), batch_size=4)
    state, tx = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, tx)
    tl, _ = make_loaders(train_c, val_c, batch_size=4, seed=0)
    batch = next(tl.epoch())
    state, metrics = step(state, jnp.asarray(batch["pr"]),
                          jnp.asarray(batch["chord"]),
                          jnp.asarray(batch["shift"]))
    assert np.isfinite(float(metrics["loss"]))


def test_long_durations_clip_to_5_bits():
    from pctd_tpu.data import converter as cv
    pr_mat = np.zeros((1, 128, 128))
    pr_mat[0, 0, 60] = 100.0          # 100-step note
    grid = cv.batch_target_to_3dtarget(pr_mat)
    bits = grid[0, 0, 1, 1:6]
    assert (bits == 1).all()          # clipped to 31 -> dur 32
