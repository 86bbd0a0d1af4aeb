"""Checkpoint/resume: full train-state round trip continues training
deterministically (SURVEY.md §5 — the reference saves weights only and can
never actually resume)."""

import pytest

pytestmark = pytest.mark.slow  # torch-oracle / mesh / compile-heavy

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pctd_tpu.config import DataConfig, TrainConfig
from pctd_tpu.data.synthetic import synthetic_corpora
from pctd_tpu.data.loaders import make_loaders
from pctd_tpu.train.checkpoint import save_state, restore_state
from pctd_tpu.train.trainer import init_state, make_train_step

from tests.test_training import SMALL


def test_resume_reproduces_uninterrupted_run(tmp_path):
    tcfg = dataclasses.replace(TrainConfig(), batch_size=8)
    train_c, val_c = synthetic_corpora(
        n_songs=4, seed=7, n_bars=8,
        cfg=dataclasses.replace(DataConfig(), portion=3))
    tl, _ = make_loaders(train_c, val_c, batch_size=8, seed=0)
    batches = [next(tl.epoch()) for _ in range(4)]

    def run(state, step_fn, batches):
        for b in batches:
            state, metrics = step_fn(state, jnp.asarray(b["pr"]),
                                     jnp.asarray(b["chord"]),
                                     jnp.asarray(b["shift"]))
        return state, metrics

    # uninterrupted: 4 steps
    state_a, tx = init_state(jax.random.PRNGKey(0), SMALL, tcfg)
    step = make_train_step(SMALL, tcfg, tx)
    state_a, metrics_a = run(state_a, step, batches)

    # interrupted: 2 steps -> checkpoint -> restore -> 2 steps
    state_b, tx2 = init_state(jax.random.PRNGKey(0), SMALL, tcfg)
    step2 = make_train_step(SMALL, tcfg, tx2)
    state_b, _ = run(state_b, step2, batches[:2])
    path = str(tmp_path / "ckpt")
    save_state(path, state_b)
    restored = restore_state(path, state_b)
    assert int(restored.step) == 2
    state_c, metrics_c = run(restored, step2, batches[2:])

    assert int(state_c.step) == int(state_a.step) == 4
    np.testing.assert_allclose(float(metrics_c["loss"]),
                               float(metrics_a["loss"]), rtol=1e-5)
    for x, y in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_c.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
