"""End-to-end training on a synthetic corpus: corpus assembly, loaders,
jitted train step, decreasing loss, schedules, checkpoint round-trip."""
import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pctd_tpu.config import DataConfig, ModelConfig, TrainConfig
from pctd_tpu.data.synthetic import synthetic_corpora, synthetic_song
from pctd_tpu.data.loaders import make_loaders
from pctd_tpu.train import schedules
from pctd_tpu.train.trainer import (Trainer, init_state, make_train_step,
                                    make_eval_step)

SMALL = dataclasses.replace(
    ModelConfig(), chd_z_dim=16, txt_z_dim=16, chd_enc_hidden=32,
    txt_emb_size=32, txt_enc_hidden=32, chd_dec_hidden=32, chd_dec_z_in=16,
    note_emb_size=32, dec_emb_hidden=16, dec_time_hidden=48,
    dec_notes_hidden=24, dec_z_in=16, dec_dur_hidden=8)


@pytest.fixture(scope="module")
def corpora():
    cfg = dataclasses.replace(DataConfig(), portion=4)
    return synthetic_corpora(n_songs=6, seed=1, n_bars=8, cfg=cfg)


def test_synthetic_song_structure():
    rng = np.random.RandomState(0)
    music = synthetic_song(rng, n_bars=8)
    data_track, indicator, db_pos = music.prepare_data(num_bar=2)
    assert len(db_pos) == 8
    assert indicator.sum() >= 5           # most bars start a valid window
    assert indicator[-1] == 0             # last bar can't start a 2-bar window
    mel, acc, chord = data_track[0]
    assert chord.shape == (4, 14)
    assert acc is not None and acc.shape[1] == 8


def test_corpus_and_loader_shapes(corpora):
    train, val = corpora
    assert len(train) > len(val) > 0
    assert train.pr.dtype == np.uint8
    tl, vl = make_loaders(train, val, batch_size=8, seed=0)
    batch = next(tl.epoch())
    assert batch["pr"].shape == (8, 32, 128)
    assert batch["chord"].shape == (8, 8, 14)
    assert batch["shift"].min() >= -6 and batch["shift"].max() <= 5
    vbatch = next(vl.epoch())
    assert (vbatch["shift"] == 0).all()
    # index space covers all (segment, shift) pairs
    assert tl.num_index == len(train) * 12


def test_schedules_reference_shape():
    tcfg = TrainConfig()
    p0 = schedules.train_params_at(jnp.asarray(0), tcfg)
    p_late = schedules.train_params_at(jnp.asarray(50), tcfg)
    # reference quirk preserved: transition completes within ~1 step
    assert float(p0["tfr1"]) > 0.59
    assert float(p_late["tfr1"]) < 1e-3
    assert float(p0["beta"]) < 1e-3
    assert abs(float(p_late["beta"]) - 0.1) < 1e-6
    # configurable horizon stretches the transition
    tcfg2 = dataclasses.replace(tcfg, sched_horizon=100.0)
    mid = schedules.train_params_at(jnp.asarray(50), tcfg2)
    assert 0.25 < float(mid["tfr1"]) < 0.35  # half way: (0.6 - 0) * 0.5


@pytest.mark.slow
def test_train_step_decreases_loss(corpora):
    train, val = corpora
    tcfg = dataclasses.replace(TrainConfig(), batch_size=8, lr=2e-3)
    state, tx = init_state(jax.random.PRNGKey(0), SMALL, tcfg)
    step = make_train_step(SMALL, tcfg, tx)
    tl, _ = make_loaders(train, val, batch_size=8, seed=0)
    losses = []
    for epoch in range(2):
        for batch in tl.epoch():
            state, metrics = step(state, jnp.asarray(batch["pr"]),
                                  jnp.asarray(batch["chord"]),
                                  jnp.asarray(batch["shift"]))
            losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9
    assert int(state.step) == len(losses)


@pytest.mark.slow
def test_trainer_run_and_checkpoint(tmp_path, corpora):
    train, val = corpora
    tcfg = dataclasses.replace(TrainConfig(), batch_size=8, n_epoch=1)
    tl, vl = make_loaders(train, val, batch_size=8, seed=0)
    from pctd_tpu.train.logging import RunPaths, MetricWriters
    from pctd_tpu.models.disentangle_vae import METRIC_NAMES
    paths = RunPaths(base_dir=str(tmp_path), with_date=False)
    writers = MetricWriters(METRIC_NAMES, paths.writer_path,
                            use_tensorboard=False)
    tr = Trainer(SMALL, tcfg, tl, vl, run_paths=paths, writers=writers)
    out = tr.run(n_epoch=1)
    assert np.isfinite(out["train"]["loss"])
    assert np.isfinite(out["val"]["loss"])
    assert os.path.exists(os.path.join(paths.writer_path, "metrics.csv"))

    # checkpoint round-trip restores params + step exactly
    final = paths.model_path("disvae", "final")
    from pctd_tpu.train.checkpoint import restore_state
    restored = restore_state(final, tr.state)
    assert int(restored.step) == int(tr.state.step)
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(tr.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_train_epoch_averages_log_every_invariant(corpora):
    """Regression: epoch-average train metrics must not depend on log_every
    (round-1 bug: metrics were only accumulated on logged steps but divided
    by the total batch count)."""
    train, val = corpora

    def run(log_every):
        tcfg = dataclasses.replace(TrainConfig(), batch_size=8)
        tl, vl = make_loaders(train, val, batch_size=8, seed=0)
        from pctd_tpu.train.logging import MetricWriters
        from pctd_tpu.models.disentangle_vae import METRIC_NAMES

        class NullWriters(MetricWriters):
            def __init__(self):
                self.names = METRIC_NAMES

            def write_task(self, task, metrics, step):
                pass

        tr = Trainer(SMALL, tcfg, tl, vl, writers=NullWriters(),
                     log_every=log_every)
        return tr.train_epoch()

    m1 = run(log_every=1)
    m3 = run(log_every=3)
    for k in m1:
        assert abs(m1[k] - m3[k]) < 1e-5, (k, m1[k], m3[k])


@pytest.mark.slow
def test_eval_fixed_schedule(corpora):
    """eval_fixed_schedule=True evaluates at the schedules' final values
    regardless of the training step."""
    train, val = corpora
    tcfg = dataclasses.replace(TrainConfig(), batch_size=8,
                               sched_horizon=1000.0,
                               eval_fixed_schedule=True)
    state, _ = init_state(jax.random.PRNGKey(0), SMALL, tcfg)
    ev = make_eval_step(SMALL, tcfg)
    _, vl = make_loaders(train, val, batch_size=8, seed=0)
    batch = next(vl.epoch())
    args = (jnp.asarray(batch["pr"]), jnp.asarray(batch["chord"]),
            jnp.asarray(batch["shift"]))
    key = jax.random.PRNGKey(7)
    m_early = ev(state.params, jnp.asarray(0), key, *args)
    m_late = ev(state.params, jnp.asarray(10_000), key, *args)
    # identical despite a schedule position that differs hugely
    assert float(m_early["loss"]) == float(m_late["loss"])
    # final_params matches the config's asymptotes
    fp = schedules.final_params(tcfg)
    assert fp["beta"] == tcfg.beta and fp["tfr1"] == tcfg.tf_rates[0][1]


@pytest.mark.slow
def test_remat_frames_grad_parity(corpora):
    """remat_frames=True (the large-batch memory config) must give the same
    loss and gradients as the default (it only changes what the backward
    saves vs recomputes)."""
    from pctd_tpu.models import disentangle_vae as dv
    from pctd_tpu.train.trainer import batch_features

    train, val = corpora
    tl, _ = make_loaders(train, val, batch_size=8, seed=0)
    batch = next(tl.epoch())
    x, c, pr_mat, _ = batch_features(
        jnp.asarray(batch["pr"]), jnp.asarray(batch["chord"]),
        jnp.asarray(batch["shift"]), SMALL)
    key = jax.random.PRNGKey(3)

    def loss_and_grad(cfg):
        params = dv.init_params(jax.random.PRNGKey(0), cfg)

        def f(p):
            total, _ = dv.loss(p, cfg, key, x, c, pr_mat, None,
                               tfr1=0.5, tfr2=0.5, tfr3=0.5)
            return total

        return jax.value_and_grad(f)(params)

    l0, g0 = loss_and_grad(SMALL)
    l1, g1 = loss_and_grad(dataclasses.replace(SMALL, remat_frames=True))
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_grad_accumulation_close_to_full_batch(corpora):
    """accum_steps=4 must produce a step close to the single-batch step (not
    identical: per-microbatch RNG coins and CE-mask denominators differ)."""
    train, val = corpora
    tl, _ = make_loaders(train, val, batch_size=8, seed=0)
    batch = next(tl.epoch())
    args = (jnp.asarray(batch["pr"]), jnp.asarray(batch["chord"]),
            jnp.asarray(batch["shift"]))

    def run(accum):
        tcfg = dataclasses.replace(TrainConfig(), batch_size=8,
                                   accum_steps=accum)
        state, tx = init_state(jax.random.PRNGKey(0), SMALL, tcfg)
        step = make_train_step(SMALL, tcfg, tx)
        state, metrics = step(state, *args)
        return float(metrics["loss"]), state

    l1, s1 = run(1)
    l4, s4 = run(4)
    assert np.isfinite(l1) and np.isfinite(l4)
    assert abs(l1 - l4) / abs(l1) < 0.05
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


@pytest.mark.slow
def test_pianotree_variant_train_step(corpora):
    train, val = corpora
    cfg = dataclasses.replace(SMALL, txt_encoder="pianotree",
                              ptenc_note_emb=16, ptenc_notes_hidden=12,
                              ptenc_time_hidden=16)
    tcfg = dataclasses.replace(TrainConfig(), batch_size=8)
    state, tx = init_state(jax.random.PRNGKey(0), cfg, tcfg)
    step = make_train_step(cfg, tcfg, tx)
    tl, _ = make_loaders(train, val, batch_size=8, seed=0)
    batch = next(tl.epoch())
    state, metrics = step(state, jnp.asarray(batch["pr"]),
                          jnp.asarray(batch["chord"]),
                          jnp.asarray(batch["shift"]))
    assert np.isfinite(float(metrics["loss"]))


def test_auto_accum_steps():
    """accum_steps=0 (auto) engages just enough microbatches to keep each
    under the HBM envelope, picking a divisor of the batch."""
    import dataclasses as dc
    from pctd_tpu.train.trainer import auto_accum_steps

    remat = dc.replace(SMALL, remat_frames=True)
    kern = dc.replace(SMALL, train_frame_kernel=True)
    plain = SMALL

    def t(bs, accum=0):
        return dc.replace(TrainConfig(), batch_size=bs, accum_steps=accum)

    assert auto_accum_steps(remat, t(2048)) == 1        # envelope
    assert auto_accum_steps(kern, t(4096)) == 2         # B=4096 trains
    assert auto_accum_steps(remat, t(128)) == 1
    assert auto_accum_steps(plain, t(1024)) == 2        # no remat: 512 env
    assert auto_accum_steps(remat, t(3072)) == 2        # smallest divisor
    assert auto_accum_steps(remat, t(4096, accum=8)) == 8  # explicit wins
    # a batch with no small divisor (prime > envelope) must raise with
    # guidance instead of silently scanning 1-segment microbatches
    with pytest.raises(ValueError, match="divisible"):
        auto_accum_steps(remat, t(2053))


def test_kernel_compile_failure_degrades_to_xla(corpora):
    """A device where the fused train kernel's VMEM blocks do not compile
    must degrade to the XLA scan path with a warning at the first step, not
    kill the run (the kernels are tuned per chip generation)."""
    train, val = corpora
    tcfg = dataclasses.replace(TrainConfig(), batch_size=8, n_epoch=1)
    tl, vl = make_loaders(train, val, batch_size=8, seed=0)
    mcfg = dataclasses.replace(SMALL, train_frame_kernel=True)
    tr = Trainer(mcfg, tcfg, tl, vl)
    real_step = tr.train_step

    calls = {"n": 0}

    def exploding_step(state, pr, chord, shift):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: XLA:TPU compile permanent error. Ran out of memory "
            "in memory space vmem (simulated).")

    tr.train_step = exploding_step
    with pytest.warns(UserWarning, match="falling back to the XLA"):
        out = tr.train_epoch()
    assert calls["n"] == 1                      # tried once, then rebuilt
    assert np.isfinite(out["loss"])
    assert not tr.mcfg.train_frame_kernel
    assert not tr._kernel_fallback_armed

    # a second failure (fallback disarmed) propagates
    tr.train_step = exploding_step
    with pytest.raises(jax.errors.JaxRuntimeError):
        tr.train_epoch()
    del real_step


def test_mosaic_lowering_failure_degrades_to_xla(corpora):
    """Mosaic LOWERING failures raise MosaicError (a plain Exception, not a
    JaxRuntimeError) — the degrade must catch those too; any other exception
    type must still propagate untouched."""
    from jax._src.pallas.mosaic.error_handling import MosaicError

    train, val = corpora
    tcfg = dataclasses.replace(TrainConfig(), batch_size=8, n_epoch=1)
    tl, vl = make_loaders(train, val, batch_size=8, seed=0)
    mcfg = dataclasses.replace(SMALL, train_frame_kernel=True)
    tr = Trainer(mcfg, tcfg, tl, vl)

    def mosaic_exploding_step(state, pr, chord, shift):
        raise MosaicError(
            "INTERNAL: Mosaic failed to compile TPU kernel: Not "
            "implemented: result/input offset mismatch (simulated).")

    tr.train_step = mosaic_exploding_step
    with pytest.warns(UserWarning, match="falling back to the XLA"):
        out = tr.train_epoch()
    assert np.isfinite(out["loss"])
    assert not tr.mcfg.train_frame_kernel

    # non-compile exception types propagate even while armed
    tr2 = Trainer(dataclasses.replace(SMALL, train_frame_kernel=True),
                  tcfg, tl, vl)

    def value_error_step(state, pr, chord, shift):
        raise ValueError("not a kernel-compile failure")

    tr2.train_step = value_error_step
    assert tr2._kernel_fallback_armed
    with pytest.raises(ValueError, match="not a kernel-compile"):
        tr2.train_epoch()
