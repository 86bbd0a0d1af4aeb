"""Train-step AOT bundles (train.aot_steps): program-identity keys, the
export -> preload -> run roundtrip, and staleness gates.

Round-4's driver bench lost 15/16 sections to cold compiles (VERDICT r4
item 1); committed AOT bundles are the fix, so the machinery that decides
"this bundle IS this program" is test surface: a wrong match would silently
run a stale/mismatched executable, a missed match only costs a recompile.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pctd_tpu.config import ModelConfig, TrainConfig
from pctd_tpu.data.synthetic import example_batch
from pctd_tpu.train import aot_steps, schedules, trainer
from pctd_tpu.utils import aot

SMALL = dataclasses.replace(
    ModelConfig(), chd_z_dim=16, txt_z_dim=16, chd_enc_hidden=32,
    txt_emb_size=32, txt_enc_hidden=32, chd_dec_hidden=32, chd_dec_z_in=16,
    note_emb_size=32, dec_emb_hidden=16, dec_time_hidden=48,
    dec_notes_hidden=24, dec_z_in=16, dec_dur_hidden=8)


def test_program_keys_dedupe_and_distinguish():
    """tens keys on (data shapes, txt_encoder, batch) only; upd keys on
    (param-shaping arch, optimizer) only; grad keys on everything — so one
    upd bundle covers the whole bench matrix while any loss-path change
    gets its own grad bundle."""
    t = TrainConfig(batch_size=64)
    base = aot_steps.program_keys(SMALL, t)

    # compute-path flags: same tens + upd, different grad
    for change in (dict(compute_dtype="bfloat16"),
                   dict(train_frame_kernel=True, remat_frames=True),
                   dict(unroll_dur=5), dict(fused_loss=False)):
        k = aot_steps.program_keys(dataclasses.replace(SMALL, **change), t)
        assert k["tens"] == base["tens"], change
        assert k["upd"] == base["upd"], change
        assert k["grad"] != base["grad"], change

    # batch size: new tens + grad, same upd (params don't change shape)
    k = aot_steps.program_keys(SMALL, TrainConfig(batch_size=128))
    assert k["tens"] != base["tens"]
    assert k["grad"] != base["grad"]
    assert k["upd"] == base["upd"]

    # arch change reshapes params -> all three... tens only if data shapes
    k = aot_steps.program_keys(
        dataclasses.replace(SMALL, dec_time_hidden=64), t)
    assert k["tens"] == base["tens"]      # data shapes unchanged
    assert k["upd"] != base["upd"]
    assert k["grad"] != base["grad"]

    # optimizer change: upd + grad (the grad program embeds schedules via
    # tcfg), tens untouched
    k = aot_steps.program_keys(SMALL, dataclasses.replace(t, lr=1e-4))
    assert k["upd"] != base["upd"]
    assert k["tens"] == base["tens"]

    # fields that reach NO program leave every key alone
    k = aot_steps.program_keys(
        SMALL, dataclasses.replace(t, n_epoch=99, seed=7,
                                   save_every_epoch=False))
    assert k == base


def test_example_avals_shapes():
    t = TrainConfig(batch_size=8)
    tx = schedules.make_optimizer(t)
    av = aot_steps.example_avals(SMALL, t, tx)
    pr, chord, shift = av["tens"]
    assert pr.shape == (8, 32, 128) and pr.dtype == jnp.uint8
    assert chord.shape == (8, 8, 14)
    params_av, step_av, key_av, x, c, pr_mat, dt_x = av["grad"]
    assert x.shape[:2] == (8, 32)
    assert dt_x is None                   # conv texture encoder
    state_av, grads_av = av["upd"]
    assert jax.tree_util.tree_structure(
        grads_av) == jax.tree_util.tree_structure(params_av)


@pytest.mark.slow  # compiles the tiny train step twice (jit + fresh export)
def test_export_load_run_roundtrip(tmp_path):
    """export -> load -> run must equal the jit path exactly (same compiled
    semantics), with all three programs preloaded and the update program's
    donation surviving serialization."""
    t = TrainConfig(batch_size=8)
    state, tx = trainer.init_state(jax.random.PRNGKey(0), SMALL, t)
    report = aot_steps.export_train_step(SMALL, t, tx, str(tmp_path))
    assert {e["kind"] for e in report["exported"]} == {
        "train_tens", "train_grad", "train_upd"}
    # manifest written alongside, meta-complete
    man = aot.read_manifest(str(tmp_path))
    assert len(man) == 3
    assert all(m.get("source_fp") for m in man.values())

    exes, skipped = aot_steps.load_train_step_exes(SMALL, t, str(tmp_path))
    assert skipped == []
    assert set(exes) == {"tens", "grad", "upd"}

    pr, chord, shift = example_batch(8, seed=3)
    pr, chord, shift = jnp.asarray(pr), jnp.asarray(chord), jnp.asarray(shift)
    step_aot = trainer.make_train_step(SMALL, t, tx, aot_exes=exes)
    step_jit = trainer.make_train_step(SMALL, t, tx)
    s_a, m_a = step_aot(state, pr, chord, shift)
    state2, _ = trainer.init_state(jax.random.PRNGKey(0), SMALL, t)
    s_j, m_j = step_jit(state2, pr, chord, shift)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_j["loss"]),
                               rtol=1e-6)
    # second step: states advanced through the AOT update program
    s_a, m_a2 = step_aot(s_a, pr, chord, shift)
    s_j, m_j2 = step_jit(s_j, pr, chord, shift)
    np.testing.assert_allclose(float(m_a2["loss"]), float(m_j2["loss"]),
                               rtol=1e-5)
    assert int(s_a.step) == 2

    # a different config MISSES (no silent stale match) ...
    other = dataclasses.replace(SMALL, compute_dtype="bfloat16")
    exes2, _ = aot_steps.load_train_step_exes(other, t, str(tmp_path))
    assert "grad" not in exes2            # grad program differs
    assert set(exes2) <= {"tens", "upd"}  # shared programs still hit

    # ... and a source edit invalidates everything (stale executable)
    import pctd_tpu.utils.aot as aot_mod
    orig = aot_mod.source_fingerprint
    try:
        aot_mod.source_fingerprint = lambda: "deadbeefdeadbeef"
        exes3, skipped3 = aot_steps.load_train_step_exes(
            SMALL, t, str(tmp_path))
        assert exes3 == {}
        assert skipped3 and all("sources changed" in r for _, r in skipped3)
    finally:
        aot_mod.source_fingerprint = orig


def test_load_missing_dir_and_corrupt_bundle(tmp_path):
    t = TrainConfig(batch_size=8)
    exes, skipped = aot_steps.load_train_step_exes(
        SMALL, t, str(tmp_path / "nope"))
    assert exes == {} and skipped == []
    # corrupt file at the expected name: recorded, not fatal
    keys = aot_steps.program_keys(SMALL, t)
    bad = tmp_path / f"train_grad_{keys['grad']}.jaxexe"
    bad.write_bytes(b"not a pickle")
    exes, skipped = aot_steps.load_train_step_exes(SMALL, t, str(tmp_path))
    assert exes == {}
    assert skipped and skipped[0][0] == bad.name
