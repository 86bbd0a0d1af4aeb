"""Data-parallel mesh tests on the virtual 8-device CPU mesh."""
import dataclasses

import pytest

pytestmark = pytest.mark.slow  # 8-device mesh, compile-heavy

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from pctd_tpu.config import TrainConfig
from pctd_tpu.data.synthetic import synthetic_corpora
from pctd_tpu.data.loaders import make_loaders
from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.parallel import (make_mesh, shard_batch, replicate,
                               make_parallel_train_step)
from pctd_tpu.parallel.mesh import _shard_map
from pctd_tpu.train.trainer import init_state, batch_features

from tests.test_training import SMALL

TCFG = dataclasses.replace(TrainConfig(), batch_size=16)


def get_batch(bs=16):
    cfg_data = dataclasses.replace(
        __import__("pctd_tpu.config", fromlist=["DataConfig"]).DataConfig(),
        portion=4)
    train, val = synthetic_corpora(n_songs=4, seed=2, n_bars=8, cfg=cfg_data)
    tl, _ = make_loaders(train, val, batch_size=bs, seed=0)
    return next(tl.epoch())


def test_parallel_train_step_runs_and_replicates():
    assert jax.device_count() == 8
    mesh = make_mesh(8)
    state, tx = init_state(jax.random.PRNGKey(0), SMALL, TCFG)
    state = replicate(mesh, state)
    step = make_parallel_train_step(SMALL, TCFG, tx, mesh)
    batch = get_batch(16)
    pr, chord, shift = shard_batch(mesh, batch["pr"], batch["chord"],
                                   batch["shift"])
    state, metrics = step(state, pr, chord, shift)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    # params identical on all devices after the update
    p = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in p.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_mesh_loss_matches_single_device():
    """Deterministic loss (posterior means, full teacher forcing): the
    pmean over an 8-way sharded batch equals the single-program loss."""
    mesh = make_mesh(8)
    params = dv.init_params(jax.random.PRNGKey(1), SMALL)
    batch = get_batch(16)
    feats = batch_features(jnp.asarray(batch["pr"]),
                           jnp.asarray(batch["chord"]),
                           jnp.asarray(batch["shift"]), SMALL)
    x, c, pr_mat, _ = feats
    key = jax.random.PRNGKey(2)

    def det_loss(params, x, c, pr_mat):
        total, _ = dv.loss(params, SMALL, key, x, c, pr_mat,
                           tfr1=1.0, tfr2=1.0, tfr3=1.0, sample=False)
        return total

    single = float(det_loss(params, x, c, pr_mat))

    def shard_fn(params, x, c, pr_mat):
        return jax.lax.pmean(det_loss(params, x, c, pr_mat), "data")

    mapped = jax.jit(_shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False))
    xs, cs, ps = shard_batch(mesh, np.asarray(x), np.asarray(c),
                             np.asarray(pr_mat))
    sharded = float(mapped(replicate(mesh, params), xs, cs, ps))

    # CE means are per-shard means of equal-sized shards -> pmean == global
    # for every term except the masked CEs, whose denominators vary slightly
    # per shard; tolerance covers that.
    np.testing.assert_allclose(sharded, single, rtol=2e-2)


def test_parallel_multi_step_training_progresses():
    mesh = make_mesh(8)
    tcfg = dataclasses.replace(TrainConfig(), batch_size=16, lr=2e-3)
    state, tx = init_state(jax.random.PRNGKey(3), SMALL, tcfg)
    state = replicate(mesh, state)
    step = make_parallel_train_step(SMALL, tcfg, tx, mesh)
    batch = get_batch(16)
    pr, chord, shift = shard_batch(mesh, batch["pr"], batch["chord"],
                                   batch["shift"])
    losses = []
    for _ in range(8):
        state, metrics = step(state, pr, chord, shift)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_parallel_eval_step():
    from pctd_tpu.parallel import make_parallel_eval_step
    mesh = make_mesh(8)
    state, _ = init_state(jax.random.PRNGKey(5), SMALL, TCFG)
    eval_step = make_parallel_eval_step(SMALL, TCFG, mesh)
    batch = get_batch(16)
    pr, chord, shift = shard_batch(mesh, batch["pr"], batch["chord"],
                                   batch["shift"])
    params = replicate(mesh, state.params)
    metrics = eval_step(params, jnp.zeros((), jnp.int32),
                        jax.random.PRNGKey(6), pr, chord, shift)
    assert np.isfinite(float(metrics["loss"]))
    assert set(metrics) == set(dv.METRIC_NAMES)
