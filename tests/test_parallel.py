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


def _det_loss_setup():
    params = dv.init_params(jax.random.PRNGKey(1), SMALL)
    batch = get_batch(16)
    x, c, pr_mat, _ = batch_features(jnp.asarray(batch["pr"]),
                                     jnp.asarray(batch["chord"]),
                                     jnp.asarray(batch["shift"]), SMALL)
    key = jax.random.PRNGKey(2)

    def det_loss(params, x, c, pr_mat, axis_name=None):
        total, _ = dv.loss(params, SMALL, key, x, c, pr_mat,
                           tfr1=1.0, tfr2=1.0, tfr3=1.0, sample=False,
                           axis_name=axis_name)
        return total

    return params, x, c, pr_mat, det_loss


def test_mesh_loss_matches_single_device():
    """Deterministic loss (posterior means, full teacher forcing): with the
    exact (global-denominator) masked-CE reduction, the sharded loss equals
    the single-program loss to float tolerance; the reference-compat
    per-replica-mean mode agrees only approximately (DataParallel semantics,
    reference module.py:152-159)."""
    mesh = make_mesh(8)
    params, x, c, pr_mat, det_loss = _det_loss_setup()
    single = float(det_loss(params, x, c, pr_mat))

    def make_mapped(axis_name):
        def shard_fn(params, x, c, pr_mat):
            return jax.lax.pmean(
                det_loss(params, x, c, pr_mat, axis_name=axis_name), "data")
        return jax.jit(_shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=P(), check_vma=False))

    xs, cs, ps = shard_batch(mesh, np.asarray(x), np.asarray(c),
                             np.asarray(pr_mat))
    params_r = replicate(mesh, params)

    exact = float(make_mapped(("data",))(params_r, xs, cs, ps))
    np.testing.assert_allclose(exact, single, rtol=1e-5)

    compat = float(make_mapped(None)(params_r, xs, cs, ps))
    np.testing.assert_allclose(compat, single, rtol=2e-2)


def test_mesh_grad_matches_single_device():
    """Gradient parity of the exact DP reduction: pmean of per-shard grads of
    the psum(num)/psum(denom) loss == the single-program gradient (jax
    transposes psum to psum, so each shard's local grad is N/D-scaled and the
    pmean recovers exactly sum(dnum)/D)."""
    mesh = make_mesh(8)
    params, x, c, pr_mat, det_loss = _det_loss_setup()

    single_g = jax.jit(jax.grad(det_loss))(params, x, c, pr_mat)

    def shard_fn(params, x, c, pr_mat):
        g = jax.grad(
            lambda p: det_loss(p, x, c, pr_mat, axis_name=("data",)))(params)
        return jax.lax.pmean(g, "data")

    mapped = jax.jit(_shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False))
    xs, cs, ps = shard_batch(mesh, np.asarray(x), np.asarray(c),
                             np.asarray(pr_mat))
    sharded_g = mapped(replicate(mesh, params), xs, cs, ps)

    flat_s, _ = jax.tree_util.tree_flatten(single_g)
    flat_m, _ = jax.tree_util.tree_flatten(sharded_g)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-6)


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


@pytest.mark.slow  # 8-shard interpret-mode kernel, ~5 min
def test_mesh_loss_matches_single_device_frame_fused():
    """The fused decode+CE kernel path (train_frame_kernel + fused_loss)
    under shard_map with the exact psum(num)/psum(denom) reduction: sharded
    loss == single-program loss == XLA-path loss to float tolerance (the
    kernel's CE numerator partials psum across the mesh like ops.losses'
    numerators)."""
    SEQ = dataclasses.replace(SMALL, train_frame_kernel=True)
    mesh = make_mesh(8)
    params, x, c, pr_mat, _ = _det_loss_setup()
    key = jax.random.PRNGKey(2)

    def det_loss(cfg, params, x, c, pr_mat, axis_name=None):
        total, _ = dv.loss(params, cfg, key, x, c, pr_mat,
                           tfr1=1.0, tfr2=1.0, tfr3=1.0, sample=False,
                           axis_name=axis_name)
        return total

    single = float(det_loss(SEQ, params, x, c, pr_mat))
    single_xla = float(det_loss(SMALL, params, x, c, pr_mat))
    np.testing.assert_allclose(single, single_xla, rtol=1e-5)

    def shard_fn(params, x, c, pr_mat):
        return jax.lax.pmean(det_loss(SEQ, params, x, c, pr_mat,
                                      axis_name=("data",)), "data")

    mapped = jax.jit(_shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=P(), check_vma=False))
    xs, cs, ps = shard_batch(mesh, np.asarray(x), np.asarray(c),
                             np.asarray(pr_mat))
    exact = float(mapped(replicate(mesh, params), xs, cs, ps))
    np.testing.assert_allclose(exact, single, rtol=1e-5)
