"""Device mesh + data-parallel train step.

The reference's only parallelism is single-process ``nn.DataParallel``
(train.py:21,28-29; module.py:66-68): replicate the module, scatter the batch,
gather per-replica losses. The TPU-native equivalent here is a 1-D ``data``
mesh over ICI with an explicitly collective train step:

- params + optimizer state are replicated (PartitionSpec()),
- the batch is sharded on its leading axis (PartitionSpec('data')),
- the step runs under ``shard_map``; gradients and metrics are ``pmean``-ed
  over the mesh axis — one fused all-reduce over ICI per step, placed by XLA.

RNG follows DataParallel semantics: each shard folds its mesh position into
the step key, so teacher-forcing coins and latent noise are drawn per replica
(exactly what the reference's per-GPU ``random.random()`` calls do).

For multi-host (DCN) topologies the same code works with a
``jax.distributed.initialize()``-created global mesh; batch sharding then
spans hosts and the gradient all-reduce rides ICI within a slice and DCN
across slices.
"""
from __future__ import annotations

from typing import Optional

import jax

import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

_shard_map = shard_map  # internal alias; ``shard_map`` is the public shim

from pctd_tpu.config import ModelConfig, TrainConfig
from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.train import schedules
from pctd_tpu.train.trainer import TrainState, batch_features


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place host arrays on the mesh, sharded along the leading axis."""
    out = []
    for a in arrays:
        spec = P(axis, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def _axes_tuple(axis) -> tuple:
    return (axis,) if isinstance(axis, str) else tuple(axis)


def _flat_replica_id(axes: tuple):
    """Row-major linear index of this shard across the given mesh axes (for
    per-replica RNG folding; equals the 1-D axis_index when len(axes)==1)."""
    rid = jax.lax.axis_index(axes[0])
    for ax in axes[1:]:
        rid = rid * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
    return rid


def make_parallel_train_step(mcfg: ModelConfig, tcfg: TrainConfig,
                             tx: optax.GradientTransformation, mesh: Mesh,
                             axis="data", exact_loss: bool = True):
    """Data-parallel train step: (state, pr, chord, shift) -> (state, metrics).

    state replicated; (pr, chord, shift) sharded on the batch axis; gradients
    pmean-ed over ICI before the (replicated) optimizer update.

    ``axis`` may be a single mesh axis name or a tuple of names: pass
    ``("dcn_data", "data")`` with a hybrid multi-host mesh
    (parallel.distributed.make_hybrid_mesh) to shard the global batch over
    hosts x chips and reduce gradients hierarchically — XLA lowers the pmean
    over both axes to an ICI all-reduce within each host/slice plus a DCN
    all-reduce across them.

    ``exact_loss=True`` (default) reduces the masked-CE terms with global
    psum(numerator)/psum(denominator), so the N-chip loss AND gradient equal
    the single-device ones exactly (the extra psums fuse into the step's
    existing all-reduce traffic). ``False`` is the reference-compat mode:
    per-replica means then pmean, i.e. DataParallel's reduction
    (/root/reference/amc_dl/torch_plus/module.py:152-159).
    """
    axes = _axes_tuple(axis)
    bspec = P(axes)
    ce_axis = axes if exact_loss else None

    def shard_fn(state: TrainState, pr, chord, shift):
        x, c, pr_mat, dt_x = batch_features(pr, chord, shift, mcfg)
        sched = schedules.train_params_at(state.step, tcfg)
        key = jax.random.fold_in(
            jax.random.fold_in(state.key, state.step),
            _flat_replica_id(axes))

        def loss_fn(params):
            return dv.loss(params, mcfg, key, x, c, pr_mat, dt_x,
                           tfr1=sched["tfr1"], tfr2=sched["tfr2"],
                           tfr3=sched["tfr3"], beta=sched["beta"],
                           weights=tcfg.weights,
                           weighted_dur=tcfg.weighted_dur,
                           axis_name=ce_axis)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = jax.lax.pmean(grads, axes)
        metrics = jax.lax.pmean(metrics, axes)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, state.key), \
            metrics

    mapped = _shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), bspec, bspec, bspec),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,))


def make_parallel_eval_step(mcfg: ModelConfig, tcfg: TrainConfig, mesh: Mesh,
                            axis="data", exact_loss: bool = True):
    # eval is gradient-free and off the throughput-critical path: run the
    # XLA scan path rather than paying the fused kernels' separate primal
    # Mosaic compile (see trainer.make_eval_step)
    if mcfg.train_frame_kernel:
        import dataclasses
        mcfg = dataclasses.replace(mcfg, train_frame_kernel=False)
    axes = _axes_tuple(axis)
    bspec = P(axes)
    ce_axis = axes if exact_loss else None

    def shard_fn(params, step, key, pr, chord, shift):
        x, c, pr_mat, dt_x = batch_features(pr, chord, shift, mcfg)
        sched = schedules.train_params_at(step, tcfg)
        key = jax.random.fold_in(key, _flat_replica_id(axes))
        _, metrics = dv.loss(params, mcfg, key, x, c, pr_mat, dt_x,
                             tfr1=sched["tfr1"], tfr2=sched["tfr2"],
                             tfr3=sched["tfr3"], beta=sched["beta"],
                             weights=tcfg.weights,
                             weighted_dur=tcfg.weighted_dur,
                             axis_name=ce_axis)
        return jax.lax.pmean(metrics, axes)

    mapped = _shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), bspec, bspec, bspec),
        out_specs=P(),
        check_vma=False)
    return jax.jit(mapped)
