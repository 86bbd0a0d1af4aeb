"""Jitted train/eval steps + the epoch-level training harness.

Capability of the reference TrainingInterface (amc_dl/torch_plus/module.py:
60-213), redesigned TPU-first:

- ONE compiled program per phase: batch tensorization (augmentation, grid,
  chord expansion, detrend), schedule evaluation, forward, loss, backward,
  clip, Adam update and LR decay all live inside a single jitted step with
  donated state — zero host sync in the hot loop beyond feeding raw uint8
  segments.
- RNG: a base key folded with the step counter gives reproducible,
  checkpoint-resumable randomness (replacing torch's global RNG and
  random.random() coins).
- Checkpointing: orbax saves (params, opt_state, step, key) — full resume,
  which the reference lacks (it saves model weights only, module.py:179-183).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pctd_tpu.config import ModelConfig, TrainConfig
from pctd_tpu.data import tensorize as tz
from pctd_tpu.data.detrend import detrend_pianotree_jnp
from pctd_tpu.data.loaders import SegmentBatches
from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.train import schedules
from pctd_tpu.train.logging import MetricWriters, RunPaths


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray      # scalar int32
    key: jnp.ndarray       # base PRNG key


def init_state(key: jax.Array, mcfg: ModelConfig,
               tcfg: TrainConfig) -> Tuple[TrainState,
                                           optax.GradientTransformation]:
    k_params, k_base = jax.random.split(key)
    params = dv.init_params(k_params, mcfg)
    tx = schedules.make_optimizer(tcfg)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32),
                      k_base), tx


def batch_features(pr, chord, shift, mcfg: ModelConfig):
    """Raw uint8 segments -> model inputs, on device (see data.tensorize)."""
    pr_s = tz.shift_pr(pr.astype(jnp.int32), shift)
    pr_mat = tz.pr_to_dur_matrix(pr_s)
    x = tz.dur_matrix_to_grid(pr_mat, mcfg.pianotree)
    c = tz.expand_chord_batch(chord, shift)
    dt_x = (detrend_pianotree_jnp(x, c)
            if mcfg.txt_encoder == "pianotree" else None)
    return x, c, pr_mat, dt_x


def auto_accum_steps(mcfg: ModelConfig, tcfg: TrainConfig) -> int:
    """Resolve TrainConfig.accum_steps, where 0 = automatic.

    Auto engages just enough microbatches that each stays inside the
    per-step HBM envelope: 2048 segments with frame remat or the fused
    train-frame kernel (BENCH B=2048 headline config), 512 without (remat
    is what "enables batch >= 1024", ARCHITECTURE batch-scaling table;
    B=4096 in one step OOMs on both paths) — measured on a 16 GiB chip and
    scaled linearly to this device's HBM (utils.device_mem; activation
    memory dominates and is batch-proportional; unknown HBM keeps the
    measured constants). Picks the smallest microbatch count that divides
    the batch (required by the accumulation reshape), so any reasonable
    batch size trains instead of OOMing. A batch with no small divisor
    (e.g. a prime > envelope) has no usable microbatch split — that raises
    with guidance rather than silently compiling a 1-segment-per-microbatch
    scan.
    """
    if tcfg.accum_steps > 0:
        return tcfg.accum_steps
    from pctd_tpu.utils import device_mem

    base = 2048 if (mcfg.remat_frames or mcfg.train_frame_kernel) else 512
    envelope = device_mem.scale_by_hbm(base)
    B = tcfg.batch_size
    ideal = max(1, -(-B // envelope))
    need = ideal
    while B % need:
        need += 1
    if need > max(8, 4 * ideal):
        raise ValueError(
            f"batch_size={B} exceeds the single-step HBM envelope "
            f"({envelope}) but its smallest divisor >= {ideal} is {need}, "
            f"which would scan {need} tiny microbatches. Pick a batch size "
            f"divisible by a small count (e.g. {ideal * envelope}) or set "
            f"accum_steps explicitly.")
    return need


def _train_fns(mcfg: ModelConfig, tcfg: TrainConfig,
               tx: optax.GradientTransformation):
    """The un-jitted building blocks of the train step: returns
    (effective_grad_fn, update_fn) where effective_grad_fn already wraps
    gradient accumulation when ``auto_accum_steps`` resolves > 1."""

    def grad_fn(params, step, key, x, c, pr_mat, dt_x):
        sched = schedules.train_params_at(step, tcfg)

        def loss_fn(p):
            return dv.loss(p, mcfg, key, x, c, pr_mat, dt_x,
                           tfr1=sched["tfr1"], tfr2=sched["tfr2"],
                           tfr3=sched["tfr3"], beta=sched["beta"],
                           weights=tcfg.weights,
                           weighted_dur=tcfg.weighted_dur)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        return metrics, grads

    def update_fn(state: TrainState, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, state.key)

    accum = auto_accum_steps(mcfg, tcfg)

    def grad_accum_fn(params, step, key, x, c, pr_mat, dt_x):
        """Gradient accumulation: split the batch into ``accum`` microbatches
        and lax.scan over them (activation memory = one microbatch; the
        effective batch is the full input). Grads/metrics are microbatch
        means, matching a single large-batch step up to CE-mask denominators."""

        def micro(a):
            return jax.tree_util.tree_map(
                lambda t: t.reshape(accum, t.shape[0] // accum,
                                    *t.shape[1:]), a)

        xs = (micro(x), micro(c), micro(pr_mat),
              micro(dt_x) if dt_x is not None else None)

        def body(carry, inp):
            i, acc_m, acc_g = carry
            xi, ci, pi, di = inp
            mkey = jax.random.fold_in(key, i)
            m, g = grad_fn(params, step, mkey, xi, ci, pi, di)
            acc_m = jax.tree_util.tree_map(jnp.add, acc_m, m)
            acc_g = jax.tree_util.tree_map(jnp.add, acc_g, g)
            return (i + 1, acc_m, acc_g), None

        zero_m, zero_g = jax.tree_util.tree_map(
            jnp.zeros_like,
            jax.eval_shape(grad_fn, params, step, key, *[
                jax.tree_util.tree_map(lambda t: t[: t.shape[0] // accum], a)
                if a is not None else None
                for a in (x, c, pr_mat, dt_x)]))
        (_, sum_m, sum_g), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.int32), zero_m, zero_g), xs)
        inv = 1.0 / accum
        return (jax.tree_util.tree_map(lambda t: t * inv, sum_m),
                jax.tree_util.tree_map(lambda t: t * inv, sum_g))

    return (grad_accum_fn if accum > 1 else grad_fn), update_fn


def make_train_programs(mcfg: ModelConfig, tcfg: TrainConfig,
                        tx: optax.GradientTransformation) -> dict:
    """The split train step's three independently-jitted programs (plus the
    trivial key fold): {"tens", "grad", "upd", "fold"}.

    Each is independently serializable via ``utils.aot`` (lower -> compile
    -> serialize_executable), which is what lets a committed AOT bundle set
    replace the multi-minute cold compile of the full step
    (train.aot_steps; VERDICT r4 item 1)."""
    effective_grad_fn, update_fn = _train_fns(mcfg, tcfg, tx)
    return {
        "tens": jax.jit(partial(batch_features, mcfg=mcfg)),
        "grad": jax.jit(effective_grad_fn),
        "upd": jax.jit(update_fn, donate_argnums=(0,)),
        "fold": jax.jit(lambda key, step: jax.random.fold_in(key, step)),
    }


def make_train_step(mcfg: ModelConfig, tcfg: TrainConfig,
                    tx: optax.GradientTransformation, split: bool = True,
                    aot_exes: Optional[dict] = None):
    """Returns (state, pr, chord, shift) -> (state, metrics), fully on device.

    ``split=True`` (default) compiles the step as THREE programs —
    tensorize, loss+grad, optimizer update — instead of one. All three stay
    on device with no host sync between them (dispatch is async), so steady-
    state throughput is identical; what it buys is compile time: this TPU
    stack's compile latency grows superlinearly with program size (the fused
    single program takes >20 min to compile vs ~7 min for grad alone), and
    the three sub-programs are each individually cacheable.

    ``aot_exes`` (split mode only): preloaded AOT executables from
    ``train.aot_steps.load_train_step_exes`` — any of {"tens", "grad",
    "upd"} present replaces the corresponding jit program, skipping its
    compile entirely.

    ``split=False`` gives the single fused program (used by shard_map
    multi-chip steps, where the collective must live with the grads).
    """
    if not split:
        effective_grad_fn, update_fn = _train_fns(mcfg, tcfg, tx)

        def fused(state: TrainState, pr, chord, shift):
            x, c, pr_mat, dt_x = batch_features(pr, chord, shift, mcfg)
            key = jax.random.fold_in(state.key, state.step)
            metrics, grads = effective_grad_fn(state.params, state.step, key,
                                               x, c, pr_mat, dt_x)
            return update_fn(state, grads), metrics

        return jax.jit(fused, donate_argnums=(0,))

    progs = make_train_programs(mcfg, tcfg, tx)
    if aot_exes:
        progs = dict(progs, **{k: v for k, v in aot_exes.items()
                               if k in ("tens", "grad", "upd")})
    tens_jit, grad_jit = progs["tens"], progs["grad"]
    upd_jit, fold_jit = progs["upd"], progs["fold"]

    def step_fn(state: TrainState, pr, chord, shift):
        x, c, pr_mat, dt_x = tens_jit(pr, chord, shift)
        key = fold_jit(state.key, state.step)
        metrics, grads = grad_jit(state.params, state.step, key, x, c,
                                  pr_mat, dt_x)
        return upd_jit(state, grads), metrics

    return step_fn


def make_eval_step(mcfg: ModelConfig, tcfg: TrainConfig):
    """Validation loss at the current schedule position (the reference's eval
    re-runs the training forward incl. latent sampling under no_grad,
    module.py:161-177).

    Eval always runs the XLA nested-scan path even when the train step uses
    the fused Pallas kernels: the no-grad PRIMAL kernel program is a distinct
    Mosaic compile (measured 659 s at B=2048 — BENCH_r03) bought for a
    gradient-free phase that is off the throughput-critical path, while the
    XLA path compiles in seconds-to-a-minute. The two paths are
    loss-parity tested (tests/test_train_frame_kernel.py), so val metrics
    are unchanged up to fp reassociation.
    """
    import dataclasses

    if mcfg.train_frame_kernel:
        mcfg = dataclasses.replace(mcfg, train_frame_kernel=False)

    def eval_fn(params, step, key, pr, chord, shift):
        x, c, pr_mat, dt_x = batch_features(pr, chord, shift, mcfg)
        if tcfg.eval_fixed_schedule:
            # Schedule-invariant validation: evaluate at the schedules'
            # asymptotic values so val loss (and the best-checkpoint choice
            # below) does not drift with the tfr/beta ramps. Default False =
            # reference parity (module.py:161-177 evals at current schedule).
            sched = schedules.final_params(tcfg)
        else:
            sched = schedules.train_params_at(step, tcfg)
        _, metrics = dv.loss(params, mcfg, key, x, c, pr_mat, dt_x,
                             tfr1=sched["tfr1"], tfr2=sched["tfr2"],
                             tfr3=sched["tfr3"], beta=sched["beta"],
                             weights=tcfg.weights,
                             weighted_dur=tcfg.weighted_dur)
        return metrics

    return jax.jit(eval_fn)


@dataclass
class Trainer:
    """Epoch loop: train -> eval -> checkpoint (epoch/best/final), with
    per-batch metric writing (capability of reference TrainingInterface.run,
    module.py:195-213)."""

    mcfg: ModelConfig
    tcfg: TrainConfig
    train_batches: SegmentBatches
    val_batches: SegmentBatches
    name: str = "disvae"
    run_paths: Optional[RunPaths] = None
    writers: Optional[MetricWriters] = None
    # Metric-write decimation. Epoch averages are exact regardless (they
    # accumulate on device every step); only logged steps pay a host
    # transfer, which costs ~9% of the step at B=2048 (BENCH hostsync vs
    # async). Default 16 = fast; 1 = the reference's per-batch writes
    # (module.py:147-148).
    log_every: int = 16
    # capture a jax.profiler trace of steps [profile_start, profile_stop)
    # of epoch 0 into <run>/profile (SURVEY.md §5: the reference has no
    # tracing at all; wall-clock epoch time only)
    profile_steps: Optional[tuple] = None
    # preload committed AOT executables (train/aot_steps) for this config's
    # train programs — a fresh process starts stepping in seconds instead
    # of paying the multi-minute first compile. Missing/incompatible
    # bundles fall back to normal compilation per program.
    aot_dir: Optional[str] = None

    def __post_init__(self):
        self.state, self.tx = init_state(
            jax.random.PRNGKey(self.tcfg.seed), self.mcfg, self.tcfg)
        aot_exes = None
        if self.aot_dir:
            from pctd_tpu.train.aot_steps import load_train_step_exes
            aot_exes, skipped = load_train_step_exes(
                self.mcfg, self.tcfg, self.aot_dir)
            if aot_exes or skipped:
                print(f"AOT preload: {sorted(aot_exes)} from {self.aot_dir}"
                      + (f" (skipped: {[s[0] for s in skipped]})"
                         if skipped else ""), flush=True)
        self.train_step = make_train_step(self.mcfg, self.tcfg, self.tx,
                                          aot_exes=aot_exes)
        self.eval_step = make_eval_step(self.mcfg, self.tcfg)
        # one-shot Pallas-kernel -> XLA degrade (see _run_train_step)
        self._kernel_fallback_armed = self.mcfg.train_frame_kernel
        self.train_counter = 0
        self.val_counter = 0
        # one stacked transfer per batch instead of 11 scalar host syncs
        # (each sync costs a tunnel round-trip on remote-TPU setups)
        self._stack = jax.jit(
            lambda m: jnp.stack([m[k] for k in dv.METRIC_NAMES]))
        self._add = jax.jit(jnp.add)

    def _metrics_to_host(self, metrics) -> Dict[str, float]:
        vals = np.asarray(self._stack(metrics))
        return dict(zip(dv.METRIC_NAMES, map(float, vals)))

    def _run_train_step(self, pr, chord, shift):
        """One train step, with a one-shot Pallas-kernel -> XLA degrade.

        The fused train kernels' VMEM block sizes are tuned per chip
        generation; on a device where the chosen blocks exceed the VMEM
        space the compile raises at the first step. A production run should
        degrade to the (slower, always-compiling) XLA scan path with a
        warning rather than die — the two paths are gradient-parity tested
        (tests/test_train_frame_kernel.py), so the run's semantics are
        unchanged. Compile errors surface before execution, so the train
        state is still intact when we retry."""
        try:
            return self.train_step(self.state, pr, chord, shift)
        except Exception as e:
            # XLA compile/runtime errors are JaxRuntimeError; Mosaic
            # LOWERING failures raise MosaicError, which subclasses plain
            # Exception — both are kernel-compile failures to degrade on
            is_compile_err = (isinstance(e, jax.errors.JaxRuntimeError)
                              or type(e).__name__ == "MosaicError")
            if not (self._kernel_fallback_armed and is_compile_err):
                raise
            self._kernel_fallback_armed = False
            import dataclasses
            import warnings
            warnings.warn(
                "fused train kernel failed to compile on this device "
                f"({type(e).__name__}: {str(e)[:200]}); falling back to "
                "the XLA scan path (gradient-parity tested, slower)")
            self.mcfg = dataclasses.replace(
                self.mcfg, train_frame_kernel=False, remat_frames=True)
            self.train_step = make_train_step(self.mcfg, self.tcfg, self.tx)
            self.eval_step = make_eval_step(self.mcfg, self.tcfg)
            return self.train_step(self.state, pr, chord, shift)

    # -- phases ----------------------------------------------------------------

    def train_epoch(self) -> Dict[str, float]:
        # Epoch averages accumulate ON DEVICE every step (async, one tiny
        # add) so they are exact and log_every-invariant; only logged steps
        # pay a host transfer.
        sums = None
        n = 0
        prof = self.profile_steps
        for batch in self.train_batches.epoch():
            if prof and self.train_counter == prof[0] and self.run_paths:
                jax.profiler.start_trace(
                    f"{self.run_paths.log_path}/profile")
            self.state, metrics = self._run_train_step(
                jnp.asarray(batch["pr"]),
                jnp.asarray(batch["chord"]), jnp.asarray(batch["shift"]))
            if prof and self.train_counter == prof[1] and self.run_paths:
                jax.tree_util.tree_map(
                    lambda a: a.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                prof = None
            stacked = self._stack(metrics)
            sums = stacked if sums is None else self._add(sums, stacked)
            if self.writers and self.train_counter % self.log_every == 0:
                host = dict(zip(dv.METRIC_NAMES,
                                map(float, np.asarray(stacked))))
                self.writers.write_task("train", host, self.train_counter)
            self.train_counter += 1
            n += 1
        if sums is None:
            return {k: 0.0 for k in dv.METRIC_NAMES}
        vals = np.asarray(sums) / n
        return dict(zip(dv.METRIC_NAMES, map(float, vals)))

    def eval_epoch(self) -> Dict[str, float]:
        # Same on-device accumulation + decimated writes as train_epoch:
        # epoch averages stay exact (one async device-side add per batch),
        # and only every log_every-th batch pays the host transfer. The
        # reference syncs 11 scalars to host every val batch
        # (module.py:161-177); that per-batch float() tax was the last
        # host-sync left in the epoch loop (VERDICT r2 item 5).
        sums = None
        n = 0
        for i, batch in enumerate(self.val_batches.epoch()):
            key = jax.random.fold_in(
                jax.random.fold_in(self.state.key, 0x5EED), i)
            metrics = self.eval_step(
                self.state.params, self.state.step, key,
                jnp.asarray(batch["pr"]), jnp.asarray(batch["chord"]),
                jnp.asarray(batch["shift"]))
            stacked = self._stack(metrics)
            sums = stacked if sums is None else self._add(sums, stacked)
            if self.writers and self.val_counter % self.log_every == 0:
                host = dict(zip(dv.METRIC_NAMES,
                                map(float, np.asarray(stacked))))
                self.writers.write_task("val", host, self.val_counter)
            self.val_counter += 1
            n += 1
        if n == 0:
            # an empty val iterator must not report 0.0 (it would win
            # best-checkpoint selection); inf keeps 'no signal' inert.
            return {k: float("inf") for k in dv.METRIC_NAMES}
        vals = np.asarray(sums) / n
        return dict(zip(dv.METRIC_NAMES, map(float, vals)))

    # -- checkpointing -----------------------------------------------------------

    def save_checkpoint(self, tag: str):
        if self.run_paths is None:
            return
        from pctd_tpu.train.checkpoint import save_state
        save_state(self.run_paths.model_path(self.name, tag), self.state)

    def restore_checkpoint(self, path: str):
        from pctd_tpu.train.checkpoint import restore_state
        self.state = restore_state(path, self.state)

    # -- driver ------------------------------------------------------------------

    def run(self, n_epoch: Optional[int] = None) -> Dict[str, float]:
        n_epoch = n_epoch or self.tcfg.n_epoch
        best_val = float("inf")
        last = {}
        for epoch in range(n_epoch):
            t0 = time.time()
            train_m = self.train_epoch()
            val_m = self.eval_epoch()
            dt = time.time() - t0
            if self.tcfg.save_every_epoch:
                self.save_checkpoint("epoch")
            if val_m["loss"] < best_val:
                best_val = val_m["loss"]
                self.save_checkpoint("valid")
            mins, secs = divmod(int(dt), 60)
            print(f"Epoch: {epoch + 1:02} | Time: {mins}m {secs}s",
                  flush=True)
            print(f"\tTrain Loss: {train_m['loss']:.3f}", flush=True)
            print(f"\t Valid. Loss: {val_m['loss']:.3f}", flush=True)
            last = {"train": train_m, "val": val_m,
                    "epoch_seconds": dt}
        self.save_checkpoint("final")
        return last
