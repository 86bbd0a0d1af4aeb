"""Benchmark: full VAE train-step throughput on the canonical configuration.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The primary metric is training throughput in 2-bar segments/sec/chip on the
canonical DisentangleVAE config (conv texture encoder, batch 128), with the
jitted step doing on-device tensorization + forward + backward + clip + Adam.
``vs_baseline`` is the ratio against the measured PyTorch reference on this
host (BASELINE_MEASURED.json; the reference publishes no numbers).

Secondary numbers (tensorization throughput, pure sampling decode) ride along
in "extra".
"""
from __future__ import annotations

import json
import os
import time




def _bench_train_step(n_steps: int = 12, batch_size: int = 128,
                      compute_dtype: str = "float32"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pctd_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from pctd_tpu.config import ModelConfig, TrainConfig
    from pctd_tpu.train.trainer import init_state, make_train_step
    from __graft_entry__ import _example_batch

    mcfg = dataclasses.replace(ModelConfig(), compute_dtype=compute_dtype)
    tcfg = TrainConfig(batch_size=batch_size)
    state, tx = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, tx)

    pr, chord, shift = _example_batch(batch_size, seed=0)
    pr, chord, shift = jnp.asarray(pr), jnp.asarray(chord), jnp.asarray(shift)

    # compile + warmup, hard host sync (float(); block_until_ready alone is
    # unreliable on this stack's async relay)
    for _ in range(2):
        state, metrics = step(state, pr, chord, shift)
        float(metrics["loss"])

    # steady-state: async chain of n_steps (each step's params feed the next,
    # so all steps really execute) with one final host sync — the per-step
    # tunnel RTT (~25 ms) is amortized, matching real training-loop behavior.
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, pr, chord, shift)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    # per-step host-synced variant for reference
    t0 = time.perf_counter()
    for _ in range(4):
        state, metrics = step(state, pr, chord, shift)
        loss = float(metrics["loss"])
    dt_sync = (time.perf_counter() - t0) / 4
    return batch_size / dt, dt, dt_sync, loss


def _bench_tensorize(batch_size: int = 16384, n_iters: int = 10):
    import jax
    import jax.numpy as jnp

    from pctd_tpu.config import PianoTreeSpec
    from pctd_tpu.data.tensorize import tensorize_batch
    from __graft_entry__ import _example_batch

    pr, chord, shift = _example_batch(batch_size, seed=1)
    pr, chord, shift = jnp.asarray(pr), jnp.asarray(chord), jnp.asarray(shift)
    f = jax.jit(lambda p, c, s: tensorize_batch(
        p, c, s, spec=PianoTreeSpec(), with_detrend=True))
    out = f(pr, chord, shift)
    float(out["x"][0, 0, 0, 0])
    # accumulate-chain so every iteration really executes, with one final sync
    # (per-iteration host syncs are dominated by ~30 ms tunnel RTT)
    add = jax.jit(lambda a, o: a + o["pr_mat"].sum())
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = f(pr, chord, shift)
        acc = add(acc, out)
    float(acc)
    dt = (time.perf_counter() - t0) / n_iters
    return batch_size / dt


def _bench_sampler(batch_size: int = 128, n_iters: int = 5):
    """Pure autoregressive decode (inference mode) throughput."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from pctd_tpu.config import ModelConfig
    from pctd_tpu.models import disentangle_vae as dv

    mcfg = ModelConfig()
    params = dv.init_params(jax.random.PRNGKey(0), mcfg)
    z_chd = jax.random.normal(jax.random.PRNGKey(1),
                              (batch_size, mcfg.chd_z_dim))
    z_rhy = jax.random.normal(jax.random.PRNGKey(2),
                              (batch_size, mcfg.txt_z_dim))
    decode = jax.jit(partial(dv.decode_z, cfg=mcfg, frame_decoder="pallas"))
    est = decode(params, z_chd=z_chd, z_rhy=z_rhy)
    float(est[0, 0, 0, 0])
    add = jax.jit(lambda a, e: a + e.sum())
    acc = jnp.zeros((), jnp.int32)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        est = decode(params, z_chd=z_chd, z_rhy=z_rhy)
        acc = add(acc, est)
    float(acc)
    dt = (time.perf_counter() - t0) / n_iters
    return batch_size / dt


def main():
    import jax

    baseline = None
    bpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_MEASURED.json")
    if os.path.exists(bpath):
        with open(bpath) as f:
            baseline = json.load(f)

    # production config: bf16 MXU path, f32 Gaussian heads/losses/master
    seg_bf16, step_bf16, step_bf16_sync, loss_bf16 = _bench_train_step(
        compute_dtype="bfloat16")
    # parity config: full f32 (exact oracle-parity numerics)
    seg_f32, step_f32, _, _ = _bench_train_step(compute_dtype="float32")
    tens_per_sec = _bench_tensorize()
    dec_per_sec = _bench_sampler()

    ref_rate = (baseline or {}).get("train_step", {}).get(
        "segments_per_sec", None)
    vs = seg_bf16 / ref_rate if ref_rate else None

    print(json.dumps({
        "metric": "train_segments_per_sec_per_chip",
        "value": round(seg_bf16, 2),
        "unit": "2-bar segments/sec/chip (canonical VAE train step, bs=128, "
                "bf16 compute / f32 heads+losses)",
        "vs_baseline": round(vs, 2) if vs else None,
        "extra": {
            "step_seconds_bf16": round(step_bf16, 5),
            "step_seconds_bf16_hostsync": round(step_bf16_sync, 5),
            "train_segments_per_sec_f32": round(seg_f32, 2),
            "step_seconds_f32": round(step_f32, 5),
            "final_loss_bf16": round(loss_bf16, 4),
            "tensorize_segments_per_sec": round(tens_per_sec, 1),
            "sample_decode_segments_per_sec": round(dec_per_sec, 2),
            "device": str(jax.devices()[0]),
            "baseline_source": "BASELINE_MEASURED.json (torch reference on this host CPU)",
        },
    }))


if __name__ == "__main__":
    main()
