"""CPU-mesh scaling smoke for the sharded train step (VERDICT r2 item 8).

Runs the SAME tiny global batch through the data-parallel train step on a
1-device mesh and an 8-device virtual mesh, asserts the global loss is
identical (the exact_loss psum(num)/psum(den) contract), and records the
wall-clock of each. The caller must set ``JAX_PLATFORMS=cpu`` and
``--xla_force_host_platform_device_count=8``; bench.py does this via a
subprocess so the numbers ride along in the driver artifact, explicitly
labeled CPU-mesh-only (the sharded path's overhead trend, NOT a TPU scaling
claim — multi-chip TPU hardware is not reachable from this host).

Matches SURVEY §4's "1-device vs N-device identical loss" bar; the
functional twin lives in tests/test_parallel.py.
"""
from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _small_mcfg():
    from pctd_tpu.config import ModelConfig

    return dataclasses.replace(
        ModelConfig(), chd_z_dim=16, txt_z_dim=16, chd_enc_hidden=32,
        txt_emb_size=32, txt_enc_hidden=32, chd_dec_hidden=32,
        chd_dec_z_in=16, note_emb_size=32, dec_emb_hidden=16,
        dec_time_hidden=48, dec_notes_hidden=24, dec_z_in=16,
        dec_dur_hidden=8)


def _bench_mesh(n_devices: int, global_batch: int, n_steps: int = 4,
                repeats: int = 3):
    import jax

    from pctd_tpu.data.synthetic import example_batch as _example_batch
    from pctd_tpu.config import TrainConfig
    from pctd_tpu.parallel import (make_mesh, make_parallel_train_step,
                                   replicate, shard_batch)
    from pctd_tpu.train.trainer import init_state

    mcfg = _small_mcfg()
    tcfg = TrainConfig(batch_size=global_batch)
    mesh = make_mesh(n_devices)
    state, tx = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    state = replicate(mesh, state)
    step = make_parallel_train_step(mcfg, tcfg, tx, mesh)
    pr, chord, shift = _example_batch(global_batch)
    pr, chord, shift = shard_batch(mesh, pr, chord, shift)

    state, metrics = step(state, pr, chord, shift)  # compile + step 1
    first_loss = float(metrics["loss"])

    def chain():
        nonlocal state
        t0 = time.perf_counter()
        s, m = state, None
        for _ in range(n_steps):
            s, m = step(s, pr, chord, shift)
        float(m["loss"])
        state = s
        return (time.perf_counter() - t0) / n_steps

    dt = statistics.median(chain() for _ in range(repeats))
    return {"devices": n_devices, "global_batch": global_batch,
            "first_step_loss": first_loss, "step_seconds": round(dt, 4)}


def main() -> int:
    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; force it via
    # config before any device is touched (same workaround as __graft_entry__)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    assert jax.device_count() >= 8, (
        f"need 8 virtual devices, have {jax.device_count()} — set "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8")
    one = _bench_mesh(1, 64)
    eight = _bench_mesh(8, 64)
    loss_diff = abs(one["first_step_loss"] - eight["first_step_loss"])
    rel = loss_diff / max(abs(one["first_step_loss"]), 1e-12)
    # the full train step folds the RNG key per shard, so teacher-forcing
    # coins/rsample noise differ between mesh sizes — loose sanity bound
    # here; the strict rtol-1e-5 reduction-parity contract is asserted on a
    # deterministic loss in tests/test_parallel.py
    assert rel < 2e-2, (
        f"1-device vs 8-device loss mismatch: {one['first_step_loss']} vs "
        f"{eight['first_step_loss']} (rel {rel:.2e})")
    print(json.dumps({
        "note": "CPU-mesh-only scaling smoke (virtual 8-device host mesh); "
                "validates the sharded path's loss equality + overhead "
                "trend, not TPU scaling",
        "mesh_1dev": one, "mesh_8dev": eight,
        "loss_rel_diff": rel,
        "speedup_8v1": round(one["step_seconds"] / eight["step_seconds"], 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
