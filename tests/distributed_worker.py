"""Worker process for the two-process jax.distributed test.

Launched (twice) by tests/test_distributed.py::test_two_process_train_step
with JAX_PLATFORMS=cpu and XLA_FLAGS forcing 4 local CPU devices, so the job
is 2 processes x 4 devices = 8 global devices. Runs ONE hybrid-mesh
(DCN x ICI) data-parallel train step on a deterministic batch and prints the
resulting loss for the parent to compare against the single-process 8-device
run. Usage: python distributed_worker.py <pid> <nproc> <port>
"""
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    import dataclasses

    import numpy as np

    from pctd_tpu.config import DataConfig, TrainConfig
    from pctd_tpu.data.loaders import make_loaders
    from pctd_tpu.data.synthetic import synthetic_corpora
    from pctd_tpu.parallel import distributed as dist
    from pctd_tpu.parallel import make_parallel_train_step
    from pctd_tpu.train.trainer import init_state
    from tests.test_training import SMALL

    tcfg = dataclasses.replace(TrainConfig(), batch_size=16)
    mesh = dist.make_hybrid_mesh()           # (nproc, 4): dcn_data x data
    assert mesh.devices.shape == (nproc, 4)

    # deterministic global batch, same on every process (seeded)
    dcfg = dataclasses.replace(DataConfig(), portion=4)
    train, val = synthetic_corpora(n_songs=4, seed=2, n_bars=8, cfg=dcfg)
    tl, _ = make_loaders(train, val, batch_size=16, seed=0)
    batch = next(tl.epoch())

    share, off = dist.local_batch_slice(16)
    assert share == 16 // nproc and off == pid * share
    axes = ("dcn_data", "data")
    pr, chord, shift = dist.shard_global_batch(
        mesh, batch["pr"][off:off + share], batch["chord"][off:off + share],
        batch["shift"][off:off + share], axes=axes)

    state, tx = init_state(jax.random.PRNGKey(0), SMALL, tcfg)
    state = dist.replicate_global(mesh, state)
    step = make_parallel_train_step(SMALL, tcfg, tx, mesh, axis=axes)
    state, metrics = step(state, pr, chord, shift)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert int(state.step) == 1
    # params replicated identically across this process's local devices
    p = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in p.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    print(f"WORKER_OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
