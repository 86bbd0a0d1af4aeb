"""Multi-host helpers: single-process virtual-mesh tests + a REAL two-process
jax.distributed test (2 subprocesses x 4 forced CPU devices, local
coordinator) asserting loss parity with the single-process 8-device run."""
import os
import re
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pctd_tpu.parallel import distributed as dist
from pctd_tpu.parallel import make_mesh


def test_initialize_noop_single_process():
    dist.initialize(num_processes=1)  # must not raise


def test_global_data_mesh():
    mesh = dist.make_global_data_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == jax.device_count() == 8


def test_hybrid_mesh_single_host_shape():
    mesh = dist.make_hybrid_mesh()
    assert mesh.axis_names == ("dcn_data", "data")
    assert mesh.devices.shape == (1, 8)
    # a reduction over both axes still works on the degenerate host axis
    import jax.numpy as jnp
    from pctd_tpu.parallel.mesh import _shard_map

    f = jax.jit(_shard_map(
        lambda x: jax.lax.pmean(jax.lax.pmean(x.sum(), "data"), "dcn_data"),
        mesh=mesh, in_specs=P("dcn_data", "data"), out_specs=P(),
        check_vma=False))
    x = jnp.arange(16.0).reshape(1, 16)
    np.testing.assert_allclose(float(f(x)), float(x.sum()) / 8)


def test_local_batch_slice():
    share, off = dist.local_batch_slice(128)
    assert share == 128 and off == 0


def _single_process_8dev_loss() -> float:
    """Reference value for the 2-process test: one train step on the same
    batch/params over the 1-D 8-device mesh in THIS process."""
    import dataclasses

    from pctd_tpu.config import DataConfig, TrainConfig
    from pctd_tpu.data.loaders import make_loaders
    from pctd_tpu.data.synthetic import synthetic_corpora
    from pctd_tpu.parallel import (make_parallel_train_step, replicate,
                                   shard_batch)
    from pctd_tpu.train.trainer import init_state
    from tests.test_training import SMALL

    tcfg = dataclasses.replace(TrainConfig(), batch_size=16)
    mesh = make_mesh(8)
    dcfg = dataclasses.replace(DataConfig(), portion=4)
    train, val = synthetic_corpora(n_songs=4, seed=2, n_bars=8, cfg=dcfg)
    tl, _ = make_loaders(train, val, batch_size=16, seed=0)
    batch = next(tl.epoch())
    pr, chord, shift = shard_batch(mesh, batch["pr"], batch["chord"],
                                   batch["shift"])
    state, tx = init_state(jax.random.PRNGKey(0), SMALL, tcfg)
    state = replicate(mesh, state)
    step = make_parallel_train_step(SMALL, tcfg, tx, mesh)
    _, metrics = step(state, pr, chord, shift)
    return float(metrics["loss"])


@pytest.mark.slow
def test_two_process_train_step():
    """Two OS processes, 4 forced CPU devices each, local coordinator: the
    hybrid (dcn_data, data) mesh train step must produce the same loss on
    both processes AND match the single-process 8-device 1-D mesh step
    (same params, batch and per-replica RNG layout)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    losses = []
    for out in outs:
        m = re.search(r"WORKER_OK pid=\d+ loss=([0-9.]+)", out)
        assert m, f"no WORKER_OK line:\n{out}"
        losses.append(float(m.group(1)))
    # both processes see the same pmean-ed loss
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    # and it matches the single-process 8-device step
    single = _single_process_8dev_loss()
    np.testing.assert_allclose(losses[0], single, rtol=1e-5)
