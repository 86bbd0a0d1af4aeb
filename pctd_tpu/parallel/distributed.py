"""Multi-host (DCN + ICI) mesh construction.

The reference has no distributed backend at all (SURVEY.md §2: its only
parallelism is single-process DataParallel). Here the single-host data mesh
in ``pctd_tpu.parallel.mesh`` extends to multi-host SPMD: call
``initialize()`` once per host, then build a global mesh whose outer axis
spans hosts (collectives ride DCN across slices) and inner axis spans the
local chips (ICI). The same ``make_parallel_train_step`` works unchanged on
the returned mesh — shard the global batch on the combined data axis.

This module is exercised in CI only up to mesh construction on the virtual
CPU mesh (no multi-host hardware in the dev environment); it follows the
standard jax.distributed recipe so a v4-32-style deployment is config-only.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; no-op when single-process (the
    arguments are auto-detected on Cloud TPU pods)."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_data_mesh(axis: str = "data") -> Mesh:
    """1-D global data mesh over every chip in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def make_hybrid_mesh(dcn_axis: str = "dcn_data", ici_axis: str = "data"
                     ) -> Mesh:
    """2-D (hosts, chips-per-host) mesh: gradient reduction does a
    hierarchical pmean — ICI within a host/slice, DCN across — when the step
    reduces over both axes. Shard the batch over both axes."""
    n_proc = jax.process_count()
    per_host = jax.local_device_count()
    devices = np.asarray(jax.devices()).reshape(n_proc, per_host)
    return Mesh(devices, (dcn_axis, ici_axis))


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(this host's batch share, offset) for host-local data loading."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    share = global_batch // n
    return share, share * jax.process_index()


def replicate_global(mesh: Mesh, tree):
    """Replicate a pytree over a (possibly multi-process) mesh. Every process
    must pass the same host values (e.g. params from the same seed)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_process_local_data(sharding, a, a.shape)

    return jax.tree_util.tree_map(put, tree)


def shard_global_batch(mesh: Mesh, *arrays, axes=("data",)):
    """Multi-process batch placement: each process passes its LOCAL slice
    (rows [offset, offset+share) of the global batch, see
    ``local_batch_slice``); returns global jax.Arrays sharded on the leading
    axis over ``axes``. Single-process this degrades to plain device_put, so
    it is a drop-in for mesh.shard_batch on any process count."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = jax.process_count()
    out = []
    for a in arrays:
        a = np.asarray(a)
        sharding = NamedSharding(mesh, P(axes, *([None] * (a.ndim - 1))))
        if n == 1:
            out.append(jax.device_put(a, sharding))
        else:
            gshape = (a.shape[0] * n,) + a.shape[1:]
            out.append(jax.make_array_from_process_local_data(
                sharding, a, gshape))
    return tuple(out) if len(out) > 1 else out[0]
