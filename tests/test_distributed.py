"""Multi-host helpers on the virtual 8-device mesh (single process)."""
import jax
import numpy as np
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
