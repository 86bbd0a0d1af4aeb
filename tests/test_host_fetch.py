"""utils.host: layout-safe device->host fetch (see pctd_tpu/utils/host.py).

The layout cliff itself only exists on the TPU runtime (Mosaic custom-call
output layouts); these CPU tests pin the fetch API's semantics — values,
dtypes, pytree structure, and non-array passthrough — so every serving
path can route through it unconditionally.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pctd_tpu.utils import host


def test_fetch_np_roundtrip():
    x = jnp.arange(24, dtype=jnp.int32).reshape(2, 3, 4)
    out = host.fetch_np(x)
    assert isinstance(out, np.ndarray)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, np.arange(24).reshape(2, 3, 4))


def test_fetch_pytree_structure_and_passthrough():
    tree = {"a": jnp.ones((4,), jnp.float32),
            "b": [jnp.zeros((2, 2), jnp.int32), "meta"],
            "c": 7}
    out = host.fetch(tree)
    assert isinstance(out["a"], np.ndarray)
    assert out["a"].dtype == np.float32
    assert isinstance(out["b"][0], np.ndarray)
    assert out["b"][1] == "meta"
    assert out["c"] == 7


def test_relayout_stays_on_device():
    x = jnp.arange(8.0)
    y = host.relayout({"x": x})["x"]
    assert isinstance(y, jax.Array)
    np.testing.assert_allclose(np.asarray(y), np.arange(8.0))


def test_fetch_np_accepts_numpy_input():
    x = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(host.fetch_np(x), x)
