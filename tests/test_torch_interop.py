"""Checkpoint interop: reference .pt state_dict <-> our params pytree.

The forward mapping must agree with the module-level transplant harness
(tests/torch_bridge.py) that the loss-parity suite validates; the inverse
must round-trip bit-exactly; and a converted checkpoint must produce the
same posterior as the torch model it came from.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pctd_tpu.config import ModelConfig
from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.utils import torch_interop as ti

from tests.reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.slow  # torch oracle

torch = pytest.importorskip("torch")


def test_roundtrip_params_to_state_dict_and_back():
    cfg = ModelConfig()
    params = dv.init_params(jax.random.PRNGKey(0), cfg)
    sd = ti.state_dict_from_params(params)
    back = ti.params_from_state_dict(sd, cfg)
    la, lb = (jax.tree_util.tree_leaves(params),
              jax.tree_util.tree_leaves(back))
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not reference_available(), reason="no reference checkout")
def test_reference_state_dict_to_params_matches_torch_posterior(tmp_path):
    REF = load_reference()
    ref = REF.model.DisentangleVAE.init_model(device=torch.device("cpu"))
    # DataParallel-style prefix must be stripped like reference load_model
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    pt = tmp_path / "ref.pt"
    torch.save(sd, pt)

    cfg = ModelConfig()  # canonical conv-texture config
    params = ti.load_reference_checkpoint(str(pt), cfg)

    rng = np.random.RandomState(0)
    pr_mat = rng.randint(0, 8, (2, 32, 128)).astype(np.float32)
    c = rng.randint(0, 2, (2, 8, 36)).astype(np.float32)

    d_chd, d_rhy = dv.encode(params, cfg, jnp.asarray(pr_mat), jnp.asarray(c))
    with torch.no_grad():
        t_chd = ref.chd_encoder(torch.from_numpy(c))
        t_rhy = ref.rhy_encoder(torch.from_numpy(pr_mat))
    np.testing.assert_allclose(np.asarray(d_chd.mean),
                               t_chd.mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_rhy.mean),
                               t_rhy.mean.numpy(), atol=1e-4)

    # inverse: export back and diff against the original tensors
    out = ti.state_dict_from_params(params)
    orig = ref.state_dict()
    assert set(out) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(out[k], orig[k].numpy())


@pytest.mark.skipif(not reference_available(), reason="no reference checkout")
def test_pianotree_variant_detection():
    REF = load_reference()
    enc = REF.ptvae.PtvaeEncoder(device=torch.device("cpu"), max_simu_note=16,
                                 max_pitch=39 - 8, min_pitch=0)
    sd = {"rhy_encoder." + k: v for k, v in enc.state_dict().items()}
    assert ti.detect_texture_variant(sd) == "pianotree"
    with pytest.raises(ValueError):
        ti.params_from_state_dict(dict(sd), ModelConfig())  # cfg says conv


def test_convert_cli_variant_fallback(tmp_path):
    """convert_checkpoint --to-torch without --variant must auto-detect a
    pianotree-variant checkpoint (the restore template is variant-shaped)."""
    import dataclasses
    import os
    import subprocess
    import sys

    cfg = dataclasses.replace(ModelConfig(), txt_encoder="pianotree")
    model = dv.DisentangleVAE.init_model(jax.random.PRNGKey(1), cfg)
    ck = str(tmp_path / "ck_pt")
    model.save(ck)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "out.pt")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "convert_checkpoint.py"),
         "--to-torch", out, "--checkpoint", ck],
        env=env, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "pianotree texture variant" in res.stdout

    sd = torch.load(out, map_location="cpu", weights_only=True)
    assert ti.detect_texture_variant(sd) == "pianotree"
    back = ti.params_from_state_dict(sd, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
