"""bf16 compute-path: numerics stay sane, Gaussian heads and losses stay f32."""

import pytest

pytestmark = pytest.mark.slow  # torch-oracle / mesh / compile-heavy

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from pctd_tpu.models import disentangle_vae as dv
from pctd_tpu.utils.precision import cast_params

from tests.test_models_parity import random_batch
from tests.test_training import SMALL

BF16 = dataclasses.replace(SMALL, compute_dtype="bfloat16")


def test_cast_params_keeps_heads_f32():
    params = dv.init_params(jax.random.PRNGKey(0), SMALL)
    cast = cast_params(params, jnp.bfloat16)
    assert cast["chd_enc"]["mu"]["w"].dtype == jnp.float32
    assert cast["chd_enc"]["std"]["w"].dtype == jnp.float32
    assert cast["chd_enc"]["gru_fwd"].w_ih.dtype == jnp.bfloat16
    assert cast["dec"]["time_gru"].w_hh.dtype == jnp.bfloat16


def test_bf16_loss_close_to_f32():
    params = dv.init_params(jax.random.PRNGKey(1), SMALL)
    x, c, pr_mat = random_batch(2, seed=40)
    args = (jnp.asarray(x), jnp.asarray(c), jnp.asarray(pr_mat))
    key = jax.random.PRNGKey(2)
    kw = dict(tfr1=1.0, tfr2=1.0, tfr3=1.0, sample=False)
    total32, m32 = dv.loss(params, SMALL, key, *args, **kw)
    total16, m16 = dv.loss(params, BF16, key, *args, **kw)
    assert total16.dtype == jnp.float32          # loss math stays f32
    np.testing.assert_allclose(float(total16), float(total32), rtol=0.05)
    # KL computed from f32 heads should be very close
    np.testing.assert_allclose(float(m16["kl_loss"]), float(m32["kl_loss"]),
                               rtol=0.02)


def test_bf16_grads_finite_and_f32():
    params = dv.init_params(jax.random.PRNGKey(3), BF16)
    x, c, pr_mat = random_batch(2, seed=41)

    def loss_fn(p):
        total, _ = dv.loss(p, BF16, jax.random.PRNGKey(4), jnp.asarray(x),
                           jnp.asarray(c), jnp.asarray(pr_mat),
                           tfr1=0.5, tfr2=0.5, tfr3=0.5)
        return total

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(g.dtype == jnp.float32 for g in leaves)   # master-param grads
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in leaves)


def test_bf16_inference_decode():
    params = dv.init_params(jax.random.PRNGKey(5), BF16)
    z_chd = jax.random.normal(jax.random.PRNGKey(6), (2, BF16.chd_z_dim))
    z_rhy = jax.random.normal(jax.random.PRNGKey(7), (2, BF16.txt_z_dim))
    est = dv.decode_z(params, BF16, z_chd, z_rhy)
    spec = BF16.pianotree
    assert est.shape == (2, 32, spec.max_simu_note - 1, 6)
    assert (np.asarray(est[..., 0]) <= spec.pitch_eos).all()
