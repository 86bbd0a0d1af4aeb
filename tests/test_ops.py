"""Losses / distribution parity vs torch."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from pctd_tpu.ops import (DiagNormal, kl_std_normal, cross_entropy_ignore,
                          cross_entropy_mean)


def test_cross_entropy_ignore_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(50, 7).astype(np.float32)
    targets = rng.randint(0, 7, size=50)
    targets[::5] = 6  # use 6 as ignore_index
    want = torch.nn.CrossEntropyLoss(ignore_index=6)(
        torch.from_numpy(logits), torch.from_numpy(targets)).item()
    got = cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(targets), 6)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_cross_entropy_mean_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(40, 12).astype(np.float32)
    targets = rng.randint(0, 12, size=40)
    want = torch.nn.CrossEntropyLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)).item()
    got = cross_entropy_mean(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_kl_std_normal_matches_torch():
    rng = np.random.RandomState(2)
    mu = rng.randn(8, 16).astype(np.float32)
    std = np.exp(rng.randn(8, 16).astype(np.float32) * 0.3)
    want = torch.distributions.kl_divergence(
        torch.distributions.Normal(torch.from_numpy(mu), torch.from_numpy(std)),
        torch.distributions.Normal(torch.zeros(16), torch.ones(16)),
    ).mean().item()
    got = kl_std_normal(DiagNormal(jnp.asarray(mu), jnp.asarray(std)))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_rsample_stats():
    d = DiagNormal(jnp.full((4, 8), 2.0), jnp.full((4, 8), 0.5))
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    samples = jax.vmap(d.rsample)(keys)
    assert abs(float(samples.mean()) - 2.0) < 0.02
    assert abs(float(samples.std()) - 0.5) < 0.02
    # mean path is deterministic
    assert np.allclose(np.asarray(d.sample_or_mean(keys[0], False)), 2.0)
