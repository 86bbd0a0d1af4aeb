"""Diagonal-Gaussian latent utilities.

Replaces torch.distributions.Normal usage in the reference (ptvae.py:28,
train_utils.py:33-49) with an explicit (mean, std) pair threaded through
jit. Note the reference parameterizes std as exp(linear(x)) directly — not
exp(0.5 * logvar) — and we keep that convention.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagNormal(NamedTuple):
    mean: jax.Array
    std: jax.Array

    def rsample(self, key: jax.Array) -> jax.Array:
        eps = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * eps

    def sample_or_mean(self, key, sample: bool) -> jax.Array:
        return self.rsample(key) if sample else self.mean


def kl_std_normal(dist: DiagNormal) -> jax.Array:
    """KL(N(mu, sigma) || N(0, 1)), mean over all elements (batch and dim),
    matching torch kl_divergence(...).mean() in reference train_utils.py:45-49.
    """
    mu, std = dist.mean, dist.std
    var = std * std
    kl = 0.5 * (var + mu * mu - 1.0) - jnp.log(std)
    return kl.mean()
