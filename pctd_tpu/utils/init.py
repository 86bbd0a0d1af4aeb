"""Parameter initializers.

Distributions follow the torch defaults the reference trains with, so that a
freshly-initialized model here is statistically interchangeable with a
freshly-initialized reference model:

- dense / GRU weights: U(-1/sqrt(fan), 1/sqrt(fan))
- conv:                U(-sqrt(k), sqrt(k)), k = 1/(in_ch * prod(kernel))
- free parameters (`nn.Parameter(torch.rand(..))`): U(0, 1)
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def uniform(key: jax.Array, shape: Sequence[int], scale: float,
            dtype=jnp.float32) -> jax.Array:
    return jax.random.uniform(key, tuple(shape), dtype, -scale, scale)


def dense_params(key: jax.Array, in_dim: int, out_dim: int,
                 dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    s = 1.0 / math.sqrt(in_dim)
    return {
        "w": uniform(kw, (in_dim, out_dim), s, dtype),
        "b": uniform(kb, (out_dim,), s, dtype),
    }


def dense_apply(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def conv2d_params(key: jax.Array, in_ch: int, out_ch: int,
                  kernel: Sequence[int], dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel[0] * kernel[1]
    s = 1.0 / math.sqrt(fan_in)
    # HWIO layout for lax.conv_general_dilated
    return {
        "w": uniform(kw, (kernel[0], kernel[1], in_ch, out_ch), s, dtype),
        "b": uniform(kb, (out_ch,), s, dtype),
    }


def free_param(key: jax.Array, shape: Sequence[int], dtype=jnp.float32):
    """torch.rand equivalent: U(0, 1)."""
    return jax.random.uniform(key, tuple(shape), dtype, 0.0, 1.0)
