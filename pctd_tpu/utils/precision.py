"""Mixed-precision policy.

``ModelConfig.compute_dtype = "bfloat16"`` runs the matmul-heavy compute path
(GRU scans, embeddings, conv, output heads) in bf16 on the MXU while keeping

- master params in f32 (the cast lives inside the loss, so grads flow back to
  f32 params — standard mixed-precision),
- the Gaussian-head (mu / std-exp) matmuls and all loss math in f32.

Heads stay f32 by exclusion: any param subtree named in ``F32_KEYS`` is not
cast, and callers cast the head input to the head weight's dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# param-dict keys whose subtrees stay f32 (Gaussian heads)
F32_KEYS = frozenset({"mu", "std"})


def cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree to dtype."""
    def cast(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a
    return jax.tree_util.tree_map(cast, tree)


def cast_params(params: dict, dtype) -> dict:
    """Cast a params dict to a compute dtype, leaving F32_KEYS subtrees
    untouched. Works on the nested module dicts used across pctd_tpu."""
    if isinstance(params, dict):
        return {k: (v if k in F32_KEYS else cast_params(v, dtype))
                for k, v in params.items()}
    return cast_floats(params, dtype)


def compute_dtype(cfg) -> jnp.dtype:
    return jnp.dtype(cfg.compute_dtype)


def head_input(p_head: dict, h: jax.Array) -> jax.Array:
    """Cast a head's input to the head weight dtype (f32 for Gaussian heads)."""
    return h.astype(p_head["w"].dtype)
