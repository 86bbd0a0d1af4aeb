"""Cross-entropy losses with torch-parity reduction semantics.

torch ``nn.CrossEntropyLoss(ignore_index=k)`` averages the per-element NLL
over *non-ignored* elements only (reference ptvae.py:498-529 relies on this
for pitch pad=130 / dur pad=2). We reproduce that with masks; everything is
dense and jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _nll(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-element negative log likelihood. logits (..., C), targets (...).
    Loss math always runs in f32 (bf16 compute paths cast here)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -tgt


def cross_entropy_ignore(logits: jax.Array, targets: jax.Array,
                         ignore_index: int) -> jax.Array:
    """Mean CE over elements where target != ignore_index (torch parity).

    Targets equal to ignore_index are clamped to 0 before the gather purely to
    keep indices in range; their contribution is masked out.
    """
    mask = (targets != ignore_index)
    safe_t = jnp.where(mask, targets, 0)
    nll = _nll(logits, safe_t)
    denom = jnp.maximum(mask.sum(), 1)
    return (nll * mask).sum() / denom


def cross_entropy_mean(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Plain mean CE over all elements (torch CrossEntropyLoss default),
    used by the chord loss (reference model.py:70-83)."""
    return _nll(logits, targets).mean()
