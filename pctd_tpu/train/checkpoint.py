"""Checkpointing: full train-state save/restore via orbax.

Beyond the reference (which torch.saves model weights only,
module.py:179-183), the whole TrainState — params, optimizer state, step
counter, base RNG key — round-trips, giving real resume (SURVEY.md §5).
"""
from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except ImportError:  # pragma: no cover
    _HAVE_ORBAX = False


def save_state(path: str, state) -> None:
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
    else:  # pragma: no cover — orbax is baked into this image
        import pickle
        with open(path + ".pkl", "wb") as f:
            pickle.dump(jax.device_get(state), f)


def restore_state(path: str, template):
    """Restore into the structure of ``template`` (a TrainState)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree_util.tree_map(np.asarray, jax.device_get(template))
        restored = ckptr.restore(path, target=target)
        return jax.tree_util.tree_map(jax.numpy.asarray, restored)
    import pickle  # pragma: no cover
    with open(path + ".pkl", "rb") as f:
        return pickle.load(f)
