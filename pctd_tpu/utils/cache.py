"""Persistent XLA compilation cache setup.

The deeply-scanned decoder makes TPU compiles expensive (minutes for the
fwd+bwd train step) while execution is tens of milliseconds; a persistent
cache makes every process after the first start instantly. Called by
train.py / bench.py / __graft_entry__ before any jit executes.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    # Honor JAX_PLATFORMS from the environment: once the axon TPU plugin is
    # installed it IGNORES the env var, so a test/CI subprocess exporting
    # JAX_PLATFORMS=cpu would silently land on (and contend for) the TPU.
    # Mirroring the env var into the config restores the documented
    # semantics for every entry point that calls this.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    path = path or os.environ.get(
        "PCTD_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
