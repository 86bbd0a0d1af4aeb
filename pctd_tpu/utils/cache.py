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

    # Pallas programs NEVER hit the persistent cache while this is on (the
    # default): the embedded Python tracebacks ride inside the Mosaic
    # custom-call's serialized bytecode, which the cache key cannot
    # normalize the way it strips HLO location metadata — so two lowerings
    # of the SAME kernel get different keys (measured: byte-identical
    # programs recompiled 126 s + 101 s back-to-back in one process; with
    # the flag off the lowerings are byte-identical and the second compile
    # is a cache hit). XLA-only programs were never affected. Single-frame
    # file:line locations remain in compiler diagnostics.
    jax.config.update("jax_include_full_tracebacks_in_locations", False)

    path = path or os.environ.get(
        "PCTD_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
