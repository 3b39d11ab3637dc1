"""JAX runtime configuration helpers.

Compilation in this project is the dominant fixed cost (a full sweep is a
large traced program, and backend compile latency is highly variable), so the
persistent compilation cache is enabled by default: identical sweeps across
processes and runs reuse compiled executables.
"""
from __future__ import annotations

import os

_DONE = False


def setup(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    # The persistent cache is opt-in: on this backend, reloading executables
    # whose large embedded constants were hoisted to parameters trips a
    # "supplied N buffers but expected M" execution error.
    cache_dir = cache_dir or os.environ.get("DPE_MVS_TPU_CACHE")
    if not cache_dir:
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax versions; cache is an optimization only
