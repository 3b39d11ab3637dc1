"""JAX runtime configuration helpers.

Compilation in this project is the dominant fixed cost (a full sweep is a
large traced program, and backend compile latency is highly variable), so
the persistent compilation cache is enabled **by default on the CPU
backend** (measured: second process of the same sweep compiles in 2.6 s vs
9.9 s cold — the cache is what keeps the test suite's compile storms
bounded across reruns).

On the TPU (axon) backend the cache stays **opt-in** via
``DPE_MVS_TPU_CACHE=<dir>``: reloading executables whose large embedded
constants were hoisted to parameters has tripped a "supplied N buffers but
expected M" execution error there (rounds 1-3). Set the env var to try it;
unset, TPU processes compile from scratch.
"""
from __future__ import annotations

import os

_DONE = False

_DEFAULT_CPU_CACHE = os.path.expanduser("~/.cache/dpe_mvs_tpu/xla")


def setup(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    import jax

    cache_dir = cache_dir or os.environ.get("DPE_MVS_TPU_CACHE")
    if not cache_dir:
        # Default-on only where it is known-safe (see module docstring).
        try:
            if jax.default_backend() == "cpu":
                cache_dir = _DEFAULT_CPU_CACHE
        except Exception:
            return
    if not cache_dir:
        return
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax versions; cache is an optimization only
