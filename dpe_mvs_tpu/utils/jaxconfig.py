"""JAX runtime configuration helpers.

Compilation in this project is the dominant fixed cost (a full sweep is a
large traced program, and backend compile latency is highly variable). The
persistent compilation cache helps — measured on CPU: the second process
of the same sweep compiles in 2.6 s vs 9.9 s cold — but it is **opt-in**
(``DPE_MVS_TPU_CACHE=<dir>``) because both backends have disqualifying
bugs when it is on by default:

- TPU (axon): reloading executables whose large embedded constants were
  hoisted to parameters trips a "supplied N buffers but expected M"
  execution error (rounds 1-3).
- CPU: serializing executables that contain interpret-mode Pallas calls
  (the test suite's kernel path) segfaults inside
  ``compilation_cache.put_executable_and_time`` — reproduced
  deterministically at tests/test_pipeline.py::test_pipeline_rect_engine's
  weak stage (round 4, suite runs 1+2).

Set the env var only for pure-XLA workloads (e.g. repeated CPU pipeline
runs without the rect engine).
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
