"""Transient-fault retry for device work (SURVEY.md §5).

The reference exits on any CUDA error (``CudaSafeCall`` -> exit,
DPE.cpp:633-666). On a remote TPU service, transient tunnel/device faults
(UNAVAILABLE, INTERNAL disconnects) are a fact of life and a whole round
must not die to one hiccup — both pipeline runners wrap their sweep
dispatch in :func:`with_retry`.
"""
from __future__ import annotations

import time
from typing import Callable, TypeVar

T = TypeVar("T")

# Errors that retrying cannot fix.
_FATAL_MARKERS = ("RESOURCE_EXHAUSTED",)


def with_retry(fn: Callable[[], T], attempts: int = 3,
               base_delay: float = 5.0, log=print,
               sleep=time.sleep) -> T:
    """Run ``fn`` with up to ``attempts`` tries and linear backoff.

    OOMs and KeyboardInterrupt propagate immediately; the last error is
    re-raised when all attempts fail."""
    last_err = None
    for attempt in range(attempts):
        try:
            return fn()
        except KeyboardInterrupt:
            raise
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            if any(m in str(e) for m in _FATAL_MARKERS):
                raise
            last_err = e
            if attempt < attempts - 1:
                log(f"  [retry {attempt + 1}/{attempts}] device work "
                    f"failed: {type(e).__name__}: {str(e)[:120]}")
                sleep(base_delay * (attempt + 1))
    raise last_err
