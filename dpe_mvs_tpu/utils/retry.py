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

# Only errors carrying one of these markers are worth retrying — transient
# service/tunnel faults. Everything else (shape errors, NaN asserts, bad
# configs, OOM) is deterministic: re-running it 3x with sleeps only delays
# and obscures the first traceback (round-4 advisor finding).
_TRANSIENT_MARKERS = (
    "UNAVAILABLE", "INTERNAL", "DEADLINE_EXCEEDED", "ABORTED",
    "Connection reset", "connection reset", "Socket closed",
    "Broken pipe", "EOF", "timed out", "Timeout",
)


def with_retry(fn: Callable[[], T], attempts: int = 3,
               base_delay: float = 5.0, log=print,
               sleep=time.sleep) -> T:
    """Run ``fn`` with up to ``attempts`` tries and linear backoff.

    Only transient-marked failures are retried; deterministic errors (and
    KeyboardInterrupt) propagate immediately."""
    last_err = None
    for attempt in range(attempts):
        try:
            return fn()
        except KeyboardInterrupt:
            raise
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            if not any(m in str(e) for m in _TRANSIENT_MARKERS):
                raise
            last_err = e
            if attempt < attempts - 1:
                log(f"  [retry {attempt + 1}/{attempts}] device work "
                    f"failed: {type(e).__name__}: {str(e)[:120]}")
                sleep(base_delay * (attempt + 1))
    raise last_err
