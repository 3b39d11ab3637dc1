"""Tracing & metrics (SURVEY.md §5).

The reference's only instrumentation is a few commented-out
``std::chrono`` spans (main.cpp:414,469; DPE.cu:3127,3193). Here timing is a
first-class, always-available subsystem:

  - :class:`StageTimer` — wall-clock spans with named stages, aggregated
    per run (the per-image / per-sweep numbers ``verbose`` prints come from
    here);
  - :func:`trace` — context manager bridging to the JAX profiler
    (``jax.profiler.trace``) for TensorBoard-viewable device traces.
"""
from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates wall-clock time per named stage."""

    def __init__(self, echo: bool = False) -> None:
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)
        self.echo = echo

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            if self.echo:
                print(f"    [{name}] {dt:.2f}s", flush=True)

    def summary(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        lines = [f"{name:<28s} {tot:8.2f}s  x{self.counts[name]}"
                 for name, tot in rows]
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Device-level profiler trace (viewable in TensorBoard/XProf). No-op
    when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
