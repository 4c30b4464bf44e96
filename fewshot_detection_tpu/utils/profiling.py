"""Tracing / profiling utilities.

The reference's tracing story was hand-rolled time.time() stopwatches
behind `if False:` flags (train.py:179-223, region_loss.py:162-230,
utils.py:121-192 — SURVEY.md §5). Here:

  * StepTimer — always-on lightweight phase timing with an images/sec
    summary line (the reference's throughput log, train_meta.py:250)
  * trace() — a jax.profiler trace context writing a TensorBoard-loadable
    profile when FSD_PROFILE_DIR (or the argument) is set
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


class StepTimer:
    """Accumulates named phase durations across steps.

    with timer.phase("data"): ...
    with timer.phase("step"): ...
    print(timer.summary(images=...))
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def phase(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t
            self.counts[name] += 1

    def reset(self):
        self.totals.clear()
        self.counts.clear()
        self._t0 = time.perf_counter()

    def summary(self, images: int | None = None) -> str:
        wall = time.perf_counter() - self._t0
        parts = [
            f"{k} {self.totals[k]:.2f}s ({self.totals[k] / max(self.counts[k], 1) * 1e3:.1f}ms/it)"
            for k in sorted(self.totals)
        ]
        line = " | ".join(parts) + f" | wall {wall:.2f}s"
        if images is not None:
            line += f" | {images / max(wall, 1e-9):.1f} images/s"
        return line


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """jax.profiler trace when a log dir is configured; no-op otherwise."""
    log_dir = log_dir or os.environ.get("FSD_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
