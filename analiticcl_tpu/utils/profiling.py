"""Tracing and profiling utilities.

The reference's observability is ad-hoc stderr micro-timings gated on a 0-4
debug level (SURVEY.md §5: lib.rs:1151-1306, 1321-1399, 1422-1650). Here:

  * per-batch stage timings are collected in ``DevicePipeline.stats`` and
    printed at debug >= 2 (host prep / device compute / host tail, pair
    budgets, candidate counts);
  * :func:`trace` wraps a block in a ``jax.profiler`` trace for TensorBoard
    (device timeline incl. the Pallas kernels);
  * :class:`StageTimer` is the tiny host-side timer used across the engine.
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Dict, Optional


class StageTimer:
    """Accumulates wall-clock per named stage."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, out=sys.stderr) -> None:
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            print(
                f" (stage {name}: {total * 1e3:.1f} ms over {n} calls, "
                f"{total / n * 1e3:.2f} ms/call)",
                file=out,
            )

    def clear(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(logdir: Optional[str] = None):
    """Wrap a block in a jax.profiler trace (TensorBoard-compatible)."""
    import jax

    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield
