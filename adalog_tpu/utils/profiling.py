"""Tracing / profiling.

The reference has no profiling beyond AverageMeter batch times (SURVEY.md §5).
Here: hierarchical phase timers (logged and queryable, used by the calibrator
and reconstructor wall-clock reporting) and a jax.profiler trace context that
captures device timelines viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax

log = logging.getLogger("adalog_tpu")


class PhaseTimer:
    """Accumulating named phase timer with jax sync at phase end."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"  {name:<32s} {self.totals[name]:8.2f}s x{self.counts[name]}"
                 for name in sorted(self.totals, key=self.totals.get,
                                    reverse=True)]
        return "phase timings:\n" + "\n".join(lines)

    def log_report(self):
        log.info("%s", self.report())


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device profile (XLA ops, DMA, MXU utilization) to ``logdir``.

    View with TensorBoard's profile plugin or Perfetto.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in device traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
