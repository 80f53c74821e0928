"""Tracing / profiling hooks (SURVEY §5.1 — the reference has none).

Wraps ``jax.profiler``: named trace annotations around the input
pipeline vs the train step, and an optional on-demand Perfetto/
TensorBoard trace dump.  Enable a trace with
``MMVAE_TRACE_DIR=/path`` or programmatically via :func:`trace`.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

from .logging import TLOG


def annotate(name: str):
    """Named region visible in profiler traces (no-op cost otherwise)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace(out_dir: str | None = None):
    """Capture a device trace for the enclosed block.

    Uses ``MMVAE_TRACE_DIR`` when *out_dir* is None; yields without
    tracing if neither is set.
    """
    out_dir = out_dir or os.environ.get("MMVAE_TRACE_DIR")
    if not out_dir:
        yield
        return
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        TLOG("Wrote profiler trace to", out_dir)


class StepTimer:
    """Host-side phase timer: accumulates wall time per named phase and
    reports a breakdown (input vs compute vs record)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, float]:
        return dict(self.totals)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
