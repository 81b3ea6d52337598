"""Profiling hooks.

The reference has no tracing at all (SURVEY.md §5) — only wall-clock
steps/min counters. Here: ``jax.profiler`` trace capture for a window of
steps (viewable in TensorBoard/Perfetto) plus the same throughput
counters the reference logs.
"""
from __future__ import annotations

import contextlib
import logging
from typing import Optional

import jax

logger = logging.getLogger("audio8_tpu.profiler")


class StepProfiler:
    """Captures a jax.profiler trace for steps [start, start+num)."""

    def __init__(self, trace_dir: Optional[str], start_step: int = 10,
                 num_steps: int = 5):
        self.trace_dir = trace_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def step(self, global_step: int) -> None:
        if not self.trace_dir:
            return
        if not self._active and global_step == self.start:
            logger.info("Starting profiler trace -> %s", self.trace_dir)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and global_step >= self.stop:
            jax.profiler.stop_trace()
            logger.info("Profiler trace written to %s", self.trace_dir)
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield
