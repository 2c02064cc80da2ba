"""Profiling / tracing hooks (SURVEY.md §5.1 equivalent).

The reference's observability is Composer's SpeedMonitor/MemoryMonitor
callbacks; here the step-time/throughput tracker lives in train.loop and
this module adds the TPU-native piece: jax.profiler traces viewable in
TensorBoard/Perfetto, as a context manager or a step-window helper for the
training loop.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Optional

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(log_dir)
    log.info("profiler trace started -> %s", log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


class StepWindowProfiler:
    """Trace a window of training steps: call .step(i) every iteration."""

    def __init__(self, log_dir: Optional[str], start_step: int = 10,
                 num_steps: int = 3):
        self.log_dir = log_dir
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def step(self, i: int) -> None:
        if self.log_dir is None:
            return
        if i == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif i >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            log.info("profiler trace written to %s", self.log_dir)

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def device_memory_stats() -> dict:
    """Per-device memory stats (the MemoryMonitor analogue), when the
    backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
