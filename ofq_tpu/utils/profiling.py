"""Profiling / tracing utilities.

The reference has no tracing beyond wall-clock AverageMeters and a
per-step `torch.cuda.synchronize()` (reference: train.py:872-874, 944-974).
Here:
  * `trace(...)` wraps a region in a jax.profiler trace whose artifacts
    open in XProf/TensorBoard,
  * `StepTimer` gives honest per-step wall timings by fetching a scalar to
    host (under the axon tunnel `block_until_ready` returns early — the
    host fetch is the only true barrier),
  * `AverageMeter` mirrors the reference's meter for loop telemetry.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class AverageMeter:
    """Running average (reference: timm AverageMeter used at train.py:872)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class StepTimer:
    """Wall-clock step timer with a true device barrier."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.meter = AverageMeter()

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, barrier_value=None) -> float:
        if barrier_value is not None:
            np.asarray(barrier_value)  # host fetch == completion barrier
        dt = time.perf_counter() - self._t0
        self.meter.update(dt)
        return dt
